"""Fully fused attention step: ``x + OutProj(SDPA(RoPE(QKV(RMSGroupNorm(x)))))``.

One Pallas kernel for the whole LocoformerBlock attention sub-step
(reference ``models/mss_tflocoformer.py:443-464,467-559``): the fp32
pre-norm island, the fused QKV projection, per-head RoPE + flash attention
(transposed layout, bounded-shift softmax — see ``flash_attention.py``),
the head-aggregate output projection, and the residual add all run on
VMEM-resident rows.  Measured on v5e the unfused XLA side of an MHSA call
(projections + head-layout moves around the flash kernel) cost ~11 ms at
freq-path shapes and ~17 ms at time-path shapes — pure HBM round-trips of
Q/K/V/O-sized tensors that this kernel never materializes: per attention
step HBM is touched exactly twice (read x, write out).

Layout: everything transposed, channels/heads on SUBLANES and sequence on
LANES.  Heads are packed 32-sublane-aligned (D=24 pads to 32), so per-head
q/k/v are aligned sublane slices of one ``[H*32, Lp]`` matmul output and
the QKV / out projections run at full 128-depth MXU utilization.

Backward: ``custom_vjp`` recomputes through the unfused composable path
(norm -> flash_attention -> proj), whose pieces have their own Pallas
backward kernels.  The fused forward therefore applies regardless of
``is_training``; only active attention-dropout (reference ``:489``) routes
around it (mask replay across two different kernels isn't worth the
complexity — shipped MSS configs put dropout on the FFN sites).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import (LANE, MAX_L, _LOG2E, _bounded_shift, _rope_t,
                              _round_up)

__all__ = ["fused_attention_block", "supports_block",
           "reference_attention_block"]

_HEAD_PAD = 32
_VMEM_TARGET = 13 * 1024 * 1024


def _dims(emb_dim: int, attention_dim: int, n_heads: int):
    head_dim = attention_dim // n_heads
    cp = _round_up(emb_dim, LANE)     # channel sublanes (transposed layout)
    dp = _round_up(head_dim, _HEAD_PAD)
    hp = n_heads * dp                 # packed q/k/v sublanes
    return head_dim, cp, dp, hp


def _blk_q(lp: int) -> int:
    """Largest 128-multiple divisor of ``lp`` whose two live fp32 score
    buffers (s and p; the bounded-shift softmax has no max pass and
    q-blocks are fully independent) stay within ~4 MiB."""
    best = 128
    for d in range(1, lp // 128 + 1):
        blk = 128 * d
        if lp % blk == 0 and 2 * lp * blk * 4 <= 4 * 1024 * 1024:
            best = blk
    return best


def _vmem_bytes(lp: int, cp: int, hp: int, blk_q: int) -> int:
    rows = 2 * 2 * lp * cp * 2            # x in + out, double-buffered bf16
    inter = 2 * lp * cp * 4 + 3 * lp * hp * 2 + lp * hp * 4  # x32/xn, qkv, o
    scores = 2 * lp * blk_q * 4           # s, p
    weights = (3 * hp + hp) * cp * 2 + cp * cp * 4 + 2 * 32 * lp * 4
    return rows + inter + scores + weights


def supports_block(emb_dim: int, attention_dim: int, n_heads: int,
                   seq_len: int) -> bool:
    """Whether the fused attention-step kernel fits VMEM for this shape."""
    if attention_dim % n_heads:
        return False
    _, cp, dp, hp = _dims(emb_dim, attention_dim, n_heads)
    lp = _round_up(seq_len, LANE)
    if seq_len > MAX_L:
        return False
    return _vmem_bytes(lp, cp, hp, _blk_q(lp)) < _VMEM_TARGET


def _pick_group(lp: int, cp: int, hp: int, blk_q: int) -> int:
    per_row = (2 * 2 * lp * cp * 2 + 2 * lp * cp * 4
               + 3 * lp * hp * 2 + lp * hp * 4)
    fixed = 2 * lp * blk_q * 4 + (4 * hp) * cp * 2 + cp * cp * 4
    g = max(1, (_VMEM_TARGET - fixed) // per_row)
    return int(min(g, 16))


def _attn_kernel(x_ref, gamma_ref, bd_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                 cos_ref, sin_ref, o_ref, *, n_heads: int, dp: int,
                 dpg: int, eps: float, l_actual: int, blk_q: int,
                 group: int, rope: bool):
    lp = x_ref.shape[-1]
    masked = lp != l_actual
    dt = wq_ref.dtype
    for gi in range(group):
        x32 = x_ref[gi].astype(jnp.float32)                    # [Cp, Lp]
        lane = jax.lax.broadcasted_iota(jnp.int32, x32.shape, 1)
        x32 = jnp.where(lane < l_actual, x32, 0.0)
        # RMSGroupNorm over channels (sublanes): group sums via the
        # block-diagonal matmul, full 128-depth contraction
        sq = jax.lax.dot(bd_ref[...], x32 * x32,
                         preferred_element_type=jnp.float32)
        rms = jnp.sqrt(sq) * (dpg ** -0.5)
        xn = (x32 / (rms + eps) * gamma_ref[...]).astype(dt)   # [Cp, Lp]

        # packed projections: [Hp, Lp] each (softmax scale pre-folded in wq)
        q_all = jax.lax.dot(wq_ref[...], xn, preferred_element_type=jnp.float32).astype(dt)
        k_all = jax.lax.dot(wk_ref[...], xn, preferred_element_type=jnp.float32).astype(dt)
        v_all = jax.lax.dot(wv_ref[...], xn, preferred_element_type=jnp.float32).astype(dt)

        o_heads = []
        for h in range(n_heads):
            sl = slice(h * dp, (h + 1) * dp)
            q_t0, k_t0, v_t = q_all[sl], k_all[sl], v_all[sl]  # [dp, Lp]
            k_t = _rope_t(k_t0, cos_ref[:], sin_ref[:], dp) if rope else k_t0
            o_blocks = []
            for qb in range(lp // blk_q):
                qsl = slice(qb * blk_q, (qb + 1) * blk_q)
                q_t = _rope_t(q_t0[:, qsl], cos_ref[:, qsl], sin_ref[:, qsl],
                              dp) if rope else q_t0[:, qsl]
                s = jax.lax.dot_general(
                    k_t, q_t, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [Lp, BLK]
                if masked:  # padded KEY rows
                    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                    s = jnp.where(row < l_actual, s, -1e30)
                shift = _bounded_shift(q_t0[:, qsl], k_t0)
                p = jnp.exp2((s - shift) * _LOG2E)
                denom = jnp.sum(p, axis=0, keepdims=True)
                acc = jax.lax.dot_general(
                    v_t, p.astype(v_t.dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [dp, BLK]
                o_blocks.append(acc / jnp.maximum(denom, 1e-30))
            o_heads.append(o_blocks[0] if len(o_blocks) == 1
                           else jnp.concatenate(o_blocks, axis=1))
        o_all = (o_heads[0] if n_heads == 1
                 else jnp.concatenate(o_heads, axis=0)).astype(dt)  # [Hp, Lp]

        out = jax.lax.dot(wo_ref[...], o_all,
                          preferred_element_type=jnp.float32)  # [Cp, Lp]
        o_ref[gi] = (x32 + out).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_attention_block(x, gamma, w_qkv, w_out, n_heads: int,
                          num_groups: int, eps: float, rope: bool = True,
                          theta: float = 10000.0):
    """x ``[R, L, C]`` -> ``x + OutProj(MHSA(RMSGroupNorm(x)))`` ``[R, L, C]``.

    gamma ``[C]`` is the pre-norm RMSGroupNorm scale (``x/(rms+eps)*gamma``
    quirk preserved); ``w_qkv [3*A, C]`` / ``w_out [C, A]`` are the torch-
    layout projection weights (reference ``mss_tflocoformer.py:485-486``).
    """
    return _attn_forward(x, gamma, w_qkv, w_out, n_heads, num_groups, eps,
                         rope, theta)


def _attn_forward(x, gamma, w_qkv, w_out, n_heads, num_groups, eps,
                  rope, theta):
    r, seq_len, c = x.shape
    a3 = w_qkv.shape[0]
    attention_dim = a3 // 3
    head_dim, cp, dp, hp = _dims(c, attention_dim, n_heads)
    lp = _round_up(seq_len, LANE)
    blk_q = _blk_q(lp)
    group = _pick_group(lp, cp, hp, blk_q)
    rp = _round_up(r, group)
    scale = 1.0 / math.sqrt(head_dim)
    dt = x.dtype

    # transpose + pad rows into the [R, Cp, Lp] kernel layout (one fused
    # XLA pass; everything downstream stays transposed in VMEM)
    x_t = jnp.pad(jnp.swapaxes(x, -1, -2),
                  ((0, rp - r), (0, cp - c), (0, lp - seq_len)))

    f32 = jnp.float32

    def head_pack(w, pre_scale=1.0):  # [A, C] -> [Hp, Cp], 32-aligned heads
        w = w.reshape(n_heads, head_dim, w.shape[-1]).astype(f32) * pre_scale
        p = jnp.zeros((n_heads, dp, cp), f32)
        p = p.at[:, :head_dim, :c].set(w)
        return p.reshape(hp, cp).astype(dt)

    wq = head_pack(w_qkv[:attention_dim], scale)
    wk = head_pack(w_qkv[attention_dim:2 * attention_dim])
    wv = head_pack(w_qkv[2 * attention_dim:])
    # out proj consumes the packed-head layout: [Cp, Hp] with zero columns
    # at the per-head padding (head_pack on w_out^T [A, C] -> [Hp, Cp])
    wo = head_pack(w_out.T).T

    gp = jnp.zeros((cp, 1), f32).at[:c, 0].set(gamma.astype(f32))
    group_of = np.full(cp, -1)
    group_of[:c] = np.arange(c) // (c // num_groups)
    bd = jnp.asarray(((group_of[:, None] == group_of[None, :])
                      & (group_of[:, None] >= 0)).astype(np.float32))

    if rope:
        from ..rope import _tables_np
        cos_np, sin_np = _tables_np(seq_len, head_dim, theta)  # [L, D]
        cos = np.zeros((dp, lp), np.float32)
        sin = np.zeros((dp, lp), np.float32)
        cos[:head_dim, :seq_len] = cos_np.T
        sin[:head_dim, :seq_len] = sin_np.T
    else:
        cos = np.zeros((dp, lp), np.float32)
        sin = np.zeros((dp, lp), np.float32)

    row = lambda: pl.BlockSpec((group, cp, lp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, n_heads=n_heads, dp=dp,
                          dpg=c // num_groups, eps=float(eps),
                          l_actual=seq_len, blk_q=blk_q, group=group,
                          rope=rope),
        grid=(rp // group,),
        in_specs=[row(), const((cp, 1)), const((cp, cp)),
                  const((hp, cp)), const((hp, cp)), const((hp, cp)),
                  const((cp, hp)), const((dp, lp)), const((dp, lp))],
        out_specs=row(),
        out_shape=jax.ShapeDtypeStruct((rp, cp, lp), dt),
    )(x_t, gp, bd, wq, wk, wv, wo, jnp.asarray(cos), jnp.asarray(sin))
    return jnp.swapaxes(out[:r, :c, :seq_len], -1, -2)


def reference_attention_block(x, gamma, w_qkv, w_out, n_heads, num_groups,
                              eps, rope=True, theta=10000.0):
    """Unfused composition (parity oracle AND the backward recompute path —
    flash_attention inside carries its own Pallas backward)."""
    from .. import attention as attn_ops
    c = x.shape[-1]
    a = w_qkv.shape[0] // 3
    dpg = c // num_groups
    x32 = x.astype(jnp.float32)
    grouped = x32.reshape(x32.shape[:-1] + (num_groups, dpg))
    rms = jnp.sqrt(jnp.sum(grouped ** 2, axis=-1, keepdims=True)) * dpg ** -0.5
    xn = ((grouped / (rms + eps)).reshape(x32.shape)
          * gamma.astype(jnp.float32)).astype(x.dtype)
    qkv = xn @ w_qkv.T.astype(x.dtype)                 # [R, L, 3A]
    r, l, _ = qkv.shape
    head_dim = a // n_heads
    qkv = qkv.reshape(r, l, 3, n_heads, head_dim)
    qkv = jnp.moveaxis(qkv, (2, 3), (0, 2))            # [3, R, H, L, D]
    o = attn_ops.dot_product_attention(
        qkv[0], qkv[1], qkv[2], backend="flash",
        fused_rope=rope, rope_theta=theta)
    o = jnp.swapaxes(o, 1, 2).reshape(r, l, a)
    return x + o @ w_out.T.astype(x.dtype)


def _attn_fwd(x, gamma, w_qkv, w_out, n_heads, num_groups, eps, rope, theta):
    out = _attn_forward(x, gamma, w_qkv, w_out, n_heads, num_groups, eps,
                        rope, theta)
    return out, (x, gamma, w_qkv, w_out)


def _attn_bwd(n_heads, num_groups, eps, rope, theta, res, g):
    x, gamma, w_qkv, w_out = res
    _, vjp = jax.vjp(
        lambda *a: reference_attention_block(*a, n_heads, num_groups, eps,
                                             rope, theta),
        x, gamma, w_qkv, w_out)
    return vjp(g)


fused_attention_block.defvjp(_attn_fwd, _attn_bwd)
