"""Fully fused attention step: ``x + Drop(OutProj(SDPA(RoPE(QKV(RMSGroupNorm(x))))))``.

One Pallas kernel for the whole LocoformerBlock attention sub-step
(reference ``models/mss_tflocoformer.py:443-464,467-559``): the fp32
pre-norm island, the fused QKV projection, per-head RoPE + flash attention
(transposed layout, bounded-shift softmax — see ``flash_attention.py``),
the head-aggregate output projection, BOTH of the reference's dropout
sites — the in-SDPA attention-probability dropout (``:524-531``, masked on
the softmax numerator per 128-lane q-subtile) and the post-projection
dropout (``:489``) — and the residual add all run on VMEM-resident rows.
Measured on v5e the unfused XLA side of an MHSA call (projections +
head-layout moves around the flash kernel) cost ~11 ms at freq-path shapes
and ~17 ms at time-path shapes — pure HBM round-trips of Q/K/V/O-sized
tensors that this kernel never materializes: per attention step HBM is
touched exactly twice (read x, write out).

Layout: everything transposed, channels/heads on SUBLANES and sequence on
LANES.  Heads are packed 32-sublane-aligned (D=24 pads to 32), so per-head
q/k/v are aligned sublane slices of one ``[H*32, Lp]`` matmul output and
the QKV / out projections run at full 128-depth MXU utilization.

Backward: a second Pallas kernel recomputes norm+QKV+scores in VMEM but
takes the softmax statistics (per-q-column shift + reciprocal of the
undropped numerator sum, [2H, Lp] fp32 per row — tiny) from the training
forward's stash, so its probability recompute is one exp + one broadcast
multiply (no norm-bound or colsum passes); it replays the dropout mask
from the absolute-row-seeded counter PRNG, back-rotates the q/k cotangents
in-kernel (RoPE is orthogonal: R(-theta)), and accumulates all
weight/gamma grads across the sequential grid.  A reference-recompute
fallback covers drop-free shapes the kernel rejects.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import (LANE, MAX_L, _bounded_shift, _diag_lb,
                              _rope_t, _round_up, _softmax_num)
from .swiglu_ffn import _dropout_mask

__all__ = ["fused_attention_block", "supports_block",
           "reference_attention_block"]

_HEAD_PAD = 32
_VMEM_TARGET = 13 * 1024 * 1024
# Forward runs whole-row q-blocks when they fit (measured 27% faster at the
# flash-kernel level than 384-wide blocks); its budget is pushed closer to
# the 16 MiB scoped-VMEM limit than the backward's (est. runs ~4% low vs
# the compiler's scoped accounting).
_FWD_BLK_BUDGET = 11 * 1024 * 1024
_VMEM_TARGET_FWD = 15 * 1024 * 1024

_PROB_SEED_OFFSET = 0x85EB_CA6B - (1 << 32)  # decorrelates the prob site
_PROB_TILE_STRIDE = 0x9E3779B9  # golden-ratio mix of (head, q-subtile)


def _prob_thr(rate: float) -> int:
    """Unsigned-int32 keep threshold: the raw PRNG word reinterpreted as
    uint32 is uniform over [0, 2^32), so ``P(w < t) = t / 2^32`` — one
    compare, no 31-bit masking pass (the round-3 scheme's ``bitwise_and``
    cost a full VPU pass over every mask element).  Unsigned (not signed)
    keeps the interpret-mode convention the CPU suite pins: all-zero
    interpret PRNG words are a KEEP at every rate < 1 (a signed compare
    flips zero to a drop at rate >= 0.5)."""
    return min(int(round((1.0 - rate) * (1 << 32))), (1 << 32) - 1)


def _prob_keep(seed_ref, group: int, gi: int, lp: int, h: int, qt: int,
               rate: float):
    """``[Lp, 128]`` keep mask for the attention-PROBABILITY dropout site
    (the reference's in-SDPA ``dropout_p`` site) at absolute q-subtile
    ``qt`` of head ``h``.  The counter PRNG is seeded by the trace-time
    (head, subtile) mix word and the absolute row index, so forward and
    backward regenerate identical masks regardless of their own q-block
    widths (any 128-multiple tiling decomposes into these subtiles)."""
    row_idx = pl.program_id(0) * group + gi
    mix = ((h * 1024 + qt + 1) * _PROB_TILE_STRIDE + _PROB_SEED_OFFSET) \
        & 0xFFFFFFFF
    mix = mix - (1 << 32) if mix >= (1 << 31) else mix
    pltpu.prng_seed(seed_ref[0] + jnp.int32(mix), row_idx)
    bits = pltpu.prng_random_bits((lp, 128))
    bits = jax.lax.bitcast_convert_type(bits, jnp.uint32)
    return bits < jnp.uint32(_prob_thr(rate))


def _prob_keeps(seed_ref, group: int, gi: int, lp: int, h: int, qb: int,
                blk_q: int, rate: float):
    """Full-width ``[Lp, BLK]`` keep mask for one block, assembled from the
    absolute 128-lane subtiles (ONE bool concat; the fp32 slicing +
    per-subtile where of the round-3 scheme moved 4x the bytes)."""
    nq = blk_q // 128
    subs = [_prob_keep(seed_ref, group, gi, lp, h, qb * nq + tq, rate)
            for tq in range(nq)]
    return subs[0] if nq == 1 else jnp.concatenate(subs, axis=1)


def _apply_keeps(p, keep, rate: float):
    """Mask the ``[Lp, BLK]`` block WITHOUT the survivor 1/keep scale: the
    scale is constant, so every consumer folds it into a cheaper site —
    the forward divides it into the [1, BLK] softmax denominator, the
    backward scales the [dp, Lp] dq/dk/dv accumulators once per head
    (drop-after-normalize semantics preserved; the denominator is still
    the UNDROPPED softmax sum, as in torch)."""
    return jnp.where(keep, p, 0.0)


def _drop_probs(p, seed_ref, group: int, gi: int, h: int, qb: int,
                blk_q: int, rate: float):
    lp = p.shape[0]
    return _apply_keeps(
        p, _prob_keeps(seed_ref, group, gi, lp, h, qb, blk_q, rate), rate)


def _dims(emb_dim: int, attention_dim: int, n_heads: int):
    head_dim = attention_dim // n_heads
    cp = _round_up(emb_dim, LANE)     # channel sublanes (transposed layout)
    dp = _round_up(head_dim, _HEAD_PAD)
    hp = n_heads * dp                 # packed q/k/v sublanes
    return head_dim, cp, dp, hp


def _blk_q(lp: int, budget: int = 4 * 1024 * 1024) -> int:
    """Largest 128-multiple divisor of ``lp`` whose two live fp32 score
    buffers (s and p; the bounded-shift softmax has no max pass and
    q-blocks are fully independent) stay within the budget."""
    best = 128
    for d in range(1, lp // 128 + 1):
        blk = 128 * d
        if lp % blk == 0 and 2 * lp * blk * 4 <= budget:
            best = blk
    return best


def _vmem_bytes(lp: int, cp: int, hp: int, blk_q: int, bwd: bool,
                itemsize: int = 2) -> int:
    """``itemsize`` = compute dtype width: the row buffers, packed q/k/v
    intermediates, and weight panels all carry the caller's dtype (fp32
    doubles them vs the production bf16)."""
    rows = 2 * (3 if bwd else 2) * lp * cp * itemsize  # x(+g)/out, dbuffered
    n_inter = 10 if bwd else 2
    # bwd: the fp32 o_all accumulation is gone (dwo reads the forward's
    # STASHED head outputs — double-buffered dt rows); fwd keeps it
    o_term = 2 * lp * hp * itemsize if bwd else lp * hp * 4
    inter = (n_inter * lp * cp * 4
             + (6 if bwd else 3) * lp * hp * itemsize + o_term)
    scores = (4 if bwd else 2) * lp * blk_q * 4
    weights = 4 * hp * cp * itemsize + cp * cp * 4 + 2 * 32 * lp * 4
    if bwd:
        weights += 3 * hp * cp * 4 + cp * hp * 4  # fp32 grad accumulators
    return rows + inter + scores + weights


# bf16 admission ceilings CALIBRATED on v5e compiles (the byte estimates
# over-count buffers Mosaic reuses): the MEDIUM-config freq path (emb 128 /
# heads 8 / L 1025 — estimates 15.78 MiB fwd / 15.16 MiB bwd) compiles and
# runs, fwd and bwd, with and without dropout; the next-larger shipped
# shapes (xlarge freq: 23 / 53 MiB) are far beyond any plausible limit.
# fp32 keeps the conservative targets.
_FWD_CEIL_BF16 = int(16.3 * 1024 * 1024)
_BWD_CEIL_BF16 = int(15.7 * 1024 * 1024)


def supports_block(emb_dim: int, attention_dim: int, n_heads: int,
                   seq_len: int, itemsize: int = 2) -> bool:
    """Whether the fused attention-step kernel (fwd AND bwd) fits VMEM."""
    if attention_dim % n_heads:
        return False
    _, cp, dp, hp = _dims(emb_dim, attention_dim, n_heads)
    lp = _round_up(seq_len, LANE)
    if seq_len > MAX_L:
        return False
    fwd_ceil = _FWD_CEIL_BF16 if itemsize == 2 else _VMEM_TARGET_FWD
    bwd_ceil = _BWD_CEIL_BF16 if itemsize == 2 else _VMEM_TARGET
    return (_vmem_bytes(lp, cp, hp, _blk_q(lp, _FWD_BLK_BUDGET), False,
                        itemsize) < fwd_ceil
            and _vmem_bytes(lp, cp, hp, _blk_q(lp, 2 * 1024 * 1024), True,
                            itemsize) < bwd_ceil)


def _pick_group(lp: int, cp: int, hp: int, blk_q: int, bwd: bool,
                extra: int = 0, itemsize: int = 2,
                extra_row: int = 0) -> int:
    """``extra`` = additional fixed live bytes the caller knows about (the
    probability-dropout mask/Pd blocks, absent from ``_vmem_bytes``);
    ``extra_row`` = additional per-row bytes (the double-buffered o-stash
    rows in the training forward/backward)."""
    fixed = _vmem_bytes(lp, cp, hp, blk_q, bwd, itemsize) + extra
    per_row = 2 * (3 if bwd else 2) * lp * cp * itemsize + \
        ((10 if bwd else 2) * lp * cp * 4
         + (6 if bwd else 3) * lp * hp * itemsize + lp * hp * 4) + extra_row
    target = _VMEM_TARGET if bwd else _VMEM_TARGET_FWD
    g = 1 + max(0, (target - fixed) // per_row)
    return int(min(g, 16))


def _norm_t(x32, bd_ref, gamma_ref, dpg: int, eps: float):
    """fp32 RMSGroupNorm over channels (sublanes) via the block-diagonal
    matmul (full 128-depth contraction)."""
    sq = jax.lax.dot(bd_ref[...], x32 * x32,
                     preferred_element_type=jnp.float32)
    rms = jnp.sqrt(sq) * (dpg ** -0.5)
    inv = 1.0 / (rms + eps)
    return x32 * inv * gamma_ref[...], inv, rms


def _attn_kernel(x_ref, gamma_ref, bd_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                 cos_ref, sin_ref, seed_ref, *out_refs, n_heads: int,
                 dp: int, dpg: int, eps: float, l_actual: int, blk_q: int,
                 group: int, rope: bool, drop_rate: float, stash: bool,
                 residual: bool = True):
    """``out_refs`` is ``(o_ref,)`` or ``(o_ref, ostash_ref, stats_ref)`` —
    training stashes the packed head outputs ``[Hp, Lp]`` (the backward's
    dwo needs no ``V @ Pd`` recompute — one of its six score-class matmuls)
    and the per-head softmax stats ``[2H->sp, Lp]`` fp32 (shift rows then
    reciprocal-of-undropped-sum rows, per q-column), so the backward skips
    the bounded-shift norms AND its denominator colsum pass (round 5:
    freq-path fwd+bwd 49.9 -> 41.7 ms at drop 0.1).

    ``residual=False`` (the tensor-parallel mode, ``parallel/tp_fused.py``)
    emits the bare projected output: the kernel's result is one mp-shard's
    PARTIAL sum over heads, so the residual add and the post-projection
    dropout site must happen after the cross-shard psum, outside."""
    o_ref = out_refs[0]
    lp = x_ref.shape[-1]
    masked = lp != l_actual
    dt = wq_ref.dtype
    for gi in range(group):
        x32 = x_ref[gi].astype(jnp.float32)                    # [Cp, Lp]
        lane = jax.lax.broadcasted_iota(jnp.int32, x32.shape, 1)
        x32 = jnp.where(lane < l_actual, x32, 0.0)
        xn32, _, _ = _norm_t(x32, bd_ref, gamma_ref, dpg, eps)
        xn = xn32.astype(dt)

        # packed projections: [Hp, Lp] each (softmax scale pre-folded in wq)
        q_all = jax.lax.dot(wq_ref[...], xn, preferred_element_type=jnp.float32).astype(dt)
        k_all = jax.lax.dot(wk_ref[...], xn, preferred_element_type=jnp.float32).astype(dt)
        v_all = jax.lax.dot(wv_ref[...], xn, preferred_element_type=jnp.float32).astype(dt)

        o_heads = []
        shift_rows, recip_rows = [], []   # stashed softmax stats [1, Lp]
        for h in range(n_heads):
            sl = slice(h * dp, (h + 1) * dp)
            q_t0, k_t0, v_t = q_all[sl], k_all[sl], v_all[sl]  # [dp, Lp]
            k_t = _rope_t(k_t0, cos_ref[:], sin_ref[:], dp) if rope else k_t0
            o_blocks, s_blocks, r_blocks = [], [], []
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
                shift = _bounded_shift(q_t0[:, qsl], k_t0,
                                       lb=_diag_lb(q_t, k_t, qsl))
                p = _softmax_num(s, shift)
                # reciprocal of the UNDROPPED numerator sum: the forward
                # multiplies by it (mul beats div), the backward reuses it
                # via the stats stash and skips its own colsum pass
                recip = 1.0 / jnp.maximum(
                    jnp.sum(p, axis=0, keepdims=True), 1e-30)  # [1, BLK]
                if stash:
                    s_blocks.append(shift)
                    r_blocks.append(recip)
                if drop_rate > 0.0:  # reference's in-SDPA probability site
                    p = _drop_probs(p, seed_ref, group, gi, h, qb, blk_q,
                                    drop_rate)
                    # survivor 1/keep scale folded into the divisor
                    recip = recip * (1.0 / (1.0 - drop_rate))
                acc = jax.lax.dot_general(
                    v_t, p.astype(v_t.dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [dp, BLK]
                o_blocks.append(acc * recip)
            o_heads.append(o_blocks[0] if len(o_blocks) == 1
                           else jnp.concatenate(o_blocks, axis=1))
            if stash:
                shift_rows.append(s_blocks[0] if len(s_blocks) == 1
                                  else jnp.concatenate(s_blocks, axis=1))
                recip_rows.append(r_blocks[0] if len(r_blocks) == 1
                                  else jnp.concatenate(r_blocks, axis=1))
        o_all = (o_heads[0] if n_heads == 1
                 else jnp.concatenate(o_heads, axis=0)).astype(dt)  # [Hp, Lp]
        if stash:
            out_refs[1][gi] = o_all
            stats = jnp.concatenate(shift_rows + recip_rows, axis=0)
            sp = out_refs[2].shape[1]          # [group, sp, Lp] fp32
            if sp > 2 * n_heads:
                stats = jnp.concatenate(
                    [stats, jnp.zeros((sp - 2 * n_heads, lp), jnp.float32)],
                    axis=0)
            out_refs[2][gi] = stats

        out = jax.lax.dot(wo_ref[...], o_all,
                          preferred_element_type=jnp.float32)  # [Cp, Lp]
        if not residual:  # TP partial sum: dropout/residual after the psum
            o_ref[gi] = out.astype(o_ref.dtype)
            continue
        if drop_rate > 0.0:  # reference's post-projection dropout site
            keep = _dropout_mask(seed_ref, group, gi, out.shape, drop_rate)
            out = jnp.where(keep, out * (1.0 / (1.0 - drop_rate)), 0.0)
        o_ref[gi] = (x32 + out).astype(o_ref.dtype)


def _prep(x, gamma, w_qkv, w_out, n_heads, num_groups, rope, theta,
          group, blk_q_bytes=4 * 1024 * 1024):
    """Shared fwd/bwd host-side prep: transposed/padded rows, packed weight
    panels (softmax scale folded into wq), block-diag norm matrix, RoPE
    tables.  Returns a dict of kernel inputs + geometry."""
    r, seq_len, c = x.shape
    attention_dim = w_qkv.shape[0] // 3
    head_dim, cp, dp, hp = _dims(c, attention_dim, n_heads)
    lp = _round_up(seq_len, LANE)
    scale = 1.0 / math.sqrt(head_dim)
    dt = x.dtype
    rp = _round_up(r, group)

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
    wo = head_pack(w_out.T).T          # [Cp, Hp], zero cols at head padding

    gp = jnp.zeros((cp, 1), f32).at[:c, 0].set(gamma.astype(f32))
    group_of = np.full(cp, -1)
    group_of[:c] = np.arange(c) // (c // num_groups)
    bd = jnp.asarray(((group_of[:, None] == group_of[None, :])
                      & (group_of[:, None] >= 0)).astype(np.float32))

    cos = np.zeros((dp, lp), np.float32)
    sin = np.zeros((dp, lp), np.float32)
    if rope:
        from ..rope import _tables_np
        cos_np, sin_np = _tables_np(seq_len, head_dim, theta)  # [L, D]
        cos[:head_dim, :seq_len] = cos_np.T
        sin[:head_dim, :seq_len] = sin_np.T

    return dict(r=r, seq_len=seq_len, c=c, head_dim=head_dim, cp=cp, dp=dp,
                hp=hp, lp=lp, rp=rp, scale=scale, dt=dt, x_t=x_t, wq=wq,
                wk=wk, wv=wv, wo=wo, gp=gp, bd=bd, cos=jnp.asarray(cos),
                sin=jnp.asarray(sin), attention_dim=attention_dim)


def _seed_arr(seed):
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    return jnp.asarray(seed, jnp.int32).reshape(1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 11))
def fused_attention_block(x, gamma, w_qkv, w_out, n_heads: int,
                          num_groups: int, eps: float, rope: bool = True,
                          theta: float = 10000.0, drop_rate: float = 0.0,
                          seed=None, residual: bool = True):
    """x ``[R, L, C]`` -> ``x + Drop(OutProj(MHSA(RMSGroupNorm(x))))``.

    gamma ``[C]`` is the pre-norm RMSGroupNorm scale (``x/(rms+eps)*gamma``
    quirk preserved); ``w_qkv [3*A, C]`` / ``w_out [C, A]`` are the torch-
    layout projection weights (reference ``mss_tflocoformer.py:485-486``).
    With ``drop_rate > 0`` BOTH reference dropout sites run in-kernel from
    the int32 ``seed [1]`` — attention probabilities (the reference's SDPA
    ``dropout_p``, same rate) and the projected output; the backward
    replays both masks bit-identically.

    ``residual=False`` is the tensor-parallel mode (``parallel/tp_fused.py``):
    the call computes only ``OutProj(MHSA(RMSGroupNorm(x)))`` for ITS heads —
    one mp-shard's PARTIAL sum — so the caller psums over mp and applies the
    post-projection dropout site and the residual add itself.  The in-SDPA
    probability dropout site still runs in-kernel (it is per-head).
    """
    return _attn_forward(x, gamma, w_qkv, w_out, n_heads, num_groups, eps,
                         rope, theta, drop_rate, seed, residual=residual)


def _attn_forward(x, gamma, w_qkv, w_out, n_heads, num_groups, eps,
                  rope, theta, drop_rate=0.0, seed=None, return_o=False,
                  residual=True):
    _, cp, _, hp = _dims(x.shape[-1], w_qkv.shape[0] // 3, n_heads)
    lp = _round_up(x.shape[1], LANE)
    itemsize = jnp.dtype(x.dtype).itemsize
    sp = _round_up(2 * n_heads, 8)     # stats sublanes: H shifts + H recips
    stash_row = (2 * hp * lp * itemsize + 2 * sp * lp * 4) if return_o else 0
    if drop_rate > 0.0:
        # probability dropout keeps a third [Lp, BLK]-class buffer (the
        # masked numerator) live: 2/3 budget bounds 3 buffers by the same
        # bytes supports_block charged for 2
        blk_q = _blk_q(lp, _FWD_BLK_BUDGET * 2 // 3)
        group = _pick_group(lp, cp, hp, blk_q, bwd=False,
                            extra=lp * blk_q * 4,
                            itemsize=itemsize, extra_row=stash_row)
    else:
        blk_q = _blk_q(lp, _FWD_BLK_BUDGET)
        group = _pick_group(lp, cp, hp, blk_q, bwd=False,
                            itemsize=itemsize, extra_row=stash_row)
    geo = _prep(x, gamma, w_qkv, w_out, n_heads, num_groups, rope, theta,
                group)
    r, seq_len, c = geo["r"], geo["seq_len"], geo["c"]
    rp, dt = geo["rp"], geo["dt"]

    row = lambda: pl.BlockSpec((group, cp, lp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    row_hp = lambda: pl.BlockSpec((group, hp, lp), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    row_sp = lambda: pl.BlockSpec((group, sp, lp), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    out_specs = (row(), row_hp(), row_sp()) if return_o else row()
    out_shape = ((jax.ShapeDtypeStruct((rp, cp, lp), dt),
                  jax.ShapeDtypeStruct((rp, hp, lp), dt),
                  jax.ShapeDtypeStruct((rp, sp, lp), jnp.float32))
                 if return_o else jax.ShapeDtypeStruct((rp, cp, lp), dt))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, n_heads=n_heads, dp=geo["dp"],
                          dpg=c // num_groups, eps=float(eps),
                          l_actual=seq_len, blk_q=blk_q, group=group,
                          rope=rope, drop_rate=float(drop_rate),
                          stash=return_o, residual=residual),
        grid=(rp // group,),
        in_specs=[row(), const((cp, 1)), const((cp, cp)),
                  const((hp, cp)), const((hp, cp)), const((hp, cp)),
                  const((cp, hp)), const((geo["dp"], lp)),
                  const((geo["dp"], lp)),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
    )(geo["x_t"], geo["gp"], geo["bd"], geo["wq"], geo["wk"], geo["wv"],
      geo["wo"], geo["cos"], geo["sin"], _seed_arr(seed))
    if return_o:
        out, o_stash, stats = out
        return (jnp.swapaxes(out[:r, :c, :seq_len], -1, -2), o_stash[:r],
                stats[:r])
    return jnp.swapaxes(out[:r, :c, :seq_len], -1, -2)


def _attn_bwd_kernel(x_ref, gamma_ref, bd_ref, wq_ref, wk_ref, wv_ref,
                     wo_ref, cos_ref, sin_ref, seed_ref, g_ref, ostash_ref,
                     stats_ref, dx_ref, dgamma_ref, dwq_ref, dwk_ref,
                     dwv_ref, dwo_ref,
                     *, n_heads: int, dp: int, dpg: int, eps: float,
                     l_actual: int, blk_q: int, group: int, rope: bool,
                     drop_rate: float, residual: bool = True):
    lp = x_ref.shape[-1]
    masked = lp != l_actual
    dt = wq_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dgamma_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref):
            ref[...] = jnp.zeros_like(ref)

    for gi in range(group):
        x32 = x_ref[gi].astype(jnp.float32)                    # [Cp, Lp]
        lane = jax.lax.broadcasted_iota(jnp.int32, x32.shape, 1)
        live = lane < l_actual
        x32 = jnp.where(live, x32, 0.0)
        xn32, inv, rms = _norm_t(x32, bd_ref, gamma_ref, dpg, eps)
        xn = xn32.astype(dt)

        q_all = jax.lax.dot(wq_ref[...], xn, preferred_element_type=jnp.float32).astype(dt)
        k_all = jax.lax.dot(wk_ref[...], xn, preferred_element_type=jnp.float32).astype(dt)
        v_all = jax.lax.dot(wv_ref[...], xn, preferred_element_type=jnp.float32).astype(dt)

        dz = jnp.where(live, g_ref[gi].astype(jnp.float32), 0.0)
        dzd = dz
        # the post-projection dropout site only exists in residual mode (the
        # TP caller applies it after the psum, so its cotangent is already
        # masked by XLA's AD by the time g arrives here)
        if drop_rate > 0.0 and residual:  # replay the forward's exact mask
            keep = _dropout_mask(seed_ref, group, gi, dz.shape, drop_rate)
            dzd = jnp.where(keep, dz * (1.0 / (1.0 - drop_rate)), 0.0)
        dzd_c = dzd.astype(dt)

        # d o_all = wo^T-contraction (contract Cp)          [Hp, Lp]
        do_all = jax.lax.dot_general(
            wo_ref[...], dzd_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        dq_heads, dk_heads, dv_heads = [], [], []
        for h in range(n_heads):
            sl = slice(h * dp, (h + 1) * dp)
            q_t0, k_t0, v_t = q_all[sl], k_all[sl], v_all[sl]  # [dp, Lp]
            k_t = _rope_t(k_t0, cos_ref[:], sin_ref[:], dp) if rope else k_t0
            do_h = do_all[sl].astype(dt)                       # [dp, Lp]
            dk_acc = jnp.zeros((dp, lp), jnp.float32)
            dv_acc = jnp.zeros((dp, lp), jnp.float32)
            dq_blocks = []
            for qb in range(lp // blk_q):
                qsl = slice(qb * blk_q, (qb + 1) * blk_q)
                q_t = _rope_t(q_t0[:, qsl], cos_ref[:, qsl], sin_ref[:, qsl],
                              dp) if rope else q_t0[:, qsl]
                do_t = do_h[:, qsl]                            # [dp, BLK]
                s = jax.lax.dot_general(
                    k_t, q_t, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [Lp, BLK]
                if masked:
                    rowi = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                    s = jnp.where(rowi < l_actual, s, -1e30)
                # softmax stats come from the forward's stash — the shift
                # and the reciprocal of the undropped numerator sum are
                # functions of (row, head, q-column) only, so the backward
                # skips _bounded_shift/_diag_lb AND its colsum pass and
                # normalizes with one broadcast multiply
                shift = stats_ref[gi, h:h + 1, qsl]            # [1, BLK]
                recip = stats_ref[gi, n_heads + h:n_heads + h + 1, qsl]
                p = _softmax_num(s, shift) * recip
                if drop_rate > 0.0:
                    # replay the forward's probability mask ONCE: Pd feeds
                    # dv; the P cotangent gets the same mask applied to
                    # V^T dO (drop-after-normalize).  Masks are applied
                    # WITHOUT the 1/keep survivor scale — it is constant,
                    # so it factors linearly through ds and the dv sum and
                    # is applied once per head to the [dp, Lp] accumulators
                    # after the q-block loop (saves two full [Lp, BLK]
                    # multiply passes per block; tools/dropout_prng_probe.py)
                    keeps = _prob_keeps(seed_ref, group, gi, lp, h, qb,
                                        blk_q, drop_rate)
                    pd = _apply_keeps(p, keeps, drop_rate)
                else:
                    pd = p
                pd_c = pd.astype(dt)
                dp_ = jax.lax.dot_general(
                    v_t, do_t, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [Lp, BLK]
                # ds = p o (M o dP) - p o colsum(p o (M o dP)); the mask is
                # idempotent and elementwise, so p o (M o dP) = Pd o dP and
                # the second mask application (plus one multiply pass)
                # disappears — t is computed ONCE and reused for both terms
                t = pd * dp_
                ds = t - p * jnp.sum(t, axis=0, keepdims=True)
                ds_c = ds.astype(dt)
                dq_blocks.append(jax.lax.dot_general(
                    k_t, ds_c, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))       # [dp, BLK]
                dk_acc += jax.lax.dot_general(
                    q_t, ds_c, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dv_acc += jax.lax.dot_general(
                    do_t, pd_c, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            dq_rot = (dq_blocks[0] if len(dq_blocks) == 1
                      else jnp.concatenate(dq_blocks, axis=1))
            if drop_rate > 0.0:
                # deferred survivor 1/keep scale (see the mask comment
                # above): ds and pd were masked unscaled, so dq/dk/dv all
                # carry a constant (1-rate) factor — undo it ONCE on the
                # narrow [dp, *] head accumulators
                ikp = 1.0 / (1.0 - drop_rate)
                dq_rot = dq_rot * ikp
                dk_acc = dk_acc * ikp
                dv_acc = dv_acc * ikp
            if rope:  # back-rotate cotangents: R is orthogonal, R^-1=R(-th)
                dq_rot = _rope_t(dq_rot, cos_ref[:], -sin_ref[:], dp)
                dk_acc = _rope_t(dk_acc, cos_ref[:], -sin_ref[:], dp)
            dq_heads.append(dq_rot)
            dk_heads.append(dk_acc)
            dv_heads.append(dv_acc)

        def cat(blocks):
            return (blocks[0] if len(blocks) == 1
                    else jnp.concatenate(blocks, axis=0))

        dq_all = cat(dq_heads).astype(dt)
        dk_all = cat(dk_heads).astype(dt)
        dv_all = cat(dv_heads).astype(dt)

        # dwo from the forward's STASHED head outputs (no V @ Pd recompute)
        dwo_ref[...] += jax.lax.dot_general(
            dzd_c, ostash_ref[gi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # [Cp, Hp]

        # dxn = sum of wq^T dq + wk^T dk + wv^T dv (contract Hp)
        dxn = jax.lax.dot_general(
            wq_ref[...], dq_all, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxn += jax.lax.dot_general(
            wk_ref[...], dk_all, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxn += jax.lax.dot_general(
            wv_ref[...], dv_all, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [Cp, Lp]
        dxn = jnp.where(live, dxn, 0.0)

        xn_c = xn
        dwq_ref[...] += jax.lax.dot_general(
            dq_all, xn_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # [Hp, Cp]
        dwk_ref[...] += jax.lax.dot_general(
            dk_all, xn_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwv_ref[...] += jax.lax.dot_general(
            dv_all, xn_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        # norm backward (channels on sublanes)
        dgamma_ref[...] += jnp.sum(dxn * x32 * inv, axis=1, keepdims=True)
        gdxn = dxn * gamma_ref[...]
        t_grp = jax.lax.dot(bd_ref[...], gdxn * x32,
                            preferred_element_type=jnp.float32)
        rms_safe = jnp.maximum(rms, 1e-30)
        dx_norm = gdxn * inv - x32 * t_grp * inv * inv / (dpg * rms_safe)
        dx_norm = jnp.where(live, dx_norm, 0.0)
        # residual path cotangent only in residual mode (TP adds x outside)
        dx_ref[gi] = (dx_norm + dz if residual else dx_norm
                      ).astype(dx_ref.dtype)


def _attn_backward_pallas(x, gamma, w_qkv, w_out, n_heads, num_groups, eps,
                          rope, theta, drop_rate, seed, g, o_stash, stats,
                          residual=True):
    _, cp, _, hp = _dims(x.shape[-1], w_qkv.shape[0] // 3, n_heads)
    lp = _round_up(x.shape[1], LANE)
    itemsize = jnp.dtype(x.dtype).itemsize
    sp = stats.shape[1]
    stash_row = 2 * hp * lp * itemsize + 2 * sp * lp * 4
    if drop_rate > 0.0:
        # the probability masks decompose into ABSOLUTE 128-lane subtiles
        # (see _prob_keep), so any 128-multiple q-block width replays the
        # forward's masks; the width is bounded by 7 live [Lp, BLK] fp32
        # buffers (4 score-class + keep/Pd/dPm) within the same ~4.1 MiB
        # the old fixed-128 choice used at freq-path shapes — time-path
        # shapes now take whole-row blocks instead of 3 softmax passes
        blk_q = _blk_q(lp, 2 * (4224 * 1024) // 7)
        group = _pick_group(lp, cp, hp, blk_q, bwd=True,
                            extra=3 * lp * blk_q * 4,
                            itemsize=itemsize, extra_row=stash_row)
    else:
        blk_q = _blk_q(lp, 2 * 1024 * 1024)
        group = _pick_group(lp, cp, hp, blk_q, bwd=True,
                            itemsize=itemsize, extra_row=stash_row)
    geo = _prep(x, gamma, w_qkv, w_out, n_heads, num_groups, rope, theta,
                group)
    r, seq_len, c = geo["r"], geo["seq_len"], geo["c"]
    rp, dt, dp = geo["rp"], geo["dt"], geo["dp"]
    head_dim, a = geo["head_dim"], geo["attention_dim"]

    g_t = jnp.pad(jnp.swapaxes(g.astype(dt), -1, -2),
                  ((0, rp - r), (0, cp - c), (0, lp - seq_len)))
    o_t = jnp.pad(o_stash, ((0, rp - r), (0, 0), (0, 0)))  # [rp, hp, lp]
    st_t = jnp.pad(stats, ((0, rp - r), (0, 0), (0, 0)))   # [rp, sp, lp]

    f32 = jnp.float32
    row = lambda: pl.BlockSpec((group, cp, lp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    row_hp = lambda: pl.BlockSpec((group, hp, lp), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    row_sp = lambda: pl.BlockSpec((group, sp, lp), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, n_heads=n_heads, dp=dp,
                          dpg=c // num_groups, eps=float(eps),
                          l_actual=seq_len, blk_q=blk_q, group=group,
                          rope=rope, drop_rate=float(drop_rate),
                          residual=residual),
        grid=(rp // group,),
        in_specs=[row(), const((cp, 1)), const((cp, cp)),
                  const((hp, cp)), const((hp, cp)), const((hp, cp)),
                  const((cp, hp)), const((dp, lp)), const((dp, lp)),
                  pl.BlockSpec(memory_space=pltpu.SMEM), row(), row_hp(),
                  row_sp()],
        out_specs=(row(), const((cp, 1)), const((hp, cp)), const((hp, cp)),
                   const((hp, cp)), const((cp, hp))),
        out_shape=(
            jax.ShapeDtypeStruct((rp, cp, lp), dt),
            jax.ShapeDtypeStruct((cp, 1), f32),
            jax.ShapeDtypeStruct((hp, cp), f32),
            jax.ShapeDtypeStruct((hp, cp), f32),
            jax.ShapeDtypeStruct((hp, cp), f32),
            jax.ShapeDtypeStruct((cp, hp), f32),
        ),
    )(geo["x_t"], geo["gp"], geo["bd"], geo["wq"], geo["wk"], geo["wv"],
      geo["wo"], geo["cos"], geo["sin"], _seed_arr(seed), g_t, o_t, st_t)
    dx_t, dgm, dwq, dwk, dwv, dwo = outs

    dx = jnp.swapaxes(dx_t[:r, :c, :seq_len], -1, -2).astype(x.dtype)
    dgamma = dgm[:c, 0].astype(gamma.dtype)

    def head_unpack(wp, post_scale=1.0):  # [Hp, Cp] -> [A, C]
        w = wp.reshape(n_heads, dp, cp)[:, :head_dim, :c]
        return (w.reshape(a, c) * post_scale)

    # wq panel carried the folded softmax scale: w_panel = w * scale, so
    # dL/dw = scale * dL/dw_panel
    dw_qkv = jnp.concatenate([
        head_unpack(dwq, geo["scale"]), head_unpack(dwk), head_unpack(dwv),
    ], axis=0).astype(w_qkv.dtype)
    dw_out = head_unpack(dwo.T).T.astype(w_out.dtype)   # [Cp,Hp] -> [C, A]
    return dx, dgamma, dw_qkv, dw_out


def reference_attention_block(x, gamma, w_qkv, w_out, n_heads, num_groups,
                              eps, rope=True, theta=10000.0, residual=True):
    """Unfused composition (parity oracle AND the drop-free backward
    fallback — flash_attention inside carries its own Pallas backward).
    ``residual=False`` matches the TP partial-output kernel mode."""
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
    proj = o @ w_out.T.astype(x.dtype)
    return x + proj if residual else proj


def _attn_fwd(x, gamma, w_qkv, w_out, n_heads, num_groups, eps, rope, theta,
              drop_rate, seed=None, residual=True):
    out, o_stash, stats = _attn_forward(x, gamma, w_qkv, w_out, n_heads,
                                        num_groups, eps, rope, theta,
                                        drop_rate, seed, return_o=True,
                                        residual=residual)
    return out, (x, gamma, w_qkv, w_out, seed, o_stash, stats)


def _attn_bwd(n_heads, num_groups, eps, rope, theta, drop_rate, residual,
              res, g):
    x, gamma, w_qkv, w_out, seed, o_stash, stats = res
    try:
        grads = _attn_backward_pallas(x, gamma, w_qkv, w_out, n_heads,
                                      num_groups, eps, rope, theta,
                                      drop_rate, seed, g, o_stash, stats,
                                      residual=residual)
    except Exception as e:
        if drop_rate > 0.0:
            raise  # the XLA fallback cannot replay the in-kernel mask
        from . import warn_fallback
        warn_fallback("attention_block.bwd", e)
        _, vjp = jax.vjp(
            lambda *a: reference_attention_block(*a, n_heads, num_groups,
                                                 eps, rope, theta,
                                                 residual=residual),
            x, gamma, w_qkv, w_out)
        grads = vjp(g)
    if seed is None:
        d_seed = (None,)
    else:
        d_seed = (np.zeros(jnp.shape(seed), jax.dtypes.float0),)
    return tuple(grads) + d_seed


fused_attention_block.defvjp(_attn_fwd, _attn_bwd)
