"""Fused attention kernel (Pallas/TPU) for TF-Locoformer shapes.

Shape regime (see SURVEY.md §3 hot-loop summary): row batch N = B*T*H or
B*F*H is large (hundreds to thousands), sequence length L is moderate
(freq bins F <= 2049, or chunked frame counts), head_dim D is small (16-64).
The XLA path materializes ``N * L * L`` fp32 scores in HBM (the reference's
documented OOM, MEMORY_ANALYSIS.md); here scores live only in VMEM.

Design: "block-Q flash".  For each (row, q-block) grid cell the FULL K/V for
that row sits in VMEM (L*128 fp32 <= ~1 MB at L=2049) and the kernel computes
the q-block's entire score row in one MXU pass + fp32 softmax + PV matmul —
no online-softmax loop needed at these L, which keeps the kernel a straight
3-op pipeline.  head_dim is zero-padded to the 128-lane width (zero pads are
exact no-ops for QK^T and are cropped from the PV output).

Backward: gradients recompute attention through the memory-bounded chunked
XLA path (``custom_vjp`` below) — correct and OOM-free; a fused Pallas
backward is a further optimization.

Falls back (raises to caller) when L exceeds the VMEM budget; callers catch
and use the chunked backend.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

LANE = 128
MAX_L = 4096  # VMEM budget guard (K,V fp32 + bf16 inputs comfortably fit)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_block_q(lp: int) -> int:
    """Largest divisor of ``lp`` that is a multiple of 128 and <= 512 —
    minimizes padded-score inflation (VPU softmax cost) while keeping few
    grid programs."""
    best = 128
    for blk in range(128, 513, 128):
        if lp % blk == 0:
            best = blk
    return best


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, l_actual: int):
    q = q_ref[0]  # [BLK_Q, 128]
    k = k_ref[0]  # [KP, 128]
    v = v_ref[0]  # [KP, 128]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [BLK_Q, KP]

    kp = s.shape[-1]
    if kp != l_actual:  # mask padded key columns
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < l_actual, s, -1e30)

    # unnormalized softmax; the row divide happens on the tiny [BLK_Q, 128]
    # output instead of the full [BLK_Q, KP] score block (VPU savings)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)

    acc = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (acc / denom).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return _flash_forward(q, k, v)


def _flash_forward(q, k, v):
    """q, k, v: [..., L, D] -> [..., L, D]."""
    *lead, L, D = q.shape
    if L > MAX_L:
        raise ValueError(f"flash_attention: L={L} exceeds VMEM budget {MAX_L}")
    n = math.prod(lead) if lead else 1
    scale = 1.0 / math.sqrt(D)

    lp = _round_up(L, LANE)        # padded seq length (q and k sides)
    blk_q = _pick_block_q(lp)
    dp = _round_up(D, LANE)

    def prep(x):
        x = x.reshape(n, L, D)
        return jnp.pad(x, ((0, 0), (0, lp - L), (0, dp - D)))

    qp, kp, vp = prep(q), prep(k), prep(v)

    grid = (n, lp // blk_q)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, l_actual=L),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # K/V index maps ignore j -> fetched once per row n, reused
            # across all q-blocks (j is the fastest-varying grid dim)
            pl.BlockSpec((1, lp, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, dp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, lp, dp), q.dtype),
    )(qp, kp, vp)
    return out[:, :L, :D].reshape(*lead, L, D)


def _flash_fwd(q, k, v):
    return _flash_forward(q, k, v), (q, k, v)


def _flash_bwd(residuals, g):
    from ..attention import _chunked_attention, _DEFAULT_MAX_SCORE_BYTES
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda a, b, c: _chunked_attention(a, b, c, _DEFAULT_MAX_SCORE_BYTES),
        q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
