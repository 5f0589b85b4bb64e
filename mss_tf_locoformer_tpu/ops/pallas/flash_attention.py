"""Fused attention kernel (Pallas/TPU) for TF-Locoformer shapes.

Shape regime (see SURVEY.md §3 hot-loop summary): row batch N = B*T*H or
B*F*H is large (thousands), sequence length L is moderate (freq bins
F <= 2049, chunked frame counts ~100s), head_dim D is SMALL (16-64).  The
XLA path materializes ``N * L * L`` fp32 scores in HBM (the reference's
documented OOM, MEMORY_ANALYSIS.md); here scores live only in VMEM.

Design — "transposed block flash", shaped by two facts measured on v5e:

  1. **Small D is lane poison.**  A conventional ``[L, D]`` layout pads
     D=24 to the 128-lane width: 5.3x wasted HBM traffic on Q/K/V/O and a
     5.3x-padded PV matmul.  Here tensors are TRANSPOSED to ``[D, L]`` so D
     sits on *sublanes* (pad 24 -> 32, 1.3x) and L on lanes.  Scores are
     computed directly transposed, ``S^T = K_t^T-contraction-Q_t`` via a
     dim-0/dim-0 ``dot_general`` (contraction over D), softmax runs over the
     sublane axis, and ``O^T = V_t @ P`` contracts over L at full MXU
     efficiency with a ``[D, L]`` output.  Net: ~4x less HBM traffic and no
     lane-padded matmul flops.
  2. **Tiny grid programs are dispatch poison.**  One (row, q-block) per
     program put ~12k programs on the grid at ~5 us fixed cost each.  Here
     each program owns ``G`` row-heads (G sized to VMEM) and loops q-blocks
     and rows internally, cutting the grid ~12x.

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
SUBLANE = 32          # D padding granularity (bf16 tile height 16; 32 is safe)
MAX_L = 4096          # VMEM budget guard
_VMEM_TARGET = 13 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_blk_q(lp: int) -> int:
    """Whole-Lp q-blocks when the fp32 score block fits VMEM (measured 27%
    faster at L=1025 than 384-wide blocks — fewer softmax passes); else the
    largest 128-multiple divisor <= 512."""
    if lp * lp * 4 <= 6 * 1024 * 1024:
        return lp
    best = 128
    for blk in range(128, 513, 128):
        if lp % blk == 0:
            best = blk
    return best


def _pick_group(lp: int, dp: int, blk_q: int, itemsize: int) -> int:
    """Rows per program: fill VMEM with q/k/v/o rows next to the fp32 score
    blocks, amortizing per-program dispatch cost.  Pallas double-buffers
    every grid block (x2), and the softmax keeps ~3 score-sized fp32
    temporaries (s, p, and the exp scratch) live.

    The kernel body is a PYTHON loop — Mosaic sees group * (lp // blk_q)
    unrolled iterations.  153 instances (xlarge freq: L=2049 -> group 9 x
    17 q-blocks) crash or spin the remote Mosaic compiler (and a spinning
    compile wedges the device tunnel ~30 min); every known-good compile is
    <= 64 bodies (base time path: group 60 x 1).  Cap the PRODUCT at 64:
    more grid programs (~5 us dispatch each), bounded compiler input.
    Probed on-chip: 51 bodies (group 3 x 17) compile in 156 s and run."""
    score_bytes = 3 * lp * blk_q * 4
    per_row = 2 * 4 * dp * lp * itemsize  # q, k, v, o, double-buffered
    g = max(1, (_VMEM_TARGET - score_bytes) // per_row)
    n_qb = max(1, lp // blk_q)
    g = min(g, max(1, 64 // n_qb))
    return int(min(g, 64))


def _rope_t(x, cos_t, sin_t, dp):
    """RoPE in the transposed [Dp, L] layout, fp32: the interleaved-pair
    partner swap is a sublane roll pair + row-parity select."""
    xf = x.astype(jnp.float32)
    up = pltpu.roll(xf, dp - 1, 0)    # row d <- x[d+1]
    dn = pltpu.roll(xf, 1, 0)         # row d <- x[d-1]
    row = jax.lax.broadcasted_iota(jnp.int32, xf.shape, dimension=0)
    swapped = jnp.where(row % 2 == 0, -up, dn)
    return (xf * cos_t + swapped * sin_t).astype(x.dtype)


_LOG2E = 1.4426950408889634
_SHIFT_MARGIN = 65.0  # natural-log headroom for the max entry (65*log2e < cap)
_LB_MARGIN = 40.0     # headroom above the diag lower bound (see docstring)
_EXP2_CAP = 100.0     # saturating exp2: p <= 2^100, denom <= L*2^100 < fp32 max


def _bounded_shift(q_t, k_t, scale: float = 1.0, lb=None):
    """Per-query-column softmax shift WITHOUT a max pass over the scores
    (measured 18.4 -> 12.7 ms at freq-path shapes — the cross-sublane max
    over [Lp, BLK] fp32 was ~30% of kernel time).  Softmax is exactly
    invariant to any per-column constant, so correctness only needs a bound
    that prevents fp32 overflow: Cauchy-Schwarz gives
    ``max_l s[l] <= ||q_col|| * max_l ||k_l||``.  Shift by
    ``max(bound - 80, 0)``: the largest exponent stays <= 80 (no overflow);
    entries more than ~103 below the shift underflow to 0, which is where
    softmax sends them anyway.  RoPE preserves norms, so the bound holds
    for rotated q/k too.

    ``lb`` (a ``[1, BLK]`` exact LOWER bound on each column's row max — the
    diagonal score ``q_j . k_j``, free on the VPU) guards the loose bound:
    the Cauchy-Schwarz gap is unbounded, and a gap past ~167 used to
    underflow EVERY probability, silently returning all-zero attention
    (round-2 advisor finding).  The guarded shift is
    ``min(shift_raw, lb + 40)``: the max entry's probability is always
    ``>= exp(-40) ~= 2^-58`` (no silent zeros possible), and since entries
    more than ~60 below the max never matter (< 2^-87 relative mass), the
    result equals the exact softmax everywhere the score spread allows a
    single fp32 shift.  Overflow when ``max >> lb`` is prevented NOT by the
    shift but by the saturating :func:`_softmax_num` exponent cap — so no
    regime produces inf/NaN or all-zero rows; scores spreading >69 natural
    units above ``lb + 40`` (unreachable for the shipped models, whose
    scores span well under that) flatten onto the cap instead."""
    kn = jnp.sum(k_t.astype(jnp.float32) ** 2, axis=0, keepdims=True)
    kmax = jnp.sqrt(jnp.max(kn))                                  # scalar
    qn = jnp.sqrt(jnp.sum(q_t.astype(jnp.float32) ** 2, axis=0,
                          keepdims=True))                         # [1, BLK]
    shift = jnp.maximum(qn * kmax * scale - _SHIFT_MARGIN, 0.0)
    if lb is not None:
        shift = jnp.minimum(shift, lb + _LB_MARGIN)
    return shift


def _softmax_num(s, shift):
    """Softmax numerator ``exp2`` with a saturating exponent: the cap makes
    fp32 overflow impossible for ANY shift (denominator <= L * 2^100, the
    PV accumulation stays finite), replacing the old hard overflow margin.
    It never engages within ``_SHIFT_MARGIN`` of headroom — normal operation
    is bit-identical to the uncapped kernel."""
    return jnp.exp2(jnp.minimum((s - shift) * _LOG2E, _EXP2_CAP))


def _diag_lb(q_t_rot, k_t_rot, qsl):
    """Exact per-column lower bound on the row max of ``S^T = K^T Q``: the
    diagonal score of this q-block, computed as an elementwise product +
    sublane sum of the ALIGNED (rotated, scaled) q/k columns."""
    return jnp.sum(q_t_rot.astype(jnp.float32)
                   * k_t_rot[:, qsl].astype(jnp.float32),
                   axis=0, keepdims=True)


def _kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *, scale: float,
            l_actual: int, blk_q: int, group: int, rope: bool):
    lp = q_ref.shape[-1]
    dp = q_ref.shape[-2]
    masked = lp != l_actual
    for gi in range(group):
        k_t0 = k_ref[gi]  # [Dp, Lp]
        v_t = v_ref[gi]
        k_t = _rope_t(k_t0, cos_ref[:], sin_ref[:], dp) if rope else k_t0
        for qb in range(lp // blk_q):
            qsl = slice(qb * blk_q, (qb + 1) * blk_q)
            q_t0 = q_ref[gi, :, qsl]                          # [Dp, BLK]
            q_t = _rope_t(q_t0, cos_ref[:, qsl], sin_ref[:, qsl], dp) \
                if rope else q_t0
            # S^T [Lp, BLK]: contraction over D (sublane axis of both)
            s = jax.lax.dot_general(
                k_t, q_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if masked:  # mask padded KEY rows (dim 0 of S^T)
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=0)
                s = jnp.where(row < l_actual, s, -1e30)
            # norms on the UNROTATED q/k (RoPE is norm-preserving); q already
            # carries the pre-folded softmax scale.  NB ``scale`` here is the
            # post-matmul score scale (1.0 when folded into q), so the diag
            # lower bound must match it too.
            shift = _bounded_shift(q_t0, k_t0, scale,
                                   lb=_diag_lb(q_t, k_t, qsl) * scale)
            p = _softmax_num(s, shift)
            denom = jnp.sum(p, axis=0, keepdims=True)  # [1, BLK]
            # O^T [Dp, BLK] = V_t @ P: contraction over Lp (full MXU depth)
            acc = jax.lax.dot_general(
                v_t, p.astype(v_t.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[gi, :, qb * blk_q:(qb + 1) * blk_q] = \
                (acc / jnp.maximum(denom, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    rope: bool = False, theta: float = 10000.0) -> jnp.ndarray:
    """Attention over the second-to-last axis; with ``rope=True`` the
    interleaved-pair rotary embedding (fp32) is fused into the kernel —
    skipping two full HBM round-trips of Q and K."""
    return _flash_forward(q, k, v, rope, theta)


def _flash_forward(q, k, v, rope=False, theta=10000.0):
    """q, k, v: [..., L, D] -> [..., L, D]."""
    *lead, L, D = q.shape
    if L > MAX_L:
        raise ValueError(f"flash_attention: L={L} exceeds VMEM budget {MAX_L}")
    n = math.prod(lead) if lead else 1
    scale = 1.0 / math.sqrt(D)

    lp = _round_up(L, LANE)
    dp = _round_up(D, SUBLANE)
    blk_q = _pick_blk_q(lp)
    group = _pick_group(lp, dp, blk_q, jnp.dtype(q.dtype).itemsize)
    n_pad = _round_up(n, group)

    def prep(x, pre_scale=1.0):
        x = x.reshape(n, L, D)
        if pre_scale != 1.0:
            x = x * jnp.asarray(pre_scale, x.dtype)
        x = jnp.swapaxes(x, -1, -2)  # [n, D, L]
        return jnp.pad(x, ((0, n_pad - n), (0, dp - D), (0, lp - L)))

    # fold the softmax scale into q on the XLA side (fuses with the
    # transpose; legal before RoPE too — rotation is linear per pair)
    qp, kp, vp = prep(q, scale), prep(k), prep(v)

    from ..rope import _tables_np
    import numpy as np
    if rope:
        cos_np, sin_np = _tables_np(L, D, theta)  # [L, D]
        cos = np.zeros((dp, lp), np.float32)
        sin = np.zeros((dp, lp), np.float32)
        cos[:D, :L] = cos_np.T
        sin[:D, :L] = sin_np.T
    else:  # unused constants; keep the kernel signature uniform
        cos = np.zeros((dp, lp), np.float32)
        sin = np.zeros((dp, lp), np.float32)

    grid = (n_pad // group,)
    spec = pl.BlockSpec((group, dp, lp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((dp, lp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=1.0, l_actual=L, blk_q=blk_q,
                          group=group, rope=rope),
        grid=grid,
        in_specs=[spec, spec, spec, tspec, tspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, dp, lp), q.dtype),
    )(qp, kp, vp, jnp.asarray(cos), jnp.asarray(sin))
    out = jnp.swapaxes(out[:n, :D, :L], -1, -2)  # [n, L, D]
    return out.reshape(*lead, L, D)


def _flash_fwd(q, k, v, rope, theta):
    return _flash_forward(q, k, v, rope, theta), (q, k, v)


_BWD_MAX_SCORE_BYTES = 128 * 1024 * 1024
# Fallback-path budget: the chunked recompute's per-iteration scores get
# several live copies during the transpose; 128 MiB keeps the whole
# attention backward under ~1 GiB live.


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                l_actual: int, blk_q: int, group: int):
    """Flash backward, transposed layout.  Per (row, q-block): recompute
    P = softmax(S^T) in VMEM (no stats saved from forward), then
    dV^T = dO^T P^T-contraction, dS = P*(dP - colsum(P*dP)),
    dQ^T = K^T-contraction-dS, dK^T accumulates Q^T-contraction-dS."""
    lp = q_ref.shape[-1]
    masked = lp != l_actual
    for gi in range(group):
        k_t = k_ref[gi]   # [Dp, Lp]
        v_t = v_ref[gi]
        dk_acc = jnp.zeros(k_t.shape, jnp.float32)
        dv_acc = jnp.zeros(v_t.shape, jnp.float32)
        for qb in range(lp // blk_q):
            sl = slice(qb * blk_q, (qb + 1) * blk_q)
            q_t = q_ref[gi, :, sl]    # [Dp, BLK] (pre-scaled)
            do_t = do_ref[gi, :, sl]  # [Dp, BLK]
            s = jax.lax.dot_general(k_t, q_t, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if masked:
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                s = jnp.where(row < l_actual, s, -1e30)
            # same max-free recompute as forward (diag-guarded)
            shift = _bounded_shift(q_t, k_t, lb=_diag_lb(q_t, k_t, sl))
            p = _softmax_num(s, shift)
            p = p / jnp.maximum(jnp.sum(p, axis=0, keepdims=True),
                                1e-30)                           # [Lp, BLK]
            dp = jax.lax.dot_general(v_t, do_t, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(p * dp, axis=0, keepdims=True))
            ds_c = ds.astype(k_t.dtype)
            p_c = p.astype(v_t.dtype)
            dq_ref[gi, :, sl] = jax.lax.dot_general(
                k_t, ds_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dq_ref.dtype)
            dk_acc += jax.lax.dot_general(
                q_t, ds_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dv_acc += jax.lax.dot_general(
                do_t, p_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        dk_ref[gi] = dk_acc.astype(dk_ref.dtype)
        dv_ref[gi] = dv_acc.astype(dv_ref.dtype)


def _flash_backward_pallas(q, k, v, g, rope, theta):
    """dq, dk, dv for ``_flash_forward`` via the Pallas backward kernel.

    RoPE handling on the XLA side: forward computes attn(R(q)s, R(k), v);
    the kernel differentiates w.r.t. the ROTATED inputs, then cotangents are
    back-rotated (R is orthogonal: dx = R^{-1}(dx_rot), i.e. RoPE at -theta).
    """
    from ..rope import apply_rope
    *lead, L, D = q.shape
    n = math.prod(lead) if lead else 1
    scale = 1.0 / math.sqrt(D)
    lp = _round_up(L, LANE)
    dp = _round_up(D, SUBLANE)
    blk_q = min(_pick_blk_q(lp), 512)
    group = max(1, _pick_group(lp, dp, blk_q, jnp.dtype(q.dtype).itemsize) // 2)
    n_pad = _round_up(n, group)

    qr = apply_rope(q, theta).astype(q.dtype) if rope else q
    kr = apply_rope(k, theta).astype(k.dtype) if rope else k

    def prep(x, pre_scale=1.0):
        x = x.reshape(n, L, D)
        if pre_scale != 1.0:
            x = x * jnp.asarray(pre_scale, x.dtype)
        x = jnp.swapaxes(x, -1, -2)
        return jnp.pad(x, ((0, n_pad - n), (0, dp - D), (0, lp - L)))

    qp, kp, vp, gp = prep(qr, scale), prep(kr), prep(v), prep(g)
    spec = pl.BlockSpec((group, dp, lp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((n_pad, dp, lp), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, l_actual=L, blk_q=blk_q, group=group),
        grid=(n_pad // group,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(oshape, oshape, oshape),
    )(qp, kp, vp, gp)

    def post(x, post_scale=1.0):
        x = jnp.swapaxes(x[:n, :D, :L], -1, -2).reshape(*lead, L, D)
        if post_scale != 1.0:
            x = x * jnp.asarray(post_scale, x.dtype)
        return x

    dq = post(dq, scale)
    dk = post(dk)
    dv = post(dv)
    if rope:  # back-rotate the q/k cotangents (orthogonal transpose)
        dq = apply_rope(dq, theta, inverse=True).astype(q.dtype)
        dk = apply_rope(dk, theta, inverse=True).astype(k.dtype)
    return dq, dk, dv


def _flash_bwd(rope, theta, residuals, g):
    q, k, v = residuals
    try:
        return _flash_backward_pallas(q, k, v, g, rope, theta)
    except Exception as e:
        from . import warn_fallback
        warn_fallback("flash_attention.bwd", e)
        from ..attention import _chunked_attention
        from ..rope import apply_rope

        def ref(a, b, c):
            if rope:
                a = apply_rope(a, theta).astype(a.dtype)
                b = apply_rope(b, theta).astype(b.dtype)
            return _chunked_attention(a, b, c, _BWD_MAX_SCORE_BYTES)

        _, vjp = jax.vjp(ref, q, k, v)
        return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
