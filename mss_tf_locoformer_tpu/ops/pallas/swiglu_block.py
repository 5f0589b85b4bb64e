"""Fully fused macaron FFN step: ``x + dropout(FFN(RMSGroupNorm(x)))``.

One Pallas kernel per step instead of norm / pad / conv-gate-deconv / crop /
dropout / residual as separate XLA ops.  The fp32 norm island, the
``diff_ks`` zero-padding, both reference dropout sites
(``models/mss_tflocoformer.py:649,653``) and the residual add all happen on
rows already resident in VMEM — each of the 16 FFN steps per forward pass
touches HBM exactly twice (read x, write out) instead of ~6 times.

Applies for ``conv1d_shift == 1`` (every shipped config) with
``rmsgroupnorm`` pre-norm.  The backward kernel recomputes norm+conv+gate in
VMEM (no stash), replays both dropout masks from the absolute-row-seeded
PRNG, and accumulates all weight/bias/gamma grads across the sequential TPU
grid.  Index mechanics (shift=1, ``diff_ks = k-1``):

  conv:   y[l'] = sum_j xnorm[l' + j - diff_ks] @ Wj   (down-rolls)
  deconv + crop: out[l'] = sum_j (h @ Wd_j)[l' + j]    (up-rolls)

so the lead/tail padding never materializes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .swiglu_ffn import (LANE, SUBLANE, _VMEM_TARGET, _panels, _round_up,
                         supports)

__all__ = ["fused_norm_ffn_residual", "supports"]

_OUTER_SEED_OFFSET = 0x5bd1e995  # decorrelates the two dropout sites
IT = 128   # inner-channel tile width (backward tiles the wide [L, inner]
#            intermediates over it; the dropout mask is generated per tile
#            in BOTH directions so the replay is partition-independent)
_BWD_VMEM_TARGET = 13 * 1024 * 1024  # scoped limit is 16 MiB; est runs low
# bf16 admission ceiling for the backward ESTIMATE, calibrated on v5e: the
# base-config freq path (lp 1056 / ip 384 / k 4, estimate 17.2 MiB) COMPILES
# and runs at group 1 — the estimate over-counts buffers Mosaic reuses.
# fp32 keeps the conservative 13 MiB target (the freq-path fp32 backward
# was measured to exceed the real scoped limit in round 2 AND with the
# round-3 tap-concatenated kernel).
_BWD_VMEM_BF16_CEIL = int(17.4 * 1024 * 1024)
# fwd-step admission ceiling: the base freq forward (estimate ~11.2 MiB
# incl. the tap-concatenated buffers) compiles and runs; calibrated with
# ~1 MiB headroom over that point.
_FWD_STEP_TARGET = int(12.5 * 1024 * 1024)


_TILE_SEED_STRIDE = 0x9E3779B9  # golden-ratio mix folds the tile index into
#                                 the seed WORD: this backend's Mosaic rejects
#                                 prng_seed with >2 values ("Setting seed with
#                                 more than 2 values is not supported")


def _tile_keep(seed_ref, group: int, gi: int, shape, t_idx: int, rate: float):
    """Inner-site keep mask for IT-wide channel tile ``t_idx`` (counter
    PRNG seeded by (seed mixed with tile, absolute row) — forward and
    backward generate identical tiles regardless of their own loop
    structure)."""
    row_idx = pl.program_id(0) * group + gi
    mix = ((t_idx + 1) * _TILE_SEED_STRIDE) & 0xFFFFFFFF  # trace-time int32
    mix = mix - (1 << 32) if mix >= (1 << 31) else mix
    pltpu.prng_seed(seed_ref[0] + jnp.int32(mix), row_idx)
    bits = jax.lax.bitwise_and(
        pltpu.prng_random_bits(shape).astype(jnp.int32),
        jnp.int32(0x7FFFFFFF))
    return bits < jnp.int32(int((1.0 - rate) * (1 << 31)))


def _inner_keep(seed_ref, group: int, gi: int, shape, rate: float):
    """Full-width inner keep mask assembled from IT-wide tiles."""
    lp, ipp = shape
    tiles = [_tile_keep(seed_ref, group, gi, (lp, IT), t, rate)
             for t in range(ipp // IT)]
    return tiles[0] if len(tiles) == 1 else jnp.concatenate(tiles, axis=1)


def _fwd_fixed_bytes(lp: int, cp: int, ip: int, k: int,
                     itemsize: int = 2) -> int:
    """Group-independent live-byte estimate of the forward step kernel:
    the yvg/gate intermediates, the tap-concatenated input and deconv
    product, and the weight panels."""
    return (lp * 2 * ip * 4               # yvg (fp32)
            + lp * ip * (4 + itemsize)    # gate (fp32 + cast)
            + lp * k * cp * (itemsize + 4)  # xs_cat + zc
            + 3 * k * cp * ip * itemsize)   # panels


def _bwd_fixed_bytes(lp: int, cp: int, ip: int, k: int,
                     itemsize: int = 2) -> int:
    """Group-independent live-byte ESTIMATE of the IT-tiled backward
    kernel (the wide intermediates are [lp, IT] per tile; full-length
    buffers are [lp, cp]-class plus the tap-concatenated [lp, k*cp]
    trio).  The estimate deliberately over-counts — Mosaic's scoped
    accounting reuses dead buffers — so the admission thresholds in
    :func:`supports_step` are CALIBRATED against compiled shapes rather
    than derived (see the constants' comments)."""
    inter = (26 if itemsize == 2 else 45) * lp * IT
    inter += 7 * lp * cp * 4                # x32/xn(+cast)/dz/dxn/t_grp/rolls
    inter += lp * k * cp * (2 * itemsize + 4)  # xs_cat + dzr_cat + dxc
    w_bytes = 3 * k * cp * ip * itemsize + 3 * k * cp * ip * 4  # panels+accum
    return inter + w_bytes


def supports_step(s2: int, c: int, inner: int, k: int,
                  bwd: bool = True, itemsize: int = 2) -> bool:
    """Whether the fused norm+FFN+residual kernel fits the 16 MiB
    scoped-VMEM limit at this shape.  ``bwd=True`` additionally requires
    the backward kernel to fit (training); inference-only callers pass
    ``bwd=False``.  ``itemsize`` is the row dtype width — the fused
    backward fits freq-path training shapes in the production bf16 but NOT
    in fp32 (measured; fp32 training routes to norm + the plain fused FFN
    kernel).  The round-3 IT-tiled backward admits the bf16 freq-path
    training shape (lp 1056 x inner 384) that round 2 had to gate out."""
    lp = _round_up(s2, SUBLANE) + SUBLANE
    cp = _round_up(c, LANE)
    ip = _round_up(inner, LANE)
    if bwd:
        io_row = 2 * 3 * lp * cp * itemsize + 450 * 1024  # + per-row spills
        ceil = _BWD_VMEM_BF16_CEIL if itemsize == 2 else _BWD_VMEM_TARGET
        return _bwd_fixed_bytes(lp, cp, ip, k, itemsize) + io_row < ceil
    io_row = 2 * 2 * lp * cp * itemsize
    fwd_fixed = _fwd_fixed_bytes(lp, cp, ip, k, itemsize)
    return fwd_fixed + io_row < _FWD_STEP_TARGET


def _pick_group(lp: int, cp: int, ip: int, k: int, bwd: bool,
                itemsize: int = 2, extra: int = 0) -> int:
    """``itemsize`` = bytes per element of the ROW buffers (the gates in
    ``supports_step`` assume the production bf16; an fp32 caller doubles
    the double-buffered row I/O, so group picking must know — measured:
    the freq-path fp32 backward at the bf16-estimated group=4 exceeds the
    scoped-VMEM limit by 1.8 MiB).  ``extra`` = caller-known fixed bytes
    (dropout mask tiles)."""
    io_row = 2 * (3 if bwd else 2) * lp * cp * itemsize
    if bwd:
        # each unrolled row iteration leaves ~0.45 MiB of register-spill
        # stack the scoped accounting charges per iteration (measured:
        # time-path bf16 at group 18 hit 20.73 MiB vs the 13.5 MiB
        # buffer-level estimate; freq-path at group 4 fits — a constant
        # per-row leftover reproduces both)
        io_row += 450 * 1024
        budget = (_BWD_VMEM_TARGET
                  - _bwd_fixed_bytes(lp, cp, ip, k, itemsize) - extra)
    else:
        budget = (_FWD_STEP_TARGET - _fwd_fixed_bytes(lp, cp, ip, k, itemsize)
                  - extra)
    g = max(1, budget // io_row)
    return int(min(g, 32))


def _norm_fwd(x32, bd_ref, gamma_ref, dpg: int, eps: float):
    """fp32 RMSGroupNorm via the block-diagonal matmul (lane-width ops)."""
    sq = jax.lax.dot_general(x32 * x32, bd_ref[...],
                             (((x32.ndim - 1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    rms = jnp.sqrt(sq) * (dpg ** -0.5)
    inv = 1.0 / (rms + eps)
    return x32 * inv * gamma_ref[...], inv, rms


def _xs_cat_down(xn, k: int, dt):
    """Tap-concatenated normed input ``[Lp, k*Cp]``: lane block j holds the
    DOWN-rolled ``roll(xn, diff_ks - j)`` so the k shifted conv matmuls run
    as ONE k*Cp-deep MXU contraction (tap accumulation inside the MXU
    instead of k VPU adds over wide fp32 intermediates)."""
    diff_ks = k - 1
    subs = [pltpu.roll(xn, diff_ks - j, 0) if j != diff_ks else xn
            for j in range(k)]
    return jnp.concatenate(subs, axis=1).astype(dt)


def _dz_cat_down(dz, k: int, dt):
    """Tap-concatenated output cotangent ``[Lp, k*Cp]``: lane block j holds
    ``roll(dz, +j)`` (the deconv adjoint's shift)."""
    subs = [pltpu.roll(dz, j, 0) if j else dz for j in range(k)]
    return jnp.concatenate(subs, axis=1).astype(dt)


def _blk_kernel(x_ref, gamma_ref, bd_ref, wvg_ref, wdc_ref, bvg_ref,
                db_ref, seed_ref, o_ref, *, k: int, s2: int, ip: int,
                group: int, dpg: int, eps: float, drop_rate: float,
                residual: bool = True):
    lp = x_ref.shape[1]
    dt = wvg_ref.dtype
    cp = x_ref.shape[-1]
    diff_ks = k - 1
    l1 = s2 + diff_ks
    for gi in range(group):
        x32 = x_ref[gi].astype(jnp.float32)           # [Lp, Cp]
        row_c = jax.lax.broadcasted_iota(jnp.int32, x32.shape, 0)
        x32 = jnp.where(row_c < s2, x32, 0.0)
        xn, _, _ = _norm_fwd(x32, bd_ref, gamma_ref, dpg, eps)

        yvg = bvg_ref[...].astype(jnp.float32) + jax.lax.dot(
            _xs_cat_down(xn, k, dt), wvg_ref[...],
            preferred_element_type=jnp.float32)       # [Lp, 2*Ip]
        yv, yg = yvg[:, :ip], yvg[:, ip:]
        gate = yv * jax.nn.sigmoid(yg) * yg
        row_i = jax.lax.broadcasted_iota(jnp.int32, gate.shape, 0)
        gate = jnp.where(row_i < l1, gate, 0.0)
        if drop_rate > 0.0:  # inner (pre-deconv) dropout, IT-tiled mask
            keep = _inner_keep(seed_ref, group, gi, gate.shape, drop_rate)
            gate = jnp.where(keep, gate * (1.0 / (1.0 - drop_rate)), 0.0)
        gate = gate.astype(dt)

        # all k deconv taps in one matmul; up-rolls (crop folded in) on the
        # narrow [Lp, Cp] lane blocks of the product
        zc = jax.lax.dot(gate, wdc_ref[...],
                         preferred_element_type=jnp.float32)  # [Lp, k*Cp]
        z = None
        for j in range(k):
            t = zc[:, j * cp:(j + 1) * cp]
            if j:
                t = pltpu.roll(t, lp - j, 0)
            z = t if z is None else z + t
        z = z + db_ref[...].astype(jnp.float32)
        if not residual:
            # TP partial sum over the mp-sharded inner dim: the outer
            # dropout site and the residual add happen after the psum,
            # outside (``parallel/tp_fused.py``; the caller passes a zero
            # deconv bias and adds the real one post-psum)
            o_ref[gi] = z.astype(o_ref.dtype)
            continue
        if drop_rate > 0.0:  # outer (post-crop) dropout
            pltpu.prng_seed(seed_ref[0] ^ _OUTER_SEED_OFFSET,
                            pl.program_id(0) * group + gi)
            bits = jax.lax.bitwise_and(
                pltpu.prng_random_bits(z.shape).astype(jnp.int32),
                jnp.int32(0x7FFFFFFF))
            keep2 = bits < jnp.int32(int((1.0 - drop_rate) * (1 << 31)))
            z = jnp.where(keep2, z * (1.0 / (1.0 - drop_rate)), 0.0)
        o_ref[gi] = (x32 + z).astype(o_ref.dtype)


def _blk_panels(conv_w, conv_b, deconv_w, deconv_b, c, inner, k, cp, ip, dt):
    """Tap-concatenated panels (shared layout with ``swiglu_ffn._panels``)
    plus the deconv bias row."""
    wvg, bvg, wdc = _panels(conv_w, conv_b, deconv_w, inner, c, cp, ip, k, dt)
    db = jnp.zeros((1, cp), jnp.float32).at[0, :c].set(
        deconv_b.astype(jnp.float32))
    return wvg, bvg, wdc, db


def _blockdiag(c, cp, num_groups):
    group_of = np.full(cp, -1)
    group_of[:c] = np.arange(c) // (c // num_groups)
    bd = (group_of[:, None] == group_of[None, :]) & (group_of[:, None] >= 0)
    return jnp.asarray(bd.astype(np.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 11))
def fused_norm_ffn_residual(x, gamma, conv_w, conv_b, deconv_w, deconv_b,
                            kernel: int, num_groups: int, eps: float,
                            drop_rate: float = 0.0, seed=None,
                            residual: bool = True):
    """x ``[R, S2, C]`` -> ``x + dropout(FFN(RMSGroupNorm(x)))`` ``[R, S2, C]``.

    gamma ``[C]`` is the pre-norm scale (RMSGroupNorm, ``x/(rms+eps)*gamma``
    quirk included); weights in torch layouts as in ``swiglu_conv_deconv``.

    ``residual=False`` is the tensor-parallel mode (``parallel/tp_fused.py``):
    the call computes only ``deconv(dropout_inner(SwiGLU(conv(norm(x)))))``
    for ITS slice of the mp-sharded inner dim — a partial sum — so the
    caller psums over mp, adds the (excluded) deconv bias, and applies the
    outer dropout site and residual itself.  The inner (pre-deconv) dropout
    site still runs in-kernel (it is per-inner-channel).
    """
    return _blk_forward(x, gamma, conv_w, conv_b, deconv_w, deconv_b,
                        kernel, num_groups, eps, drop_rate, seed, residual)


def _blk_forward(x, gamma, conv_w, conv_b, deconv_w, deconv_b, kernel,
                 num_groups, eps, drop_rate, seed, residual=True):
    r, s2, c = x.shape
    inner = deconv_w.shape[0]
    k = kernel
    cp = _round_up(c, LANE)
    ip = _round_up(inner, LANE)
    lp = _round_up(s2, SUBLANE) + SUBLANE
    group = _pick_group(lp, cp, ip, k, bwd=False,
                        itemsize=jnp.dtype(x.dtype).itemsize,
                        extra=(lp * IT * 8 if drop_rate > 0.0 else 0))
    rp = _round_up(r, group)
    xp = jnp.pad(x, ((0, rp - r), (0, lp - s2), (0, cp - c)))
    gp = jnp.zeros((1, cp), jnp.float32).at[0, :c].set(
        gamma.astype(jnp.float32))
    bd = _blockdiag(c, cp, num_groups)
    wvg, bvg, wdc, db = _blk_panels(conv_w, conv_b, deconv_w, deconv_b,
                                    c, inner, k, cp, ip, x.dtype)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)

    row = lambda: pl.BlockSpec((group, lp, cp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_blk_kernel, k=k, s2=s2, ip=ip, group=group,
                          dpg=c // num_groups, eps=float(eps),
                          drop_rate=float(drop_rate), residual=residual),
        grid=(rp // group,),
        in_specs=[row(), const((1, cp)), const((cp, cp)),
                  const((k * cp, 2 * ip)), const((ip, k * cp)),
                  const((1, 2 * ip)), const((1, cp)),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=row(),
        out_shape=jax.ShapeDtypeStruct((rp, lp, cp), x.dtype),
    )(xp, gp, bd, wvg, wdc, bvg, db, seed)
    return out[:r, :s2, :c]


def _blk_bwd_kernel(x_ref, gamma_ref, bd_ref, wvg_ref, wdc_ref,
                    bv_ref, bg_ref, seed_ref, g_ref,
                    dx_ref, dgamma_ref, dwvg_ref, dwdc_ref,
                    dbv_ref, dbg_ref, ddb_ref, *, k: int, s2: int, ip: int,
                    group: int, dpg: int, eps: float, drop_rate: float,
                    residual: bool = True):
    """IT-tiled backward: the wide ``[Lp, inner]`` intermediates (the VMEM
    hog that gated freq-path training shapes out in round 2) are processed
    in IT-wide channel tiles.  No halos: the SwiGLU gate couples channels
    only pointwise, so every tile's recompute/adjoint is self-contained;
    only the narrow ``[Lp, Cp]``-class buffers (x, dz, dxn and the
    tap-concatenated ``[Lp, k*Cp]`` inputs) stay full-length.  All per-tap
    matmuls run tap-CONCATENATED: the rolled copies of xn and dz are built
    ONCE per row (not per tile per tap), conv/deconv taps contract in one
    k*Cp-deep MXU pass, and the conv-adjoint blocks are up-rolled into the
    ``[Lp, Cp]`` dxn accumulator per tile (the transient ``[Lp, k*Cp]``
    product is tile-local — a persistent accumulator of that width pushed
    the freq training shape 242 KiB past the scoped-VMEM limit)."""
    lp = x_ref.shape[1]
    dt = wvg_ref.dtype
    cp = x_ref.shape[-1]
    diff_ks = k - 1
    l1 = s2 + diff_ks

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dgamma_ref, dwvg_ref, dwdc_ref, dbv_ref,
                    dbg_ref, ddb_ref):
            ref[...] = jnp.zeros_like(ref)

    for gi in range(group):
        x32 = x_ref[gi].astype(jnp.float32)
        row_c = jax.lax.broadcasted_iota(jnp.int32, x32.shape, 0)
        live_x = row_c < s2
        x32 = jnp.where(live_x, x32, 0.0)
        xn, inv, rms = _norm_fwd(x32, bd_ref, gamma_ref, dpg, eps)

        dz = jnp.where(live_x, g_ref[gi].astype(jnp.float32), 0.0)
        # the outer dropout site only exists in residual mode (the TP
        # caller applies it after the psum; its cotangent is already
        # masked by XLA's AD by the time g arrives here)
        if drop_rate > 0.0 and residual:  # replay outer mask
            pltpu.prng_seed(seed_ref[0] ^ _OUTER_SEED_OFFSET,
                            pl.program_id(0) * group + gi)
            bits = jax.lax.bitwise_and(
                pltpu.prng_random_bits(dz.shape).astype(jnp.int32),
                jnp.int32(0x7FFFFFFF))
            keep2 = bits < jnp.int32(int((1.0 - drop_rate) * (1 << 31)))
            dz = jnp.where(keep2, dz * (1.0 / (1.0 - drop_rate)), 0.0)
        ddb_ref[...] += jnp.sum(dz, axis=0, keepdims=True)

        xs = _xs_cat_down(xn, k, dt)                    # [Lp, k*Cp]
        dzr = _dz_cat_down(dz, k, dt)                   # [Lp, k*Cp]

        live_h = (jax.lax.broadcasted_iota(jnp.int32, (lp, IT), 0) < l1)
        dxn = jnp.zeros((lp, cp), jnp.float32)
        for t in range(ip // IT):
            vsl = slice(t * IT, (t + 1) * IT)
            gsl = slice(ip + t * IT, ip + (t + 1) * IT)
            # recompute conv + gate for this channel tile.  Biases arrive
            # TILED [nt, 1, IT]: a [1, IT] slice of a [1, ip] row at lane
            # offset t*IT cannot legally broadcast over sublanes (Mosaic
            # "Invalid input layout" — broadcasts need lane offset 0)
            yv = bv_ref[t].astype(jnp.float32) + jax.lax.dot(
                xs, wvg_ref[:, vsl], preferred_element_type=jnp.float32)
            yg = bg_ref[t].astype(jnp.float32) + jax.lax.dot(
                xs, wvg_ref[:, gsl], preferred_element_type=jnp.float32)

            # deconv adjoint for this tile: dh = sum_j roll(dz, +j) @ wd_j^T
            dh = jax.lax.dot_general(
                dzr, wdc_ref[vsl, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [Lp, IT]
            dh = jnp.where(live_h, dh, 0.0)

            sig = jax.nn.sigmoid(yg)
            silu_g = yg * sig
            gate_f = jnp.where(live_h, yv * silu_g, 0.0)
            if drop_rate > 0.0:  # replay this tile's inner mask
                keep = _tile_keep(seed_ref, group, gi, gate_f.shape, t,
                                  drop_rate)
                ikp = 1.0 / (1.0 - drop_rate)
                gate_f = jnp.where(keep, gate_f * ikp, 0.0)
                dh = jnp.where(keep, dh * ikp, 0.0)
            gate = gate_f.astype(dt)
            dyv = jnp.where(live_h, dh * silu_g, 0.0)
            dyg = jnp.where(live_h,
                            dh * yv * sig * (1.0 + yg * (1.0 - sig)), 0.0)
            dyv_c = dyv.astype(dt)
            dyg_c = dyg.astype(dt)

            # conv adjoint: one matmul over all taps, then narrow up-rolls
            # into dxn per tile (a persistent [Lp, k*Cp] fp32 accumulator
            # measured 242 KiB past the 16 MiB scoped limit at the freq
            # training shape — the [Lp, Cp] accumulator keeps the margin)
            dxc = jax.lax.dot_general(
                dyv_c, wvg_ref[:, vsl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dxc = dxc + jax.lax.dot_general(
                dyg_c, wvg_ref[:, gsl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [Lp, k*Cp]
            for j in range(k):
                tt = dxc[:, j * cp:(j + 1) * cp]
                sh = diff_ks - j
                if sh:
                    tt = pltpu.roll(tt, lp - sh, 0)
                dxn = dxn + tt

            # weight/bias grads for this tile (all taps in one matmul each)
            dwvg_ref[:, vsl] += jax.lax.dot_general(
                xs, dyv_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwvg_ref[:, gsl] += jax.lax.dot_general(
                xs, dyg_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwdc_ref[vsl, :] += jax.lax.dot_general(
                gate, dzr, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dbv_ref[t] += jnp.sum(dyv, axis=0, keepdims=True)
            dbg_ref[t] += jnp.sum(dyg, axis=0, keepdims=True)

        dxn = jnp.where(live_x, dxn, 0.0)
        # norm backward: dx = gamma*inv*dxn - x * T * inv^2 / (dpg * rms)
        dgamma_ref[...] += jnp.sum(dxn * x32 * inv, axis=0, keepdims=True)
        gdxn = dxn * gamma_ref[...]
        t_grp = jax.lax.dot_general(gdxn * x32, bd_ref[...],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        rms_safe = jnp.maximum(rms, 1e-30)
        dx32 = gdxn * inv - x32 * t_grp * inv * inv / (dpg * rms_safe)
        dx32 = jnp.where(live_x, dx32, 0.0)
        if residual:  # residual path cotangent (TP adds x outside)
            dx32 = dx32 + jnp.where(live_x,
                                    g_ref[gi].astype(jnp.float32), 0.0)
        dx_ref[gi] = dx32.astype(dx_ref.dtype)


def _blk_backward(x, gamma, conv_w, conv_b, deconv_w, deconv_b, kernel,
                  num_groups, eps, drop_rate, seed, g, residual=True):
    r, s2, c = x.shape
    inner = deconv_w.shape[0]
    k = kernel
    cp = _round_up(c, LANE)
    ip = _round_up(inner, LANE)
    lp = _round_up(s2, SUBLANE) + SUBLANE
    group = _pick_group(lp, cp, ip, k, bwd=True,
                        itemsize=jnp.dtype(x.dtype).itemsize,
                        extra=(lp * IT * 8 if drop_rate > 0.0 else 0))
    rp = _round_up(r, group)
    xp = jnp.pad(x, ((0, rp - r), (0, lp - s2), (0, cp - c)))
    gpad = jnp.pad(g.astype(x.dtype),
                   ((0, rp - r), (0, lp - s2), (0, cp - c)))
    gmp = jnp.zeros((1, cp), jnp.float32).at[0, :c].set(
        gamma.astype(jnp.float32))
    bd = _blockdiag(c, cp, num_groups)
    wvg, bvg, wdc, _ = _blk_panels(conv_w, conv_b, deconv_w, deconv_b,
                                   c, inner, k, cp, ip, x.dtype)
    nt = ip // IT
    # lane-offset-0 bias tiles (see kernel comment)
    bv_t = bvg[:, :ip].reshape(nt, 1, IT)
    bg_t = bvg[:, ip:].reshape(nt, 1, IT)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)

    f32 = jnp.float32
    row = lambda: pl.BlockSpec((group, lp, cp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_blk_bwd_kernel, k=k, s2=s2, ip=ip, group=group,
                          dpg=c // num_groups, eps=float(eps),
                          drop_rate=float(drop_rate), residual=residual),
        grid=(rp // group,),
        in_specs=[row(), const((1, cp)), const((cp, cp)),
                  const((k * cp, 2 * ip)), const((ip, k * cp)),
                  const((nt, 1, IT)), const((nt, 1, IT)),
                  pl.BlockSpec(memory_space=pltpu.SMEM), row()],
        out_specs=(row(), const((1, cp)), const((k * cp, 2 * ip)),
                   const((ip, k * cp)),
                   const((nt, 1, IT)), const((nt, 1, IT)), const((1, cp))),
        out_shape=(
            jax.ShapeDtypeStruct((rp, lp, cp), x.dtype),
            jax.ShapeDtypeStruct((1, cp), f32),
            jax.ShapeDtypeStruct((k * cp, 2 * ip), f32),
            jax.ShapeDtypeStruct((ip, k * cp), f32),
            jax.ShapeDtypeStruct((nt, 1, IT), f32),
            jax.ShapeDtypeStruct((nt, 1, IT), f32),
            jax.ShapeDtypeStruct((1, cp), f32),
        ),
    )(xp, gmp, bd, wvg, wdc, bv_t, bg_t, seed, gpad)
    dx, dgm, dwvg, dwdc, dbv, dbg, ddb = outs
    dbv = dbv.reshape(1, ip)
    dbg = dbg.reshape(1, ip)

    dx = dx[:r, :s2, :c].astype(x.dtype)
    dgamma = dgm[0, :c].astype(gamma.dtype)
    # invert the tap-concatenated panel layouts back to torch weight layouts
    dwvg = dwvg.reshape(k, cp, 2 * ip)
    dconv_w = jnp.concatenate([
        jnp.transpose(dwvg[:, :c, :inner], (2, 1, 0)),
        jnp.transpose(dwvg[:, :c, ip:ip + inner], (2, 1, 0)),
    ], axis=0).astype(conv_w.dtype)
    dwd = jnp.moveaxis(dwdc.reshape(ip, k, cp), 1, 0)   # [k, Ip, Cp]
    ddeconv_w = jnp.transpose(dwd[::-1, :inner, :c],
                              (1, 2, 0)).astype(deconv_w.dtype)
    dconv_b = jnp.concatenate([dbv[0, :inner], dbg[0, :inner]]
                              ).astype(conv_b.dtype)
    ddeconv_b = ddb[0, :c].astype(deconv_b.dtype)
    return dx, dgamma, dconv_w, dconv_b, ddeconv_w, ddeconv_b


def _blk_fwd(x, gamma, conv_w, conv_b, deconv_w, deconv_b, kernel,
             num_groups, eps, drop_rate, seed=None, residual=True):
    out = _blk_forward(x, gamma, conv_w, conv_b, deconv_w, deconv_b,
                       kernel, num_groups, eps, drop_rate, seed, residual)
    return out, (x, gamma, conv_w, conv_b, deconv_w, deconv_b, seed)


def _blk_bwd(kernel, num_groups, eps, drop_rate, residual, res, g):
    x, gamma, conv_w, conv_b, deconv_w, deconv_b, seed = res
    try:
        grads = _blk_backward(x, gamma, conv_w, conv_b, deconv_w, deconv_b,
                              kernel, num_groups, eps, drop_rate, seed, g,
                              residual)
    except Exception as e:
        if drop_rate > 0.0:
            raise  # the unfused fallback cannot replay the in-kernel mask
        from . import warn_fallback
        warn_fallback("swiglu_block.bwd", e)
        # deterministic forward differentiated at a shape whose backward
        # kernel exceeds scoped VMEM: recompute through the unfused math
        _, vjp = jax.vjp(
            lambda *a: reference_norm_ffn_residual(*a, kernel, num_groups,
                                                   eps, residual),
            x, gamma, conv_w, conv_b, deconv_w, deconv_b)
        grads = vjp(g)
    if seed is None:
        d_seed = (None,)
    else:
        d_seed = (np.zeros(jnp.shape(seed), jax.dtypes.float0),)
    return tuple(grads) + d_seed


fused_norm_ffn_residual.defvjp(_blk_fwd, _blk_bwd)


def reference_norm_ffn_residual(x, gamma, conv_w, conv_b, deconv_w, deconv_b,
                                kernel, num_groups, eps, residual=True):
    """Unfused jnp math (parity oracle; dropout-free).  ``residual=False``
    matches the TP partial-output kernel mode (no residual add; the deconv
    bias is still applied from whatever the caller passes — TP passes
    zeros)."""
    from .. import conv as conv_ops
    c = x.shape[-1]
    dpg = c // num_groups
    x32 = x.astype(jnp.float32)
    grouped = x32.reshape(x32.shape[:-1] + (num_groups, dpg))
    rms = jnp.sqrt(jnp.sum(grouped ** 2, axis=-1, keepdims=True)) * dpg ** -0.5
    xn = (grouped / (rms + eps)).reshape(x32.shape) * gamma.astype(jnp.float32)
    xn = xn.astype(x.dtype)
    diff_ks = kernel - 1
    inner = deconv_w.shape[0]
    xpad = jnp.pad(xn, ((0, 0), (diff_ks, diff_ks), (0, 0)))
    y = conv_ops.conv1d(xpad, conv_w.astype(x.dtype), conv_b.astype(x.dtype),
                        stride=1, padding=0)
    h = y[..., :inner] * jax.nn.silu(y[..., inner:])
    z = conv_ops.conv_transpose1d(h, deconv_w.astype(x.dtype),
                                  deconv_b.astype(x.dtype), stride=1,
                                  padding=0)
    z = z[:, diff_ks:diff_ks + x.shape[1], :]
    return x + z if residual else z
