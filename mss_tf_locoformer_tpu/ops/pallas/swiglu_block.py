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

from .swiglu_ffn import (LANE, SUBLANE, _VMEM_TARGET, _round_up, supports)

__all__ = ["fused_norm_ffn_residual", "supports"]

_OUTER_SEED_OFFSET = 0x5bd1e995  # decorrelates the two dropout sites
IT = 128   # inner-channel tile width (backward tiles the wide [L, inner]
#            intermediates over it; the dropout mask is generated per tile
#            in BOTH directions so the replay is partition-independent)
_BWD_VMEM_TARGET = 13 * 1024 * 1024  # scoped limit is 16 MiB; est runs low


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


def _bwd_fixed_bytes(lp: int, cp: int, ip: int, k: int,
                     itemsize: int = 2) -> int:
    """Group-independent live bytes of the IT-tiled backward kernel.  The
    wide intermediates are [lp, IT] per tile (bf16 rows: ~26 B/elem across
    the fp32 values + bf16 casts; fp32 rows measured 45 B/elem — the
    compiler found 17.76 MiB total at lp 1056 / ip 384 / k 4 / group 1
    fp32, which this calibration reproduces); full-length buffers are all
    [lp, cp]."""
    inter = (26 if itemsize == 2 else 45) * lp * IT
    inter += 7 * lp * cp * 4                # x32/xn(+cast)/dz/dxn/t_grp/rolls
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
        return (_bwd_fixed_bytes(lp, cp, ip, k, itemsize) + io_row
                < _BWD_VMEM_TARGET)
    io_row = 2 * 2 * lp * cp * itemsize
    fwd_fixed = 5 * lp * ip * 4 + 3 * k * cp * ip * itemsize
    return fwd_fixed + io_row < _VMEM_TARGET


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
        budget = (_VMEM_TARGET - 5 * lp * ip * 4
                  - 3 * k * cp * ip * itemsize - extra)
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


def _blk_kernel(x_ref, gamma_ref, bd_ref, wv_ref, wg_ref, wd_ref, bv_ref,
                bg_ref, db_ref, seed_ref, o_ref, *, k: int, s2: int,
                group: int, dpg: int, eps: float, drop_rate: float):
    lp = x_ref.shape[1]
    dt = wv_ref.dtype
    diff_ks = k - 1
    l1 = s2 + diff_ks
    for gi in range(group):
        x32 = x_ref[gi].astype(jnp.float32)           # [Lp, Cp]
        row_c = jax.lax.broadcasted_iota(jnp.int32, x32.shape, 0)
        x32 = jnp.where(row_c < s2, x32, 0.0)
        xn, _, _ = _norm_fwd(x32, bd_ref, gamma_ref, dpg, eps)

        yv = bv_ref[...].astype(jnp.float32)
        yg = bg_ref[...].astype(jnp.float32)
        for j in range(k):
            sh = diff_ks - j                          # down-roll
            xs = pltpu.roll(xn, sh, 0) if sh else xn
            yv = yv + jax.lax.dot(xs.astype(dt), wv_ref[j],
                                  preferred_element_type=jnp.float32)
            yg = yg + jax.lax.dot(xs.astype(dt), wg_ref[j],
                                  preferred_element_type=jnp.float32)
        gate = yv * jax.nn.sigmoid(yg) * yg
        row_i = jax.lax.broadcasted_iota(jnp.int32, gate.shape, 0)
        gate = jnp.where(row_i < l1, gate, 0.0)
        if drop_rate > 0.0:  # inner (pre-deconv) dropout, IT-tiled mask
            keep = _inner_keep(seed_ref, group, gi, gate.shape, drop_rate)
            gate = jnp.where(keep, gate * (1.0 / (1.0 - drop_rate)), 0.0)
        gate = gate.astype(dt)

        z = None
        for j in range(k):
            t = jax.lax.dot(gate, wd_ref[j], preferred_element_type=jnp.float32)
            if j:
                t = pltpu.roll(t, lp - j, 0)          # up-roll (crop folded in)
            z = t if z is None else z + t
        z = z + db_ref[...].astype(jnp.float32)
        if drop_rate > 0.0:  # outer (post-crop) dropout
            pltpu.prng_seed(seed_ref[0] ^ _OUTER_SEED_OFFSET,
                            pl.program_id(0) * group + gi)
            bits = jax.lax.bitwise_and(
                pltpu.prng_random_bits(z.shape).astype(jnp.int32),
                jnp.int32(0x7FFFFFFF))
            keep2 = bits < jnp.int32(int((1.0 - drop_rate) * (1 << 31)))
            z = jnp.where(keep2, z * (1.0 / (1.0 - drop_rate)), 0.0)
        o_ref[gi] = (x32 + z).astype(o_ref.dtype)


def _panels(conv_w, conv_b, deconv_w, deconv_b, c, inner, k, cp, ip, dt):
    f32 = jnp.float32

    def conv_panel(half):
        w = conv_w[half * inner:(half + 1) * inner]
        p = jnp.zeros((k, cp, ip), f32)
        p = p.at[:, :c, :inner].set(jnp.transpose(w, (2, 1, 0)).astype(f32))
        return p.astype(dt)

    wv, wg = conv_panel(0), conv_panel(1)
    bv = jnp.zeros((1, ip), f32).at[0, :inner].set(
        conv_b[:inner].astype(f32)).astype(dt)
    bg = jnp.zeros((1, ip), f32).at[0, :inner].set(
        conv_b[inner:].astype(f32)).astype(dt)
    wd = jnp.zeros((k, ip, cp), f32)
    wd = wd.at[:, :inner, :c].set(
        jnp.transpose(deconv_w, (2, 0, 1))[::-1].astype(f32)).astype(dt)
    db = jnp.zeros((1, cp), f32).at[0, :c].set(deconv_b.astype(f32))
    return wv, wg, wd, bv, bg, db


def _blockdiag(c, cp, num_groups):
    group_of = np.full(cp, -1)
    group_of[:c] = np.arange(c) // (c // num_groups)
    bd = (group_of[:, None] == group_of[None, :]) & (group_of[:, None] >= 0)
    return jnp.asarray(bd.astype(np.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_norm_ffn_residual(x, gamma, conv_w, conv_b, deconv_w, deconv_b,
                            kernel: int, num_groups: int, eps: float,
                            drop_rate: float = 0.0, seed=None):
    """x ``[R, S2, C]`` -> ``x + dropout(FFN(RMSGroupNorm(x)))`` ``[R, S2, C]``.

    gamma ``[C]`` is the pre-norm scale (RMSGroupNorm, ``x/(rms+eps)*gamma``
    quirk included); weights in torch layouts as in ``swiglu_conv_deconv``.
    """
    return _blk_forward(x, gamma, conv_w, conv_b, deconv_w, deconv_b,
                        kernel, num_groups, eps, drop_rate, seed)


def _blk_forward(x, gamma, conv_w, conv_b, deconv_w, deconv_b, kernel,
                 num_groups, eps, drop_rate, seed):
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
    wv, wg, wd, bv, bg, db = _panels(conv_w, conv_b, deconv_w, deconv_b,
                                     c, inner, k, cp, ip, x.dtype)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)

    row = lambda: pl.BlockSpec((group, lp, cp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_blk_kernel, k=k, s2=s2, group=group,
                          dpg=c // num_groups, eps=float(eps),
                          drop_rate=float(drop_rate)),
        grid=(rp // group,),
        in_specs=[row(), const((1, cp)), const((cp, cp)),
                  const((k, cp, ip)), const((k, cp, ip)), const((k, ip, cp)),
                  const((1, ip)), const((1, ip)), const((1, cp)),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=row(),
        out_shape=jax.ShapeDtypeStruct((rp, lp, cp), x.dtype),
    )(xp, gp, bd, wv, wg, wd, bv, bg, db, seed)
    return out[:r, :s2, :c]


def _blk_bwd_kernel(x_ref, gamma_ref, bd_ref, wv_ref, wg_ref, wd_ref,
                    bv_ref, bg_ref, seed_ref, g_ref,
                    dx_ref, dgamma_ref, dwv_ref, dwg_ref, dwd_ref,
                    dbv_ref, dbg_ref, ddb_ref, *, k: int, s2: int,
                    group: int, dpg: int, eps: float, drop_rate: float):
    """IT-tiled backward: the wide ``[Lp, inner]`` intermediates (the VMEM
    hog that gated freq-path training shapes out in round 2) are processed
    in IT-wide channel tiles.  No halos: the SwiGLU gate couples channels
    only pointwise, so every tile's recompute/adjoint is self-contained;
    only the narrow ``[Lp, Cp]`` buffers (x, dz, dxn) stay full-length."""
    lp = x_ref.shape[1]
    ipp = wv_ref.shape[2]
    dt = wv_ref.dtype
    diff_ks = k - 1
    l1 = s2 + diff_ks

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dgamma_ref, dwv_ref, dwg_ref, dwd_ref, dbv_ref,
                    dbg_ref, ddb_ref):
            ref[...] = jnp.zeros_like(ref)

    for gi in range(group):
        x32 = x_ref[gi].astype(jnp.float32)
        row_c = jax.lax.broadcasted_iota(jnp.int32, x32.shape, 0)
        live_x = row_c < s2
        x32 = jnp.where(live_x, x32, 0.0)
        xn, inv, rms = _norm_fwd(x32, bd_ref, gamma_ref, dpg, eps)

        dz = jnp.where(live_x, g_ref[gi].astype(jnp.float32), 0.0)
        if drop_rate > 0.0:  # replay outer mask
            pltpu.prng_seed(seed_ref[0] ^ _OUTER_SEED_OFFSET,
                            pl.program_id(0) * group + gi)
            bits = jax.lax.bitwise_and(
                pltpu.prng_random_bits(dz.shape).astype(jnp.int32),
                jnp.int32(0x7FFFFFFF))
            keep2 = bits < jnp.int32(int((1.0 - drop_rate) * (1 << 31)))
            dz = jnp.where(keep2, dz * (1.0 / (1.0 - drop_rate)), 0.0)
        ddb_ref[...] += jnp.sum(dz, axis=0, keepdims=True)

        live_h = (jax.lax.broadcasted_iota(jnp.int32, (lp, IT), 0) < l1)
        dxn = jnp.zeros((lp, x32.shape[1]), jnp.float32)
        for t in range(ipp // IT):
            sl = slice(t * IT, (t + 1) * IT)
            # recompute conv + gate for this channel tile (rolls recomputed
            # rather than stashed per tap — k live [Lp, Cp] copies cost
            # ~2 MiB of scoped VMEM, measured in round 2).  Biases arrive
            # TILED [nt, 1, IT]: a [1, IT] slice of a [1, ip] row at lane
            # offset t*IT cannot legally broadcast over sublanes (Mosaic
            # "Invalid input layout" — broadcasts need lane offset 0)
            yv = bv_ref[t].astype(jnp.float32)
            yg = bg_ref[t].astype(jnp.float32)
            for j in range(k):
                sh = diff_ks - j
                xs = (pltpu.roll(xn, sh, 0) if sh else xn).astype(dt)
                yv = yv + jax.lax.dot(xs, wv_ref[j, :, sl],
                                      preferred_element_type=jnp.float32)
                yg = yg + jax.lax.dot(xs, wg_ref[j, :, sl],
                                      preferred_element_type=jnp.float32)

            # deconv adjoint for this tile: dh = sum_j roll(dz, +j) @ wd_j^T
            dh = None
            for j in range(k):
                dzr = (pltpu.roll(dz, j, 0) if j else dz).astype(dt)
                tt = jax.lax.dot_general(
                    dzr, wd_ref[j, sl, :], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dh = tt if dh is None else dh + tt
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

            # conv adjoint: dxn += sum_j roll(dyv Wv_j^T + dyg Wg_j^T, up)
            for j in range(k):
                tt = jax.lax.dot_general(
                    dyv_c, wv_ref[j, :, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                tt = tt + jax.lax.dot_general(
                    dyg_c, wg_ref[j, :, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                sh = diff_ks - j
                if sh:
                    tt = pltpu.roll(tt, lp - sh, 0)
                dxn = dxn + tt

            # weight/bias grads for this tile
            for j in range(k):
                sh = diff_ks - j
                xs = (pltpu.roll(xn, sh, 0) if sh else xn).astype(dt)
                dzr = (pltpu.roll(dz, j, 0) if j else dz).astype(dt)
                dwv_ref[j, :, sl] += jax.lax.dot_general(
                    xs, dyv_c, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dwg_ref[j, :, sl] += jax.lax.dot_general(
                    xs, dyg_c, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dwd_ref[j, sl, :] += jax.lax.dot_general(
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
        dx_ref[gi] = (dx32 + jnp.where(live_x,
                                       g_ref[gi].astype(jnp.float32), 0.0)
                      ).astype(dx_ref.dtype)


def _blk_backward(x, gamma, conv_w, conv_b, deconv_w, deconv_b, kernel,
                  num_groups, eps, drop_rate, seed, g):
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
    wv, wg, wd, bv, bg, _ = _panels(conv_w, conv_b, deconv_w, deconv_b,
                                    c, inner, k, cp, ip, x.dtype)
    nt = ip // IT
    bv_t = bv.reshape(nt, 1, IT)  # lane-offset-0 tiles (see kernel comment)
    bg_t = bg.reshape(nt, 1, IT)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)

    f32 = jnp.float32
    row = lambda: pl.BlockSpec((group, lp, cp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_blk_bwd_kernel, k=k, s2=s2, group=group,
                          dpg=c // num_groups, eps=float(eps),
                          drop_rate=float(drop_rate)),
        grid=(rp // group,),
        in_specs=[row(), const((1, cp)), const((cp, cp)),
                  const((k, cp, ip)), const((k, cp, ip)), const((k, ip, cp)),
                  const((nt, 1, IT)), const((nt, 1, IT)),
                  pl.BlockSpec(memory_space=pltpu.SMEM), row()],
        out_specs=(row(), const((1, cp)), const((k, cp, ip)),
                   const((k, cp, ip)), const((k, ip, cp)),
                   const((nt, 1, IT)), const((nt, 1, IT)), const((1, cp))),
        out_shape=(
            jax.ShapeDtypeStruct((rp, lp, cp), x.dtype),
            jax.ShapeDtypeStruct((1, cp), f32),
            jax.ShapeDtypeStruct((k, cp, ip), f32),
            jax.ShapeDtypeStruct((k, cp, ip), f32),
            jax.ShapeDtypeStruct((k, ip, cp), f32),
            jax.ShapeDtypeStruct((nt, 1, IT), f32),
            jax.ShapeDtypeStruct((nt, 1, IT), f32),
            jax.ShapeDtypeStruct((1, cp), f32),
        ),
    )(xp, gmp, bd, wv, wg, wd, bv_t, bg_t, seed, gpad)
    dx, dgm, dwv, dwg, dwd, dbv, dbg, ddb = outs
    dbv = dbv.reshape(1, ip)
    dbg = dbg.reshape(1, ip)

    dx = dx[:r, :s2, :c].astype(x.dtype)
    dgamma = dgm[0, :c].astype(gamma.dtype)
    dconv_w = jnp.concatenate([
        jnp.transpose(dwv[:, :c, :inner], (2, 1, 0)),
        jnp.transpose(dwg[:, :c, :inner], (2, 1, 0)),
    ], axis=0).astype(conv_w.dtype)
    ddeconv_w = jnp.transpose(dwd[::-1, :inner, :c],
                              (1, 2, 0)).astype(deconv_w.dtype)
    dconv_b = jnp.concatenate([dbv[0, :inner], dbg[0, :inner]]
                              ).astype(conv_b.dtype)
    ddeconv_b = ddb[0, :c].astype(deconv_b.dtype)
    return dx, dgamma, dconv_w, dconv_b, ddeconv_w, ddeconv_b


def _blk_fwd(x, gamma, conv_w, conv_b, deconv_w, deconv_b, kernel,
             num_groups, eps, drop_rate, seed=None):
    out = _blk_forward(x, gamma, conv_w, conv_b, deconv_w, deconv_b,
                       kernel, num_groups, eps, drop_rate, seed)
    return out, (x, gamma, conv_w, conv_b, deconv_w, deconv_b, seed)


def _blk_bwd(kernel, num_groups, eps, drop_rate, res, g):
    x, gamma, conv_w, conv_b, deconv_w, deconv_b, seed = res
    try:
        grads = _blk_backward(x, gamma, conv_w, conv_b, deconv_w, deconv_b,
                              kernel, num_groups, eps, drop_rate, seed, g)
    except Exception as e:
        if drop_rate > 0.0:
            raise  # the unfused fallback cannot replay the in-kernel mask
        from . import warn_fallback
        warn_fallback("swiglu_block.bwd", e)
        # deterministic forward differentiated at a shape whose backward
        # kernel exceeds scoped VMEM: recompute through the unfused math
        _, vjp = jax.vjp(
            lambda *a: reference_norm_ffn_residual(*a, kernel, num_groups,
                                                   eps),
            x, gamma, conv_w, conv_b, deconv_w, deconv_b)
        grads = vjp(g)
    if seed is None:
        d_seed = (None,)
    else:
        d_seed = (np.zeros(jnp.shape(seed), jax.dtypes.float0),)
    return tuple(grads) + d_seed


fused_norm_ffn_residual.defvjp(_blk_fwd, _blk_bwd)


def reference_norm_ffn_residual(x, gamma, conv_w, conv_b, deconv_w, deconv_b,
                                kernel, num_groups, eps):
    """Unfused jnp math (parity oracle; dropout-free)."""
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
    return x + z[:, diff_ks:diff_ks + x.shape[1], :]
