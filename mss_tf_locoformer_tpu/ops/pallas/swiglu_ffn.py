"""Fused SwiGLU Conv-Deconv FFN kernel (Pallas/TPU).

The Locoformer FFN (reference ``models/mss_tflocoformer.py:603-655``) is
Conv1d(C -> 2*inner, k, s=1) -> SwiGLU gate -> ConvTranspose1d(inner -> C).
Run as separate XLA ops, the ``[rows, L, 2*inner]`` intermediate round-trips
HBM several times (~12 GB of traffic at MSS base shapes — measured 38 ms per
call on v5e against ~2.4 ms of real matmul FLOPs).  This kernel keeps the
intermediate entirely in VMEM: per grid cell it loads a tile of rows,
computes the k shifted conv matmuls, gates, runs the k shifted deconv
matmuls, and writes only the ``[rows, L, C]`` result.

Shift mechanics: both convs are stride-1, so ``conv(x)[l] = sum_j
x[l+j] @ Wj`` — expressed with ``pltpu.roll`` (sublane-aligned) instead of
misaligned slices, with rolled-in rows guaranteed zero by construction
(inputs are zero-padded by >= k-1 extra rows and gate rows beyond the conv
length are masked).

The value/gate halves of the conv weight are split into separate matmul
panels in the prep so no lane slicing at non-128 multiples happens in-kernel
(inner dims like 192 are zero-padded to a lane multiple; zero gate columns
die at ``silu(0) = 0`` and zero deconv rows contribute nothing).

Applies when ``conv1d_shift == 1`` (every shipped config); callers fall back
to the unfused path otherwise.  Backward recomputes through the unfused jnp
reference (``custom_vjp``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["swiglu_conv_deconv", "supports"]

LANE = 128
SUBLANE = 16
_VMEM_TARGET = 11 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supports(kernel: int, shift: int) -> bool:
    return shift == 1 and 1 < kernel <= 8


def _pick_group(lp: int, cp: int, ip: int, k: int,
                itemsize: int = 2) -> int:
    """Rows per program under the VMEM budget (inputs/outputs double-
    buffered; conv intermediates ~3 row-sized fp32 buffers).  ``itemsize``
    = row/panel dtype width (fp32 callers double those terms)."""
    io_row = 2 * (lp * cp * itemsize) * 2     # x + z, double-buffered
    inter = 3 * lp * ip * 4                   # yv, yg, gate (fp32)
    w_bytes = 3 * k * cp * ip * itemsize
    g = max(1, (_VMEM_TARGET - inter - w_bytes) // io_row)
    return int(min(g, 32))


def _dropout_mask(seed_ref, group: int, gi: int, shape, rate: float):
    """Counter-based keep mask, replayable bit-exact in the backward.  The
    PRNG is re-seeded per (seed, ABSOLUTE row index): forward and backward
    use different group sizes, so (program_id, gi) alone would not align."""
    row_idx = pl.program_id(0) * group + gi
    pltpu.prng_seed(seed_ref[0], row_idx)
    bits = pltpu.prng_random_bits(shape)
    bits = jax.lax.bitwise_and(bits.astype(jnp.int32),
                               jnp.int32(0x7FFFFFFF))
    return bits < jnp.int32(int((1.0 - rate) * (1 << 31)))


def _kernel(x_ref, wv_ref, wg_ref, wd_ref, bv_ref, bg_ref, seed_ref, o_ref,
            *, k: int, l1: int, group: int, drop_rate: float):
    """x [G, Lp, Cp] -> o [G, Lp, Cp]; conv panels wv/wg [k, Cp, Ip],
    deconv panels wd [k, Ip, Cp], biases bv/bg [1, Ip]."""
    lp = x_ref.shape[1]
    dt = wv_ref.dtype
    for gi in range(group):
        # Mosaic's rotate only handles 32-bit data: roll in fp32, cast at dots
        x = x_ref[gi].astype(jnp.float32)  # [Lp, Cp]
        yv = bv_ref[:].astype(jnp.float32)  # broadcasts [1, Ip] over rows
        yg = bg_ref[:].astype(jnp.float32)
        for j in range(k):
            xs = pltpu.roll(x, lp - j, 0) if j else x  # row l -> x[l+j]
            yv = yv + jax.lax.dot(xs.astype(dt), wv_ref[j],
                                  preferred_element_type=jnp.float32)
            yg = yg + jax.lax.dot(xs.astype(dt), wg_ref[j],
                                  preferred_element_type=jnp.float32)
        gate = yv * jax.nn.sigmoid(yg) * yg  # value * silu(gate)
        # zero rows >= l1 (bias/pad garbage) so the deconv rolls wrap zeros
        row = jax.lax.broadcasted_iota(jnp.int32, gate.shape, dimension=0)
        gate = jnp.where(row < l1, gate, 0.0)
        if drop_rate > 0.0:  # in-kernel dropout (reference's pre-deconv site)
            keep = _dropout_mask(seed_ref, group, gi, gate.shape, drop_rate)
            gate = jnp.where(keep, gate * (1.0 / (1.0 - drop_rate)), 0.0)
        gate = gate.astype(dt)
        z = None
        for j in range(k):
            # z[l] = sum_j gate[l - (k-1) + j] @ wd[j]; roll the narrow
            # [Lp, Cp] product, not the wide [Lp, Ip] gate (4x less VPU
            # shuffle traffic) — row rolls commute with row-wise matmuls
            shift = (k - 1) - j
            t = jax.lax.dot(gate, wd_ref[j], preferred_element_type=jnp.float32)
            if shift:
                t = pltpu.roll(t, shift, 0)
            z = t if z is None else z + t
        o_ref[gi] = z.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def swiglu_conv_deconv(x, conv_w, conv_b, deconv_w, deconv_b, kernel: int,
                       drop_rate: float = 0.0, seed=None):
    """Fused FFN core on pre-padded input.

    x ``[R, L_in, C]`` (already padded with the reference's pad arithmetic);
    conv_w ``[2*inner, C, k]`` (+bias ``[2*inner]``, value half first);
    deconv_w ``[inner, C, k]`` (torch ConvTranspose layout) + bias ``[C]``.
    Returns the full-length stride-1 deconv output ``[R, L_in, C]``
    (callers crop), equal to ``conv -> value*silu(gate) -> [dropout] ->
    conv_transpose``.  With ``drop_rate > 0`` the pre-deconv dropout
    (reference ``models/mss_tflocoformer.py:649``) runs in-kernel from the
    int32 ``seed [1]``; the backward replays the identical mask.
    """
    return _forward(x, conv_w, conv_b, deconv_w, deconv_b, kernel,
                    drop_rate, seed)


def _reference(x, conv_w, conv_b, deconv_w, deconv_b, kernel):
    """Unfused jnp math (backward path + parity oracle)."""
    from .. import conv as conv_ops
    inner = deconv_w.shape[0]
    y = conv_ops.conv1d(x, conv_w.astype(x.dtype),
                        conv_b.astype(x.dtype), stride=1, padding=0)
    y = y[..., :inner] * jax.nn.silu(y[..., inner:])
    return conv_ops.conv_transpose1d(y, deconv_w.astype(y.dtype),
                                     deconv_b.astype(y.dtype),
                                     stride=1, padding=0)


def _forward(x, conv_w, conv_b, deconv_w, deconv_b, kernel,
             drop_rate=0.0, seed=None):
    r, l_in, c = x.shape
    inner = deconv_w.shape[0]
    k = kernel
    l1 = l_in - k + 1  # conv output length; deconv restores l_in

    cp = _round_up(c, LANE)
    ip = _round_up(inner, LANE)
    lp = _round_up(l_in, SUBLANE) + SUBLANE  # headroom so rolls wrap zeros
    group = _pick_group(lp, cp, ip, k,
                        itemsize=jnp.dtype(x.dtype).itemsize)
    rp = _round_up(r, group)
    xp = jnp.pad(x, ((0, rp - r), (0, lp - l_in), (0, cp - c)))

    f32 = jnp.float32

    def conv_panels(half):  # [k, cp, ip]
        w = conv_w[half * inner:(half + 1) * inner]  # [inner, C, k]
        p = jnp.zeros((k, cp, ip), f32)
        p = p.at[:, :c, :inner].set(
            jnp.transpose(w, (2, 1, 0)).astype(f32))
        return p.astype(x.dtype)

    wv, wg = conv_panels(0), conv_panels(1)
    bv = jnp.zeros((1, ip), f32).at[0, :inner].set(
        conv_b[:inner].astype(f32)).astype(x.dtype)
    bg = jnp.zeros((1, ip), f32).at[0, :inner].set(
        conv_b[inner:].astype(f32)).astype(x.dtype)

    wd = jnp.zeros((k, ip, cp), f32)
    wd = wd.at[:, :inner, :c].set(
        jnp.transpose(deconv_w, (2, 0, 1))[::-1].astype(f32))  # flipped in k
    wd = wd.astype(x.dtype)

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)

    grid = (rp // group,)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, l1=l1, group=group,
                          drop_rate=float(drop_rate)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, lp, cp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cp, ip), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cp, ip), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ip, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ip), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ip), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((group, lp, cp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, lp, cp), x.dtype),
    )(xp, wv, wg, wd, bv, bg, seed)
    return out[:r, :l_in, :c] + deconv_b.astype(x.dtype)


def _fwd(x, conv_w, conv_b, deconv_w, deconv_b, kernel, drop_rate,
         seed=None):
    out = _forward(x, conv_w, conv_b, deconv_w, deconv_b, kernel,
                   drop_rate, seed)
    return out, (x, conv_w, conv_b, deconv_w, deconv_b, seed)


def _pick_group_bwd(lp: int, cp: int, ip: int, k: int,
                    itemsize: int = 2) -> int:
    """Rows per program for the backward kernel: ~6 fp32 [Lp, Ip]
    intermediates live next to the double-buffered x/dz/dx rows and the
    resident fp32 weight-grad accumulators."""
    io_row = 2 * 3 * lp * cp * itemsize       # x, dz, dx double-buffered
    inter = 6 * lp * ip * 4
    w_bytes = 3 * k * cp * ip * itemsize + 3 * k * cp * ip * 4
    g = max(1, (_VMEM_TARGET - inter - w_bytes) // io_row)
    return int(min(g, 32))


def _bwd_kernel(x_ref, dz_ref, wv_ref, wg_ref, wd_ref, bv_ref, bg_ref,
                seed_ref, dx_ref, dwv_ref, dwg_ref, dwd_ref, dbv_ref,
                dbg_ref, *, k: int, l1: int, group: int, drop_rate: float):
    """Fused FFN backward: recompute conv+gate in VMEM (no stash), then
    dgate -> (dyv, dyg) -> dx, accumulating weight/bias grads across the
    sequential TPU grid into constant-index fp32 output blocks."""
    lp = x_ref.shape[1]
    dt = wv_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwv_ref[...] = jnp.zeros_like(dwv_ref)
        dwg_ref[...] = jnp.zeros_like(dwg_ref)
        dwd_ref[...] = jnp.zeros_like(dwd_ref)
        dbv_ref[...] = jnp.zeros_like(dbv_ref)
        dbg_ref[...] = jnp.zeros_like(dbg_ref)

    for gi in range(group):
        x = x_ref[gi].astype(jnp.float32)    # [Lp, Cp]
        dz = dz_ref[gi].astype(jnp.float32)  # [Lp, Cp]
        row = jax.lax.broadcasted_iota(
            jnp.int32, (lp, wv_ref.shape[-1]), dimension=0)
        live = row < l1

        # recompute yv, yg (same shifted matmuls as forward)
        yv = bv_ref[:].astype(jnp.float32)
        yg = bg_ref[:].astype(jnp.float32)
        xs_list = []
        for j in range(k):
            xs = pltpu.roll(x, lp - j, 0) if j else x
            xs_list.append(xs.astype(dt))
            yv = yv + jax.lax.dot(xs_list[j], wv_ref[j],
                                  preferred_element_type=jnp.float32)
            yg = yg + jax.lax.dot(xs_list[j], wg_ref[j],
                                  preferred_element_type=jnp.float32)

        # dh = sum_j roll(dz, -(k-1-j)) @ wd_j^T (contract lanes)
        dh = None
        dzr_list = []
        for j in range(k):
            s = (k - 1) - j
            dzr = pltpu.roll(dz, lp - s, 0) if s else dz
            dzr_list.append(dzr.astype(dt))
            t = jax.lax.dot_general(
                dzr.astype(dt), wd_ref[j], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dh = t if dh is None else dh + t
        dh = jnp.where(live, dh, 0.0)

        sig = jax.nn.sigmoid(yg)
        silu_g = yg * sig
        gate_f = jnp.where(live, yv * silu_g, 0.0)
        if drop_rate > 0.0:  # replay the forward's exact mask
            keep = _dropout_mask(seed_ref, group, gi, gate_f.shape, drop_rate)
            inv_kp = 1.0 / (1.0 - drop_rate)
            gate_f = jnp.where(keep, gate_f * inv_kp, 0.0)  # = dropped h
            dh = jnp.where(keep, dh * inv_kp, 0.0)
        gate = gate_f.astype(dt)
        dyv = jnp.where(live, dh * silu_g, 0.0)
        dyg = jnp.where(live, dh * yv * sig * (1.0 + yg * (1.0 - sig)), 0.0)
        dyv_c = dyv.astype(dt)
        dyg_c = dyg.astype(dt)

        # dx = sum_j roll(dyv @ wv_j^T + dyg @ wg_j^T, +j) (narrow roll)
        dx = None
        for j in range(k):
            t = jax.lax.dot_general(
                dyv_c, wv_ref[j], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            t = t + jax.lax.dot_general(
                dyg_c, wg_ref[j], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if j:
                t = pltpu.roll(t, j, 0)
            dx = t if dx is None else dx + t
        dx_ref[gi] = dx.astype(dx_ref.dtype)

        # weight/bias grads (contract over rows)
        for j in range(k):
            dwv_ref[j] += jax.lax.dot_general(
                xs_list[j], dyv_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwg_ref[j] += jax.lax.dot_general(
                xs_list[j], dyg_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwd_ref[j] += jax.lax.dot_general(
                gate, dzr_list[j], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dbv_ref[...] += jnp.sum(dyv, axis=0, keepdims=True)
        dbg_ref[...] += jnp.sum(dyg, axis=0, keepdims=True)


def _backward_pallas(x, conv_w, conv_b, deconv_w, deconv_b, kernel, g,
                     drop_rate=0.0, seed=None):
    r, l_in, c = x.shape
    inner = deconv_w.shape[0]
    k = kernel
    l1 = l_in - k + 1

    cp = _round_up(c, LANE)
    ip = _round_up(inner, LANE)
    lp = _round_up(l_in, SUBLANE) + SUBLANE
    group = _pick_group_bwd(lp, cp, ip, k,
                            itemsize=jnp.dtype(x.dtype).itemsize)
    rp = _round_up(r, group)
    xp = jnp.pad(x, ((0, rp - r), (0, lp - l_in), (0, cp - c)))
    gp = jnp.pad(g.astype(x.dtype),
                 ((0, rp - r), (0, lp - l_in), (0, cp - c)))

    f32 = jnp.float32

    def conv_panels(half):
        w = conv_w[half * inner:(half + 1) * inner]
        p = jnp.zeros((k, cp, ip), f32)
        p = p.at[:, :c, :inner].set(jnp.transpose(w, (2, 1, 0)).astype(f32))
        return p.astype(x.dtype)

    wv, wg = conv_panels(0), conv_panels(1)
    bv = jnp.zeros((1, ip), f32).at[0, :inner].set(
        conv_b[:inner].astype(f32)).astype(x.dtype)
    bg = jnp.zeros((1, ip), f32).at[0, :inner].set(
        conv_b[inner:].astype(f32)).astype(x.dtype)
    wd = jnp.zeros((k, ip, cp), f32)
    wd = wd.at[:, :inner, :c].set(
        jnp.transpose(deconv_w, (2, 0, 1))[::-1].astype(f32))
    wd = wd.astype(x.dtype)

    row_spec = pl.BlockSpec((group, lp, cp), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    cpanel = lambda: pl.BlockSpec((k, cp, ip), lambda i: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
    dpanel = pl.BlockSpec((k, ip, cp), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = lambda: pl.BlockSpec((1, ip), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)

    dx, dwv, dwg, dwd, dbv, dbg = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, l1=l1, group=group,
                          drop_rate=float(drop_rate)),
        grid=(rp // group,),
        in_specs=[row_spec, row_spec, cpanel(), cpanel(), dpanel,
                  bias_spec(), bias_spec(),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(row_spec, cpanel(), cpanel(), dpanel, bias_spec(),
                   bias_spec()),
        out_shape=(
            jax.ShapeDtypeStruct((rp, lp, cp), x.dtype),
            jax.ShapeDtypeStruct((k, cp, ip), f32),
            jax.ShapeDtypeStruct((k, cp, ip), f32),
            jax.ShapeDtypeStruct((k, ip, cp), f32),
            jax.ShapeDtypeStruct((1, ip), f32),
            jax.ShapeDtypeStruct((1, ip), f32),
        ),
    )(xp, gp, wv, wg, wd, bv, bg, seed)

    dx = dx[:r, :l_in, :c].astype(x.dtype)
    # invert the panel layouts back to torch weight layouts
    dconv_w = jnp.concatenate([
        jnp.transpose(dwv[:, :c, :inner], (2, 1, 0)),
        jnp.transpose(dwg[:, :c, :inner], (2, 1, 0)),
    ], axis=0).astype(conv_w.dtype)                       # [2I, C, k]
    ddeconv_w = jnp.transpose(dwd[::-1, :inner, :c],
                              (1, 2, 0)).astype(deconv_w.dtype)  # [I, C, k]
    dconv_b = jnp.concatenate([dbv[0, :inner], dbg[0, :inner]]
                              ).astype(conv_b.dtype)
    ddeconv_b = jnp.sum(g.astype(f32), axis=(0, 1)).astype(deconv_b.dtype)
    return dx, dconv_w, dconv_b, ddeconv_w, ddeconv_b


def _bwd(kernel, drop_rate, res, g):
    x, conv_w, conv_b, deconv_w, deconv_b, seed = res
    if seed is None:
        d_seed = (None,)
    else:
        import numpy as _np
        d_seed = (_np.zeros(jnp.shape(seed), jax.dtypes.float0),)
    try:
        grads = _backward_pallas(x, conv_w, conv_b, deconv_w, deconv_b,
                                 kernel, g, drop_rate, seed)
    except Exception as e:
        if drop_rate > 0.0:
            # the jnp reference cannot replay the kernel's PRNG mask —
            # a silent fallback would produce wrong (mask-mismatched) grads
            raise
        from . import warn_fallback
        warn_fallback("swiglu_ffn.bwd", e)
        _, vjp = jax.vjp(
            lambda *a: _reference(*a, kernel), x, conv_w, conv_b, deconv_w,
            deconv_b)
        grads = vjp(g)
    return tuple(grads) + d_seed


swiglu_conv_deconv.defvjp(_fwd, _bwd)
