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

Tap concatenation (round 3): the k rolled input copies are packed into ONE
``[Lp, k*Cp]`` buffer and the conv runs as a single k*Cp-deep MXU
contraction against a ``[k*Cp, 2*Ip]`` panel — the per-tap accumulation
happens inside the MXU instead of as k VPU adds over wide fp32
intermediates, and the value/gate halves share the matmul.  The deconv
likewise contracts all taps in one ``[Ip, k*Cp]`` matmul whose narrow
``[Lp, Cp]`` lane blocks are rolled and summed after.  Same FLOPs, ~10%
faster measured end-to-end (fwd and bwd) at base-config path shapes, and
the backward's weight grads collapse from 3k matmuls to 3.

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


def supports_shape(l_in: int, c: int, inner: int, k: int,
                   itemsize: int = 2) -> bool:
    """Shape admission for the PLAIN fused FFN kernel: whether even the
    minimum group=1 program fits scoped VMEM.  (The fully fused block-step
    kernels have their own calibrated gates — ``swiglu_block.supports_step``;
    this one exists because the xlarge freq path, gated OUT of the block
    step, fell through to this kernel whose [Lp, Ip] fp32 intermediates
    alone exceed the 16 MiB limit: lp 2080 x inner 1024 compiled to a
    23.03 MiB scoped allocation and failed cleanly.)

    Ceilings are in MODEL bytes: the byte model here is ~2x Mosaic's
    compiled footprint (measured: xlarge freq modeled 49 MiB -> compiled
    23.03 MiB; base freq modeled 10.4 MiB compiles well under the limit),
    so 24 MiB model ~= 11-12 MiB compiled — comfortable margin under the
    16 MiB limit.  Shipped shapes sit far from the boundary on both sides
    (medium-freq-class ~12 MiB vs xlarge-freq 49 MiB fwd / 93 MiB bwd).
    The gate requires BOTH directions to fit: the kernel's custom VJP
    compiles the backward whenever training differentiates through it."""
    cp = _round_up(c, LANE)
    ip = _round_up(inner, LANE)
    lp = _round_up(l_in, SUBLANE) + SUBLANE
    fwd = (2 * 2 * lp * cp * itemsize            # x + z, double-buffered
           + 3 * lp * ip * 4                     # yvg, gate (fp32)
           + lp * k * cp * (itemsize + 4)        # xs_cat + zc
           + 3 * k * cp * ip * itemsize)         # weight panels
    bwd = (2 * 3 * lp * cp * itemsize
           + 6 * lp * ip * 4 + lp * k * cp * (2 * itemsize + 4)
           + 3 * k * cp * ip * itemsize + 3 * k * cp * ip * 4)
    return fwd <= 24 * 1024 * 1024 and bwd <= 32 * 1024 * 1024


def _pick_group(lp: int, cp: int, ip: int, k: int,
                itemsize: int = 2) -> int:
    """Rows per program under the VMEM budget (inputs/outputs double-
    buffered; conv intermediates ~3 row-sized fp32 buffers plus the
    tap-concatenated input and deconv product).  ``itemsize`` = row/panel
    dtype width (fp32 callers double those terms)."""
    io_row = 2 * (lp * cp * itemsize) * 2     # x + z, double-buffered
    inter = (3 * lp * ip * 4                  # yvg, gate (fp32)
             + lp * k * cp * (itemsize + 4))  # xs_cat + zc
    w_bytes = 3 * k * cp * ip * itemsize
    g = max(1, (_VMEM_TARGET - inter - w_bytes) // io_row)
    return int(min(g, 32))


def _panels(conv_w, conv_b, deconv_w, inner, c, cp, ip, k, dt):
    """Tap-concatenated weight panels.  conv ``wvg [k*Cp, 2*Ip]`` (sublane
    block j = tap j; lane halves = value then gate columns), bias
    ``bvg [1, 2*Ip]``, deconv ``wdc [Ip, k*Cp]`` (lane block j = k-flipped
    tap j).  Padding columns/rows are zero, so they contribute nothing."""
    f32 = jnp.float32
    wt = jnp.transpose(conv_w, (2, 1, 0)).astype(f32)  # [k, C, 2*inner]
    wvg = jnp.zeros((k, cp, 2 * ip), f32)
    wvg = wvg.at[:, :c, :inner].set(wt[:, :, :inner])
    wvg = wvg.at[:, :c, ip:ip + inner].set(wt[:, :, inner:])
    wvg = wvg.reshape(k * cp, 2 * ip).astype(dt)
    bvg = jnp.zeros((1, 2 * ip), f32)
    bvg = bvg.at[0, :inner].set(conv_b[:inner].astype(f32))
    bvg = bvg.at[0, ip:ip + inner].set(conv_b[inner:].astype(f32))
    bvg = bvg.astype(dt)
    wdc = jnp.zeros((k, ip, cp), f32)
    wdc = wdc.at[:, :inner, :c].set(
        jnp.transpose(deconv_w, (2, 0, 1))[::-1].astype(f32))  # flipped in k
    wdc = jnp.moveaxis(wdc, 0, 1).reshape(ip, k * cp).astype(dt)
    return wvg, bvg, wdc


def _dropout_mask(seed_ref, group: int, gi: int, shape, rate: float):
    """Counter-based keep mask, replayable bit-exact in the backward.  The
    PRNG is re-seeded per (seed, ABSOLUTE row index): forward and backward
    use different group sizes, so (program_id, gi) alone would not align.
    The keep test is ONE unsigned compare (``P(w < t) = t / 2^32``) — no
    31-bit masking pass; unsigned keeps interpret-mode all-zero words a
    KEEP at every rate < 1 (the CPU suite pins that convention)."""
    row_idx = pl.program_id(0) * group + gi
    pltpu.prng_seed(seed_ref[0], row_idx)
    bits = jax.lax.bitcast_convert_type(pltpu.prng_random_bits(shape),
                                        jnp.uint32)
    thr = min(int(round((1.0 - rate) * (1 << 32))), (1 << 32) - 1)
    return bits < jnp.uint32(thr)


def _xs_cat(x, lp: int, k: int, dt):
    """Tap-concatenated input ``[Lp, k*Cp]``: lane-block j holds
    ``roll(x, -j)`` so the k shifted conv matmuls become ONE matmul with a
    k*Cp-deep contraction (tap accumulation happens inside the MXU instead
    of as k VPU adds over the wide [Lp, Ip] fp32 intermediates)."""
    subs = [x] + [pltpu.roll(x, lp - j, 0) for j in range(1, k)]
    return jnp.concatenate(subs, axis=1).astype(dt)


def _kernel(x_ref, wvg_ref, wd_ref, bvg_ref, seed_ref, o_ref,
            *, k: int, l1: int, ip: int, group: int, drop_rate: float):
    """x [G, Lp, Cp] -> o [G, Lp, Cp]; conv panel wvg [k*Cp, 2*Ip]
    (value cols then gate cols), deconv panel wd [Ip, k*Cp], bias
    bvg [1, 2*Ip]."""
    lp = x_ref.shape[1]
    dt = wvg_ref.dtype
    cp = x_ref.shape[-1]
    for gi in range(group):
        # Mosaic's rotate only handles 32-bit data: roll in fp32, cast at dots
        x = x_ref[gi].astype(jnp.float32)  # [Lp, Cp]
        yvg = bvg_ref[:].astype(jnp.float32) + jax.lax.dot(
            _xs_cat(x, lp, k, dt), wvg_ref[...],
            preferred_element_type=jnp.float32)        # [Lp, 2*Ip]
        yv, yg = yvg[:, :ip], yvg[:, ip:]
        gate = yv * jax.nn.sigmoid(yg) * yg  # value * silu(gate)
        # zero rows >= l1 (bias/pad garbage) so the deconv rolls wrap zeros
        row = jax.lax.broadcasted_iota(jnp.int32, gate.shape, dimension=0)
        gate = jnp.where(row < l1, gate, 0.0)
        if drop_rate > 0.0:  # in-kernel dropout (reference's pre-deconv site)
            keep = _dropout_mask(seed_ref, group, gi, gate.shape, drop_rate)
            gate = jnp.where(keep, gate * (1.0 / (1.0 - drop_rate)), 0.0)
        gate = gate.astype(dt)
        # z[l] = sum_j gate[l - (k-1) + j] @ wd[j]: one matmul over all taps
        # (lane-block j of wd), then roll the narrow [Lp, Cp] slices — row
        # rolls commute with row-wise matmuls
        zc = jax.lax.dot(gate, wd_ref[...],
                         preferred_element_type=jnp.float32)  # [Lp, k*Cp]
        z = None
        for j in range(k):
            t = zc[:, j * cp:(j + 1) * cp]
            shift = (k - 1) - j
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

    wvg, bvg, wdc = _panels(conv_w, conv_b, deconv_w, inner, c, cp, ip, k,
                            x.dtype)

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)

    grid = (rp // group,)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, l1=l1, ip=ip, group=group,
                          drop_rate=float(drop_rate)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, lp, cp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * cp, 2 * ip), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ip, k * cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * ip), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((group, lp, cp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, lp, cp), x.dtype),
    )(xp, wvg, wdc, bvg, seed)
    return out[:r, :l_in, :c] + deconv_b.astype(x.dtype)


def _fwd(x, conv_w, conv_b, deconv_w, deconv_b, kernel, drop_rate,
         seed=None):
    out = _forward(x, conv_w, conv_b, deconv_w, deconv_b, kernel,
                   drop_rate, seed)
    return out, (x, conv_w, conv_b, deconv_w, deconv_b, seed)


def _pick_group_bwd(lp: int, cp: int, ip: int, k: int,
                    itemsize: int = 2) -> int:
    """Rows per program for the backward kernel: ~6 fp32 [Lp, Ip]
    intermediates plus the tap-concatenated [Lp, k*Cp] buffers live next
    to the double-buffered x/dz/dx rows and the resident fp32 weight-grad
    accumulators."""
    io_row = 2 * 3 * lp * cp * itemsize       # x, dz, dx double-buffered
    inter = 6 * lp * ip * 4 + lp * k * cp * (2 * itemsize + 4)
    w_bytes = 3 * k * cp * ip * itemsize + 3 * k * cp * ip * 4
    g = max(1, (_VMEM_TARGET - inter - w_bytes) // io_row)
    return int(min(g, 32))


def _bwd_kernel(x_ref, dz_ref, wvg_ref, wdc_ref, bvg_ref,
                seed_ref, dx_ref, dwvg_ref, dwdc_ref, dbvg_ref,
                *, k: int, l1: int, ip: int, group: int, drop_rate: float):
    """Fused FFN backward: recompute conv+gate in VMEM (no stash), then
    dgate -> (dyv, dyg) -> dx, accumulating weight/bias grads across the
    sequential TPU grid into constant-index fp32 output blocks.  All
    per-tap matmuls run tap-CONCATENATED (one MXU contraction over k*Cp or
    2*Ip instead of k shallow matmuls + VPU adds)."""
    lp = x_ref.shape[1]
    dt = wvg_ref.dtype
    cp = x_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwvg_ref[...] = jnp.zeros_like(dwvg_ref)
        dwdc_ref[...] = jnp.zeros_like(dwdc_ref)
        dbvg_ref[...] = jnp.zeros_like(dbvg_ref)

    for gi in range(group):
        x = x_ref[gi].astype(jnp.float32)    # [Lp, Cp]
        dz = dz_ref[gi].astype(jnp.float32)  # [Lp, Cp]
        row = jax.lax.broadcasted_iota(jnp.int32, (lp, ip), dimension=0)
        live = row < l1

        # recompute yv, yg (same tap-concatenated matmul as forward)
        xs = _xs_cat(x, lp, k, dt)                      # [Lp, k*Cp]
        yvg = bvg_ref[:].astype(jnp.float32) + jax.lax.dot(
            xs, wvg_ref[...], preferred_element_type=jnp.float32)
        yv, yg = yvg[:, :ip], yvg[:, ip:]

        # dh = sum_j roll(dz, -(k-1-j)) @ wd_j^T: lane-block j of dzr_cat
        # is roll(dz, -(k-1-j)), contracted against wdc's matching block
        dzr = jnp.concatenate(
            [pltpu.roll(dz, lp - ((k - 1) - j), 0) if j != k - 1 else dz
             for j in range(k)], axis=1).astype(dt)     # [Lp, k*Cp]
        dh = jax.lax.dot_general(
            dzr, wdc_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [Lp, Ip]
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
        dyvg = jnp.concatenate([dyv, dyg], axis=1).astype(dt)  # [Lp, 2*Ip]

        # dx = sum_j roll((dyv @ wv_j^T + dyg @ wg_j^T), +j): one matmul
        # against wvg^T gives all k tap blocks, then narrow rolls + adds
        dxc = jax.lax.dot_general(
            dyvg, wvg_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [Lp, k*Cp]
        dx = None
        for j in range(k):
            t = dxc[:, j * cp:(j + 1) * cp]
            if j:
                t = pltpu.roll(t, j, 0)
            dx = t if dx is None else dx + t
        dx_ref[gi] = dx.astype(dx_ref.dtype)

        # weight/bias grads (contract over rows; all taps in one matmul)
        dwvg_ref[...] += jax.lax.dot_general(
            xs, dyvg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [k*Cp, 2*Ip]
        dwdc_ref[...] += jax.lax.dot_general(
            gate, dzr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [Ip, k*Cp]
        dbvg_ref[...] += jnp.sum(
            jnp.concatenate([dyv, dyg], axis=1), axis=0, keepdims=True)


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

    wvg, bvg, wdc = _panels(conv_w, conv_b, deconv_w, inner, c, cp, ip, k,
                            x.dtype)

    row_spec = pl.BlockSpec((group, lp, cp), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    wvg_spec = lambda: pl.BlockSpec((k * cp, 2 * ip), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    wdc_spec = lambda: pl.BlockSpec((ip, k * cp), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    bias_spec = lambda: pl.BlockSpec((1, 2 * ip), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)

    dx, dwvg, dwdc, dbvg = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, l1=l1, ip=ip, group=group,
                          drop_rate=float(drop_rate)),
        grid=(rp // group,),
        in_specs=[row_spec, row_spec, wvg_spec(), wdc_spec(), bias_spec(),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(row_spec, wvg_spec(), wdc_spec(), bias_spec()),
        out_shape=(
            jax.ShapeDtypeStruct((rp, lp, cp), x.dtype),
            jax.ShapeDtypeStruct((k * cp, 2 * ip), f32),
            jax.ShapeDtypeStruct((ip, k * cp), f32),
            jax.ShapeDtypeStruct((1, 2 * ip), f32),
        ),
    )(xp, gp, wvg, wdc, bvg, seed)

    dx = dx[:r, :l_in, :c].astype(x.dtype)
    # invert the tap-concatenated panel layouts back to torch weight layouts
    dwvg = dwvg.reshape(k, cp, 2 * ip)
    dconv_w = jnp.concatenate([
        jnp.transpose(dwvg[:, :c, :inner], (2, 1, 0)),
        jnp.transpose(dwvg[:, :c, ip:ip + inner], (2, 1, 0)),
    ], axis=0).astype(conv_w.dtype)                       # [2I, C, k]
    dwd = jnp.moveaxis(dwdc.reshape(ip, k, cp), 1, 0)     # [k, Ip, Cp]
    ddeconv_w = jnp.transpose(dwd[::-1, :inner, :c],
                              (1, 2, 0)).astype(deconv_w.dtype)  # [I, C, k]
    dconv_b = jnp.concatenate([dbvg[0, :inner], dbvg[0, ip:ip + inner]]
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
