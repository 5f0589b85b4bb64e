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


def _pick_group(lp: int, cp: int, ip: int, k: int) -> int:
    """Rows per program under the VMEM budget (inputs/outputs double-
    buffered; conv intermediates ~3 row-sized fp32 buffers)."""
    io_row = 2 * (lp * cp * 2) * 2            # x + z, double-buffered, bf16
    inter = 3 * lp * ip * 4                   # yv, yg, gate (fp32)
    w_bytes = 3 * k * cp * ip * 2
    g = max(1, (_VMEM_TARGET - inter - w_bytes) // io_row)
    return int(min(g, 32))


def _kernel(x_ref, wv_ref, wg_ref, wd_ref, bv_ref, bg_ref, o_ref, *, k: int,
            l1: int, group: int):
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def swiglu_conv_deconv(x, conv_w, conv_b, deconv_w, deconv_b, kernel: int):
    """Fused FFN core on pre-padded input.

    x ``[R, L_in, C]`` (already padded with the reference's pad arithmetic);
    conv_w ``[2*inner, C, k]`` (+bias ``[2*inner]``, value half first);
    deconv_w ``[inner, C, k]`` (torch ConvTranspose layout) + bias ``[C]``.
    Returns the full-length stride-1 deconv output ``[R, L_in, C]``
    (callers crop), equal to ``conv -> value*silu(gate) -> conv_transpose``.
    """
    return _forward(x, conv_w, conv_b, deconv_w, deconv_b, kernel)


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


def _forward(x, conv_w, conv_b, deconv_w, deconv_b, kernel):
    r, l_in, c = x.shape
    inner = deconv_w.shape[0]
    k = kernel
    l1 = l_in - k + 1  # conv output length; deconv restores l_in

    cp = _round_up(c, LANE)
    ip = _round_up(inner, LANE)
    lp = _round_up(l_in, SUBLANE) + SUBLANE  # headroom so rolls wrap zeros
    group = _pick_group(lp, cp, ip, k)
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

    grid = (rp // group,)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, l1=l1, group=group),
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
        ],
        out_specs=pl.BlockSpec((group, lp, cp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, lp, cp), x.dtype),
    )(xp, wv, wg, wd, bv, bg)
    return out[:r, :l_in, :c] + deconv_b.astype(x.dtype)


def _fwd(x, conv_w, conv_b, deconv_w, deconv_b, kernel):
    out = _forward(x, conv_w, conv_b, deconv_w, deconv_b, kernel)
    return out, (x, conv_w, conv_b, deconv_w, deconv_b)


def _bwd(kernel, res, g):
    x, conv_w, conv_b, deconv_w, deconv_b = res
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, kernel), x, conv_w, conv_b, deconv_w,
        deconv_b)
    return vjp(g)


swiglu_conv_deconv.defvjp(_fwd, _bwd)
