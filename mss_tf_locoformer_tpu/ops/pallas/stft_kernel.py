"""Fused STFT/iSTFT Pallas kernels (TPU).

The reference leans on cuFFT through ``torch.stft``/``torch.istft``
(``models/mss_tflocoformer.py:46-53,67-74``).  The TPU-native equivalent is
NOT an FFT port: at MSS sizes (n_fft 1024-4096, hop = n_fft/2 or /4) the rFFT
is a skinny matmul, which is exactly what the MXU wants.  One kernel fuses

  framing  ->  Hann window  ->  rFFT          (forward)
  irFFT    ->  Hann window                     (inverse; the overlap-add is
                                               ``ratio`` dense shifted adds
                                               that XLA fuses on its own)

by folding the window into precomputed DFT matrices ``W[k, f] = w[k] *
exp(-2πi k f / n)`` so the kernel body is pure data movement + two MXU
matmuls.  Framing never materializes in HBM: the signal enters VMEM once as
non-overlapping ``hop``-sized chunks and each q-block's overlapping frames
are assembled in-register from ``ratio = n_fft // hop`` shifted slices.

Applicability (else callers fall back to the jnp path in ``ops/stft.py``,
which is also the parity oracle): ``n_fft % hop == 0``, ``hop % 128 == 0``,
and the whole chunk row fits the VMEM budget — true for every shipped MSS
config; the 8 kHz speech transforms (n_fft 128) use the jnp path.

All math fp32, matching the reference's fp32 transform islands.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stft import hann_window  # noqa: F401  (re-export for parity tests)

__all__ = ["stft_pallas", "istft_pallas", "supports"]


def _np_hann(n_fft: int) -> np.ndarray:
    """Periodic Hann in pure numpy (trace-safe: no jnp under jit)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)

LANE = 128
BLK_N = 64          # frames per grid cell
F_TILE = 128        # rfft bins per grid cell (forward)
K_TILE = 512        # frame samples per grid cell (inverse)
VMEM_BUDGET = 12 * 1024 * 1024  # bytes, conservative vs 16 MB/core


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supports(n_fft: int, hop: int, n_samples: int) -> bool:
    """Whether the fused kernels handle this transform (else use jnp)."""
    if n_fft % hop or hop % LANE or n_fft % LANE:
        return False
    if n_fft // hop > 8:  # aligned-region trick covers ratio <= 8
        return False
    # per-row chunk buffer must fit VMEM alongside W tiles and frame blocks
    n_frames = 1 + (n_samples + 2 * (n_fft // 2) - n_fft) // hop
    chunks = _round_up(n_frames, BLK_N) + 8
    row_bytes = chunks * hop * 4
    w_bytes = 2 * n_fft * max(F_TILE, 1) * 4
    return row_bytes + 2 * w_bytes + BLK_N * n_fft * 4 < VMEM_BUDGET


@functools.lru_cache(maxsize=None)
def _fwd_dft(n_fft: int, f_pad: int) -> Tuple[np.ndarray, np.ndarray]:
    """Window-folded forward rDFT matrices ``[n_fft, f_pad]`` (fp32)."""
    w = _np_hann(n_fft)
    k = np.arange(n_fft)[:, None]
    f = np.arange(f_pad)[None, :]
    ang = 2.0 * np.pi * k * f / n_fft
    wre = (w[:, None] * np.cos(ang)).astype(np.float32)
    wim = (-w[:, None] * np.sin(ang)).astype(np.float32)
    n_bins = n_fft // 2 + 1
    wre[:, n_bins:] = 0.0
    wim[:, n_bins:] = 0.0
    return wre, wim


@functools.lru_cache(maxsize=None)
def _inv_dft(n_fft: int, f_pad: int) -> Tuple[np.ndarray, np.ndarray]:
    """Window-folded inverse rDFT matrices ``[f_pad, n_fft]`` (fp32).

    ``frames = re @ Cre + im @ Cim`` reproduces ``irfft(spec) * w`` using the
    hermitian weights (DC and Nyquist unscaled, interior bins doubled).
    """
    w = _np_hann(n_fft)
    n_bins = n_fft // 2 + 1
    alpha = np.full(f_pad, 2.0)
    alpha[0] = 1.0
    if n_fft % 2 == 0:
        alpha[n_bins - 1] = 1.0
    alpha[n_bins:] = 0.0
    f = np.arange(f_pad)[:, None]
    k = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * f * k / n_fft
    cre = (alpha[:, None] * np.cos(ang) * w[None, :] / n_fft).astype(np.float32)
    cim = (-alpha[:, None] * np.sin(ang) * w[None, :] / n_fft).astype(np.float32)
    return cre, cim


def _fwd_kernel(sig_ref, wre_ref, wim_ref, re_ref, im_ref, *, ratio: int,
                blk_n: int, hop: int):
    """Overlapping frames never materialize: ``frames @ W`` is computed as
    ``sum_k shift_k(chunks) @ W[k*hop:(k+1)*hop]``.  Shifts use ``pltpu.roll``
    so every vector keeps a zero sublane offset (Mosaic rejects both
    misaligned dynamic loads and concats of offset slices)."""
    i = pl.program_id(1)
    base = pl.multiple_of(i * blk_n, blk_n)
    region = sig_ref[0, pl.ds(base, blk_n + 8), :]  # [BLK_N+8, hop], aligned
    acc_re = jnp.zeros(re_ref.shape[1:], jnp.float32)
    acc_im = jnp.zeros(im_ref.shape[1:], jnp.float32)
    for k in range(ratio):
        # roll requires a non-negative shift: up-shift by k == roll by rows-k
        part = (pltpu.roll(region, blk_n + 8 - k, 0)[:blk_n]
                if k else region[:blk_n])
        wre_k = wre_ref[k * hop:(k + 1) * hop, :]
        wim_k = wim_ref[k * hop:(k + 1) * hop, :]
        # Single-pass MXU (bf16 inputs, fp32 accumulate): ~2e-3 relative
        # spectra error == -54 dB input noise, far below the bf16 block
        # activations downstream.  Measured on v5e this is 2.5x faster than
        # XLA's FFT; HIGHEST (fp32 emulation) is 3x slower and loses.  The
        # bit-parity path is the jnp stft (fused_stft=False).
        acc_re += jax.lax.dot(part, wre_k, preferred_element_type=jnp.float32)
        acc_im += jax.lax.dot(part, wim_k, preferred_element_type=jnp.float32)
    re_ref[0] = acc_re
    im_ref[0] = acc_im


def _inv_kernel(re_ref, im_ref, cre_ref, cim_ref, out_ref):
    # accuracy-first: this path is opt-in API (the model routes inverse to
    # XLA, see models/mss_tflocoformer.py), so spend the fp32-emulation passes
    acc = jax.lax.dot(re_ref[0], cre_ref[:],
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    acc += jax.lax.dot(im_ref[0], cim_ref[:],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    out_ref[0] = acc


def _frames_spectrum(chunks: jnp.ndarray, n_fft: int, hop: int,
                     n_frames_pad: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """chunks ``[B, C, hop]`` -> (re, im) ``[B, n_frames_pad, f_pad]``."""
    b = chunks.shape[0]
    ratio = n_fft // hop
    f_pad = _round_up(n_fft // 2 + 1, LANE)
    wre, wim = _fwd_dft(n_fft, f_pad)
    grid = (b, n_frames_pad // BLK_N, f_pad // F_TILE)
    out_shape = jax.ShapeDtypeStruct((b, n_frames_pad, f_pad), jnp.float32)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, ratio=ratio, blk_n=BLK_N, hop=hop),
        grid=grid,
        in_specs=[
            # full chunk row per b; i/j reuse it from VMEM
            pl.BlockSpec((1, chunks.shape[1], hop), lambda b_, i, j: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, F_TILE), lambda b_, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, F_TILE), lambda b_, i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BLK_N, F_TILE), lambda b_, i, j: (b_, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK_N, F_TILE), lambda b_, i, j: (b_, i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape),
    )(chunks, jnp.asarray(wre), jnp.asarray(wim))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def stft_pallas(audio: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Fused-framing STFT of ``audio [..., T]`` -> complex ``[..., F, N]``.

    Same contract as ``ops.stft.stft`` (torch.stft defaults: periodic Hann,
    center reflect pad, onesided, un-normalized).
    """
    lead = audio.shape[:-1]
    t = audio.shape[-1]
    x = audio.astype(jnp.float32).reshape((-1, t))
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    ratio = n_fft // hop_length
    n_frames_pad = _round_up(n_frames, BLK_N)
    # +8 rows so every grid cell's aligned [BLK_N+8, hop] region load is
    # in-bounds (ratio <= 8 always holds when supports() passes)
    total = (n_frames_pad + 8) * hop_length
    x = jnp.pad(x, ((0, 0), (0, total - x.shape[-1])))[:, :total]
    chunks = x.reshape(x.shape[0], -1, hop_length)
    re, im = _frames_spectrum(chunks, n_fft, hop_length, n_frames_pad)
    n_bins = n_fft // 2 + 1
    spec = jax.lax.complex(re[:, :n_frames, :n_bins], im[:, :n_frames, :n_bins])
    return jnp.swapaxes(spec, -1, -2).reshape(lead + (n_bins, n_frames))


def _stft_fwd(audio, n_fft, hop_length):
    return stft_pallas(audio, n_fft, hop_length), audio.shape

def _stft_bwd(n_fft, hop_length, shape, g):
    # adjoint via the jnp reference implementation (same linear map)
    from .. import stft as S
    dummy = jnp.zeros(shape, jnp.float32)
    _, vjp = jax.vjp(lambda a: S.stft(a, n_fft, hop_length), dummy)
    return (vjp(g)[0],)

stft_pallas.defvjp(_stft_fwd, _stft_bwd)


# NB: a FULLY fused irDFT+window+OLA kernel (istft_ola_pallas) lived here in
# round 2: interpret-mode parity held at 1e-5, but this backend's remote
# Mosaic compiler spins ~30 min and ABORTS on it (both dynamic-shift roll and
# static per-tap pl.when variants), and the failed compile wedges the device
# tunnel.  The XLA iSTFT it would replace costs ~2 ms/call at bench shapes,
# so the kernel was removed rather than shipped dark — see PERFORMANCE.md
# "Fused iSTFT+OLA" for the design write-up, and git history (commits
# 7af4f55, 660468e) for the code.


def _windowed_frames(re: jnp.ndarray, im: jnp.ndarray, n_fft: int
                     ) -> jnp.ndarray:
    """(re, im) ``[B, N_pad, f_pad]`` -> windowed frames ``[B, N_pad, n_fft]``."""
    b, n_pad, f_pad = re.shape
    cre, cim = _inv_dft(n_fft, f_pad)
    k_tile = K_TILE if n_fft % K_TILE == 0 else n_fft
    grid = (b, n_pad // BLK_N, n_fft // k_tile)
    return pl.pallas_call(
        _inv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLK_N, f_pad), lambda b_, i, k: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK_N, f_pad), lambda b_, i, k: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, k_tile), lambda b_, i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, k_tile), lambda b_, i, k: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK_N, k_tile), lambda b_, i, k: (b_, i, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, n_fft), jnp.float32),
    )(re, im, jnp.asarray(cre), jnp.asarray(cim))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def istft_pallas(spec: jnp.ndarray, n_fft: int, hop_length: int,
                 length: Optional[int] = None) -> jnp.ndarray:
    """Fused iSTFT of complex ``spec [..., F, N]`` -> ``[..., T]``.

    Same contract as ``ops.stft.istft`` (windowed irFFT + OLA + NOLA
    envelope + center/length crop).  The irFFT+window runs as one Pallas
    matmul kernel; the ``ratio`` shifted OLA adds and envelope divide are
    XLA-fused dense ops.
    """
    from .. import stft as S
    lead = spec.shape[:-2]
    n_bins, n_frames = spec.shape[-2], spec.shape[-1]
    flat = jnp.swapaxes(spec.reshape((-1, n_bins, n_frames)), -1, -2)  # [B,N,F]
    f_pad = _round_up(n_bins, LANE)
    n_pad = _round_up(n_frames, BLK_N)
    re = jnp.zeros((flat.shape[0], n_pad, f_pad), jnp.float32)
    im = jnp.zeros_like(re)
    re = re.at[:, :n_frames, :n_bins].set(flat.real.astype(jnp.float32))
    im = im.at[:, :n_frames, :n_bins].set(flat.imag.astype(jnp.float32))
    frames = _windowed_frames(re, im, n_fft)[:, :n_frames]

    full_len = (n_frames - 1) * hop_length + n_fft
    y = S._overlap_add(frames, hop_length, full_len)
    w = hann_window(n_fft)
    env_frames = jnp.broadcast_to(w * w, (n_frames, n_fft))
    env = S._overlap_add(env_frames, hop_length, full_len)
    y = y / jnp.where(env > 1e-11, env, 1.0)

    start = n_fft // 2
    if length is not None:
        y = y[..., start:start + length]
        if y.shape[-1] < length:
            y = jnp.pad(y, ((0, 0), (0, length - y.shape[-1])))
    else:
        y = y[..., start:full_len - start]
    return y.reshape(lead + (y.shape[-1],))


def _istft_fwd(spec, n_fft, hop_length, length):
    return istft_pallas(spec, n_fft, hop_length, length), spec.shape

def _istft_bwd(n_fft, hop_length, length, shape, g):
    from .. import stft as S
    # the axon remote backend cannot CREATE complex arrays directly
    # (jnp.zeros(complex64) -> UNIMPLEMENTED); assemble from real zeros
    zero = jnp.zeros(shape, jnp.float32)
    dummy = jax.lax.complex(zero, zero)
    _, vjp = jax.vjp(lambda s: S.istft(s, n_fft, hop_length, length=length), dummy)
    return (vjp(g)[0],)

istft_pallas.defvjp(_istft_fwd, _istft_bwd)
