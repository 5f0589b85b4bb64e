"""STFT / iSTFT with exact ``torch.stft``/``torch.istft`` default semantics.

The reference wraps cuFFT via ``torch.stft`` (``models/mss_tflocoformer.py:46-53``)
and ``torch.istft`` (``:67-74``) with defaults: ``center=True``,
``pad_mode='reflect'``, periodic Hann window, ``onesided=True``,
``normalized=False``.  Bit-level agreement here is the foundation of the
"SI-SDR within 0.1 dB of torch" target.

TPU-native design notes:
  * Framing and overlap-add avoid gathers/scatters entirely when
    ``n_fft % hop == 0`` (true for every shipped config): framing becomes a
    stack of ``ratio = n_fft // hop`` shifted strided slices, and OLA becomes
    ``ratio`` shifted dense adds.  Both are pure reshape/slice/add programs
    that XLA fuses well on TPU; the general case falls back to gather /
    scatter-add.
  * The rFFT itself runs through XLA's FFT; all transform math is fp32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hann_window", "stft", "istft", "n_frames_for", "MSSTransform"]


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window, identical to ``torch.hann_window(win_length)``."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def n_frames_for(n_samples: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    padded = n_samples + 2 * (n_fft // 2) if center else n_samples
    return 1 + (padded - n_fft) // hop_length


def _padded_window(window: Optional[jnp.ndarray], n_fft: int, win_length: int) -> jnp.ndarray:
    """Center-pad a window of ``win_length`` to ``n_fft`` (torch semantics)."""
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        window = jnp.pad(window, (left, n_fft - win_length - left))
    return window


def _frame(x: jnp.ndarray, n_fft: int, hop: int, n_frames: int) -> jnp.ndarray:
    """Extract overlapping frames from ``x [..., T]`` -> ``[..., n_frames, n_fft]``."""
    if n_fft % hop == 0:
        ratio = n_fft // hop
        total = (n_frames - 1 + ratio) * hop
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, max(0, total - x.shape[-1]))])
        x = x[..., :total]
        chunks = x.reshape(x.shape[:-1] + (n_frames - 1 + ratio, hop))
        parts = [chunks[..., k:k + n_frames, :] for k in range(ratio)]
        # frame i = [chunks[i], chunks[i+1], ..., chunks[i+ratio-1]]
        return jnp.concatenate(parts, axis=-1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return jnp.take(x, jnp.asarray(idx), axis=-1)


def _overlap_add(frames: jnp.ndarray, hop: int, out_len: int) -> jnp.ndarray:
    """OLA ``frames [..., N, n_fft]`` -> ``[..., out_len]``."""
    n_frames, n_fft = frames.shape[-2], frames.shape[-1]
    if n_fft % hop == 0:
        ratio = n_fft // hop
        total_chunks = n_frames - 1 + ratio
        chunks = frames.reshape(frames.shape[:-1] + (ratio, hop))
        out = jnp.zeros(frames.shape[:-2] + (total_chunks, hop), dtype=frames.dtype)
        for k in range(ratio):
            out = out.at[..., k:k + n_frames, :].add(chunks[..., k, :])
        out = out.reshape(frames.shape[:-2] + (total_chunks * hop,))
        return out[..., :out_len]
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    out = jnp.zeros(frames.shape[:-2] + (out_len,), dtype=frames.dtype)
    return out.at[..., jnp.asarray(idx.reshape(-1))].add(
        frames.reshape(frames.shape[:-2] + (-1,)))


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "center"))
def stft(
    audio: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
) -> jnp.ndarray:
    """STFT of ``audio [..., T]`` -> complex spectrogram ``[..., F, N]``.

    Matches ``torch.stft(..., return_complex=True)`` defaults exactly
    (periodic Hann, reflect center pad, onesided, un-normalized).
    """
    win_length = win_length or n_fft
    w = _padded_window(window, n_fft, win_length)
    x = audio.astype(jnp.float32)
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    frames = _frame(x, n_fft, hop_length, n_frames)  # [..., N, n_fft]
    spec = jnp.fft.rfft(frames * w, axis=-1)  # [..., N, F]
    return jnp.swapaxes(spec, -1, -2)  # [..., F, N]


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "length", "center"))
def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    length: Optional[int] = None,
    center: bool = True,
) -> jnp.ndarray:
    """Inverse STFT of ``spec [..., F, N]`` -> ``audio [..., T]``.

    Matches ``torch.istft`` defaults: windowed irFFT frames, overlap-add,
    division by the window-square envelope (NOLA), center crop, ``length``
    crop/zero-pad.  Where torch raises on a (near-)zero envelope, we clamp —
    behavior is identical whenever torch would succeed.
    """
    win_length = win_length or n_fft
    w = _padded_window(window, n_fft, win_length)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)  # [..., N, n_fft]
    frames = frames.astype(jnp.float32) * w
    n_frames = frames.shape[-2]
    full_len = (n_frames - 1) * hop_length + n_fft
    y = _overlap_add(frames, hop_length, full_len)

    env_frames = jnp.broadcast_to(w * w, (n_frames, n_fft))
    env = _overlap_add(env_frames, hop_length, full_len)
    env = jnp.where(env > 1e-11, env, 1.0)
    y = y / env

    start = n_fft // 2 if center else 0
    if length is not None:
        y = y[..., start:start + length]
        if y.shape[-1] < length:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])])
        return y
    end = full_len - (n_fft // 2 if center else 0)
    return y[..., start:end]


class MSSTransform:
    """STFT/iSTFT pair bound to a model config (reference ``MSSTransform``,
    ``models/mss_tflocoformer.py:20-75``).  Stateless; window derived from config."""

    def __init__(self, n_fft: int = 2048, hop_length: int = 1024,
                 win_length: Optional[int] = None):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length or n_fft

    def stft(self, audio: jnp.ndarray) -> jnp.ndarray:
        return stft(audio, self.n_fft, self.hop_length, self.win_length)

    def istft(self, spec: jnp.ndarray, length: Optional[int] = None) -> jnp.ndarray:
        return istft(spec, self.n_fft, self.hop_length, self.win_length, length=length)
