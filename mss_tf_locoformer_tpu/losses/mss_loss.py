"""MSS losses: SI-SDR, L1, L2, spectral L1, multi-resolution STFT, combined.

Functional JAX re-design of the reference loss stack (``models/mss_loss.py``):
same math, same defaults, same quirks preserved:

  * ``SpectralLoss`` defaults to n_fft=2048/hop=1024 regardless of model
    config (reference ``:184-193`` — ``MSSLoss`` instantiates it with no
    args at ``:53``); configurable here via ``LossConfig.spectral_*``.
  * SI-SDR: zero-mean, project estimate onto target, ``-10 log10``-ratio,
    mean over batch (``:148-170``).
  * ``combined`` = si_sdr_w * SI-SDR + l1_w * L1 + spectral_w * SpectralL1.

All loss math runs in fp32 (inputs are up-cast) so bf16 training losses are
well-conditioned.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence, Tuple

import jax.numpy as jnp

from ..core.config import LossConfig
from ..ops.stft import stft

__all__ = ["si_sdr_loss", "spectral_loss", "multi_resolution_stft_loss",
           "mss_loss", "si_sdr", "sdr"]


def _flatten(x: jnp.ndarray) -> jnp.ndarray:
    """Fold any leading channel axes into the batch: ``[B, C, T] -> [B*C, T]``.

    The reference's loss stack only ever sees mono ``[B, T]`` (its trainer
    channel-means first); the stereo BS-Locoformer lane feeds ``[B, 2, T]``,
    scored per channel (a concat-flatten would run the spectral STFT across
    the channel seam)."""
    return x.reshape(-1, x.shape[-1]) if x.ndim > 2 else x


def si_sdr(estimate: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Per-item SI-SDR in dB, ``[B]`` (reference ``compute_si_sdr``, ``:323-360``)."""
    estimate = _flatten(estimate.astype(jnp.float32))
    target = _flatten(target.astype(jnp.float32))
    estimate = estimate - jnp.mean(estimate, axis=-1, keepdims=True)
    target = target - jnp.mean(target, axis=-1, keepdims=True)
    dot = jnp.sum(estimate * target, axis=-1, keepdims=True)
    energy = jnp.sum(target * target, axis=-1, keepdims=True) + eps
    s_target = (dot / energy) * target
    signal = jnp.sum(s_target * s_target, axis=-1) + eps
    noise = jnp.sum(jnp.square(estimate - s_target), axis=-1) + eps
    return 10.0 * jnp.log10(signal / noise)


def sdr(estimate: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Per-item plain SDR in dB, ``[B]`` (reference ``compute_sdr``, ``:295-320``)."""
    estimate = _flatten(estimate.astype(jnp.float32))
    target = _flatten(target.astype(jnp.float32))
    signal = jnp.sum(target * target, axis=-1) + eps
    noise = jnp.sum(jnp.square(estimate - target), axis=-1) + eps
    return 10.0 * jnp.log10(signal / noise)


def si_sdr_loss(estimate: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Negative mean SI-SDR (scalar)."""
    return -jnp.mean(si_sdr(estimate, target, eps))


def spectral_loss(estimate: jnp.ndarray, target: jnp.ndarray,
                  n_fft: int = 2048, hop_length: int = 1024,
                  log_scale: bool = True) -> jnp.ndarray:
    """L1 between (log1p-)magnitude spectrograms (reference ``:195-244``)."""
    est = _flatten(estimate.astype(jnp.float32))
    tgt = _flatten(target.astype(jnp.float32))
    est_mag = jnp.abs(stft(est, n_fft, hop_length))
    tgt_mag = jnp.abs(stft(tgt, n_fft, hop_length))
    if log_scale:
        est_mag = jnp.log1p(est_mag)
        tgt_mag = jnp.log1p(tgt_mag)
    return jnp.mean(jnp.abs(est_mag - tgt_mag))


def multi_resolution_stft_loss(
    estimate: jnp.ndarray, target: jnp.ndarray,
    fft_sizes: Sequence[int] = (512, 1024, 2048),
    hop_sizes: Sequence[int] = (256, 512, 1024),
) -> jnp.ndarray:
    """Mean spectral loss over several resolutions (reference ``:247-292``)."""
    total = 0.0
    for n_fft, hop in zip(fft_sizes, hop_sizes):
        total = total + spectral_loss(estimate, target, n_fft, hop)
    return total / len(fft_sizes)


def mss_loss(
    predictions: Mapping[str, jnp.ndarray],
    targets: Mapping[str, jnp.ndarray],
    config: LossConfig = LossConfig(),
) -> Dict[str, jnp.ndarray]:
    """Combined per-stem loss dict + ``total_loss`` (reference ``MSSLoss.forward``,
    ``:55-107``).  Stems present in predictions but absent from targets are
    skipped, as in the reference."""
    total = 0.0
    out: Dict[str, jnp.ndarray] = {}
    for name, pred in predictions.items():
        if name not in targets:
            continue
        tgt = targets[name]
        if config.loss_type in ("si_sdr", "combined"):
            v = si_sdr_loss(pred, tgt, config.eps)
            out[f"{name}_si_sdr"] = v
            total = total + config.si_sdr_weight * v
        if config.loss_type in ("l1", "combined"):
            v = jnp.mean(jnp.abs(pred.astype(jnp.float32) - tgt.astype(jnp.float32)))
            out[f"{name}_l1"] = v
            total = total + config.l1_weight * v
        if config.loss_type == "l2":
            v = jnp.mean(jnp.square(pred.astype(jnp.float32) - tgt.astype(jnp.float32)))
            out[f"{name}_l2"] = v
            total = total + v
        if config.loss_type == "combined" and config.spectral_weight > 0:
            v = spectral_loss(pred, tgt, config.spectral_n_fft, config.spectral_hop_length)
            out[f"{name}_spectral"] = v
            total = total + config.spectral_weight * v
    out["total_loss"] = total
    return out
