"""Audio utilities (host-side numpy), mirroring ``utils/audio.py`` of the
reference (load/save/normalize/spectrogram/gain/mix/metrics/pad_or_trim)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..data import audio_io

__all__ = ["load_audio", "save_audio", "normalize_audio", "compute_spectrogram",
           "apply_gain", "mix_sources", "compute_metrics", "pad_or_trim"]


def load_audio(path: str, sample_rate: Optional[int] = None,
               mono: bool = False) -> Tuple[np.ndarray, int]:
    """Load audio as ``[C, T]`` float32; optional resample + mono-mean
    (reference ``utils/audio.py:14-40``)."""
    data, sr = audio_io.read(path)
    audio = data.T
    if sample_rate is not None and sr != sample_rate:
        audio = audio_io.resample(audio.T, sr, sample_rate).T
        sr = sample_rate
    if mono and audio.shape[0] > 1:
        audio = audio.mean(axis=0, keepdims=True)
    return np.ascontiguousarray(audio, dtype=np.float32), sr


def save_audio(path: str, audio: np.ndarray, sample_rate: int,
               normalize: bool = True, bits: int = 16) -> None:
    """Save ``[C, T]`` or ``[T]`` audio; optional peak normalization
    (reference ``utils/audio.py:43-66``)."""
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    if normalize:
        peak = np.max(np.abs(audio))
        if peak > 0:
            audio = audio / peak * 0.95
    audio_io.write(path, audio.T, sample_rate, bits=bits)


def normalize_audio(audio: np.ndarray, target_db: float = -20.0,
                    eps: float = 1e-8) -> np.ndarray:
    """RMS-normalize to ``target_db`` dBFS (reference ``utils/audio.py:69-95``)."""
    rms = float(np.sqrt(np.mean(np.square(audio))))
    target_rms = 10.0 ** (target_db / 20.0)
    return (audio * (target_rms / (rms + eps))).astype(np.float32)


def compute_spectrogram(audio: np.ndarray, n_fft: int = 2048,
                        hop_length: int = 512, log_scale: bool = True,
                        eps: float = 1e-8) -> np.ndarray:
    """Magnitude (or log-magnitude) spectrogram via the framework STFT
    (reference ``utils/audio.py:98-136``)."""
    from ..ops.stft import stft
    mag = np.abs(np.asarray(stft(np.atleast_2d(audio), n_fft, hop_length)))
    if log_scale:
        mag = np.log(mag + eps)
    return mag


def apply_gain(audio: np.ndarray, gain_db: float) -> np.ndarray:
    return (audio * (10.0 ** (gain_db / 20.0))).astype(np.float32)


def mix_sources(sources: Sequence[np.ndarray],
                weights: Optional[Sequence[float]] = None) -> np.ndarray:
    """Weighted sum of equal-length sources (reference ``utils/audio.py:156-182``)."""
    if weights is None:
        weights = [1.0] * len(sources)
    out = np.zeros_like(np.asarray(sources[0], dtype=np.float32))
    for w, s in zip(weights, sources):
        out = out + w * np.asarray(s, dtype=np.float32)
    return out


def compute_metrics(estimate: np.ndarray, target: np.ndarray) -> Dict[str, float]:
    """SI-SDR + SDR pair (reference ``utils/audio.py:185-227``)."""
    from ..eval.metrics import compute_sdr, compute_si_sdr
    return {"si_sdr": compute_si_sdr(estimate, target),
            "sdr": compute_sdr(estimate, target)}


def pad_or_trim(audio: np.ndarray, target_length: int) -> np.ndarray:
    """Zero-pad or trim the last axis (reference ``utils/audio.py:230-253``)."""
    if audio.shape[-1] == target_length:
        return audio
    if audio.shape[-1] > target_length:
        return audio[..., :target_length]
    pad = [(0, 0)] * (audio.ndim - 1) + [(0, target_length - audio.shape[-1])]
    return np.pad(audio, pad)
