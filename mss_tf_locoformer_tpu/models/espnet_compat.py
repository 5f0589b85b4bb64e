"""ESPnet-style separator interface + end-to-end speech separation.

The reference ships an ESPnet plugin (``espnet2/enh/separator/
tflocoformer_separator.py:22-189``) whose ``forward(input, ilens)`` returns
``(list of per-speaker complex specs [B, T, F], ilens, OrderedDict)``, and a
pretrained-model CLI (``egs2/wsj0_2mix/enh1/separate.py:12-46``) that wraps
ESPnet's ``SeparateSpeech`` with input std-normalization (``:37``).

This module provides both WITHOUT an ESPnet dependency: the adapter speaks
the same 3-tuple contract so recipe-level code ports 1:1, and
``SpeechSeparator`` is the full waveform->waveform pipeline (STFT encoder ->
separator -> iSTFT decoder) matching the recipe's transform config
(``egs2/wsj0_2mix/enh1/conf/tuning/train_enh_tflocoformer.yaml:50-57``:
n_fft 128, hop 64 at 8 kHz).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import istft, stft

__all__ = ["ESPnetSeparatorAdapter", "SpeechSeparator"]


class ESPnetSeparatorAdapter:
    """Wraps a (flax separator module, params) pair in the ESPnet
    ``AbsSeparator`` calling convention.

    ``forward(input, ilens)``: ``input`` complex ``[B, T, F]`` (or
    ``[B, 1, T, F]``), returns ``(masked, ilens, others)`` where ``masked``
    is a list of ``num_spk`` complex ``[B, T, F]`` arrays — the contract of
    the reference plugin's forward (``espnet2/.../tflocoformer_separator.py:
    139-186``).  The TF-Locoformer is a direct spectral-mapping model, so
    ``others`` is an empty OrderedDict (no masks to report).
    """

    def __init__(self, module, params):
        self.module = module
        self.params = params
        self._apply = jax.jit(
            lambda spec: module.apply(params, spec, deterministic=True))

    @property
    def num_spk(self) -> int:
        return self.module.num_spk

    def forward(self, input: jnp.ndarray, ilens: Optional[jnp.ndarray] = None
                ) -> Tuple[list, Optional[jnp.ndarray], OrderedDict]:
        out = self._apply(input)                       # [B, S, T, F] complex
        masked = [out[:, s] for s in range(out.shape[1])]
        return masked, ilens, OrderedDict()

    __call__ = forward


class SpeechSeparator:
    """Waveform -> per-speaker waveforms, the ESPnet ``SeparateSpeech``
    equivalent for the speech separators.

    Pipeline (recipe ``train_enh_tflocoformer.yaml:50-57``): std-normalize
    input (``egs2/wsj0_2mix/enh1/separate.py:37``) -> STFT (default n_fft 128,
    hop 64 — the 8 kHz recipe transform) -> separator -> iSTFT at original
    length -> undo normalization.
    """

    def __init__(self, module, params, n_fft: int = 128, hop_length: int = 64,
                 normalize: bool = True):
        self.adapter = ESPnetSeparatorAdapter(module, params)
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.normalize = normalize

        def run(audio):
            spec = stft(audio, n_fft, hop_length)          # [B, F, T]
            spec = jnp.swapaxes(spec, -1, -2)              # [B, T, F]
            out = module.apply(params, spec, deterministic=True)  # [B,S,T,F]
            out = jnp.swapaxes(out, -1, -2)                # [B, S, F, T]
            return istft(out, n_fft, hop_length, length=audio.shape[-1])

        self._run = jax.jit(run)

    @property
    def num_spk(self) -> int:
        return self.adapter.num_spk

    def __call__(self, audio) -> np.ndarray:
        """``[T]`` or ``[B, T]`` mixture -> ``[B, num_spk, T]`` waveforms."""
        audio = np.asarray(audio, dtype=np.float32)
        squeeze = audio.ndim == 1
        if squeeze:
            audio = audio[None]
        scale = audio.std(axis=-1, keepdims=True) if self.normalize else None
        if scale is not None:
            audio = audio / np.maximum(scale, 1e-8)
        sep = np.asarray(self._run(jnp.asarray(audio)))    # [B, S, T]
        if scale is not None:
            sep = sep * scale[:, None]
        return sep
