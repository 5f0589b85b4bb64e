"""Analytic FLOP accounting for MFU (model FLOP utilization).

The reference has no utilization accounting at all (its perf story is
steps/s, ``README.md:425-432``); on TPU the number that matters for "are we
at speed of light" is MFU = achieved FLOP/s over the chip's peak bf16
FLOP/s.  XLA's ``cost_analysis()`` undercounts here — the fused Pallas
kernels are opaque custom calls — so the count is analytic, from the model
config: every matmul/conv MAC in the architecture (attention scores/AV,
QKV/out projections, conv-SwiGLU-deconv FFNs, encoder/decoder convs) plus
the rFFT transforms.  Elementwise work (norms, gates, dropout, rotary) is
deliberately excluded: MFU is defined over "useful" model FLOPs, and
including pointwise ops would flatter the number.

Backward pass is counted as exactly 2x the forward matmul FLOPs (grad wrt
inputs + grad wrt weights), the standard convention (PaLM appendix B); the
optimizer update is negligible.
"""

from __future__ import annotations

import math
from typing import Optional

__all__ = ["tflocoformer_forward_flops", "train_step_flops",
           "device_peak_flops", "n_stft_frames"]


def n_stft_frames(samples: int, hop: int) -> int:
    """torch.stft center=True frame count (``ops/stft.py`` parity)."""
    return 1 + samples // hop


def _rfft_flops(n_fft: int) -> float:
    """~2.5 N log2 N real-FFT FLOPs (half the 5 N log2 N complex-FFT count)."""
    return 2.5 * n_fft * math.log2(n_fft)


def _locoformer_block_flops(rows: int, seq: int, cfg) -> float:
    """One LocoformerBlock on [rows, seq, emb]: macaron FFNs + MHSA."""
    d = cfg.emb_dim
    a = cfg.attention_dim
    k = cfg.conv1d_kernel
    tokens = rows * seq

    hidden = cfg.ffn_hidden_dim
    if not isinstance(hidden, tuple):
        hidden = (hidden,)
    ffn = 0.0
    for i_dim in hidden:
        # Conv1d(d -> 2*i, k) + ConvTranspose1d(i -> d, k): 3*i*d*k MACs/token
        # (SwiGLU's gate split means the forward conv emits 2*i channels)
        ffn += 2.0 * tokens * 3 * i_dim * d * k

    # QKV (d -> 3a) + out proj (a -> d): 4*a*d MACs/token
    proj = 2.0 * tokens * 4 * a * d
    # scores QK^T + attn@V: 2 * rows * seq^2 * a MACs
    attn = 2.0 * (2.0 * rows * seq * seq * a)
    return ffn + proj + attn


def tflocoformer_forward_flops(cfg, batch: int, samples: int) -> float:
    """Analytic forward FLOPs for ``TFLocoformerMSS`` (base of MFU).

    Covers: STFT, encoder Conv2d, n_layers x (freq-path + time-path
    LocoformerBlock), decoder ConvTranspose2d, n_sources x iSTFT.
    """
    n = n_stft_frames(samples, cfg.hop_length)
    f = cfg.n_fft // 2 + 1
    d = cfg.emb_dim

    total = 0.0
    # STFT: one rFFT per frame, + iSTFT per stem (irFFT per frame)
    total += batch * n * _rfft_flops(cfg.n_fft)
    total += batch * cfg.n_sources * n * _rfft_flops(cfg.n_fft)
    # encoder Conv2d(2 -> d, 3x3) and decoder ConvTranspose2d(d -> 2*S, 3x3)
    total += 2.0 * batch * n * f * 9 * 2 * d
    total += 2.0 * batch * n * f * 9 * d * (2 * cfg.n_sources)
    # dual-path blocks: freq path rows=B*N seq=F; time path rows=B*F seq=N
    per_layer = (_locoformer_block_flops(batch * n, f, cfg) +
                 _locoformer_block_flops(batch * f, n, cfg))
    total += cfg.n_layers * per_layer
    return total


def train_step_flops(cfg, batch: int, samples: int) -> float:
    """fwd + bwd (2x fwd) for one optimizer step at [batch, samples]."""
    return 3.0 * tflocoformer_forward_flops(cfg, batch, samples)


# peak dense bf16 FLOP/s per chip, from published TPU specs
_PEAK_BF16 = {
    "v4": 275e12,
    "v5 lite": 197e12,   # v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v6 lite": 918e12,   # v6e / Trillium
    "v6e": 918e12,
}


def device_peak_flops(device=None) -> Optional[float]:
    """Peak bf16 FLOP/s for the current accelerator, or None if unknown
    (e.g. the CPU test mesh — MFU is only meaningful on the chip)."""
    if device is None:
        import jax
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    if not kind.startswith("tpu"):
        return None
    for key, peak in _PEAK_BF16.items():
        if key in kind:
            return peak
    return None
