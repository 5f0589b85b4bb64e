"""BS-Locoformer: band-split TF-Locoformer (ICASSP 2025 "Task-Aware Unified
Source Separation"), re-designed from ``standalone/bslocoformer_separator.py``.

BS-Roformer banding (``:20``): ``(0,1k):2, (1k,2k):4, (2k,4k):12,
(4k,8k):24, (8k,16k):48`` bins per band; the remainder splits in 2 (4 for
48 kHz).  Per-band 1x1-conv encoders project ``band*coef`` channels to
``emb_dim``; the shared TF-Locoformer blocks then run over (time x band)
instead of (time x freq); per-band decoders (GN -> 1x1 conv -> Tanh -> 1x1
-> 1x1 -> GLU) emit ``band * num_spk * coef * 2`` channels.  Supports
``stereo`` (coef=4) and ``masking`` (complex mask x input) vs direct mapping.

Channel-order conventions match the reference exactly (band-major encoder
flatten; decoder reshape ``(2, num_spk, [M], band)`` complex-major) so
checkpoints convert 1:1.
"""

from __future__ import annotations

import math
from itertools import accumulate
from typing import List, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.precision import FP32, Precision
from ..nn.blocks import TFLocoformerBlock
from ..nn.layers import Conv1d
from ..nn.norms import GroupNorm

__all__ = ["BSLocoformerSeparator", "compute_bands", "BAND_SPLIT"]

# Same banding as BS-Roformer (https://arxiv.org/abs/2309.02612)
BAND_SPLIT = {(0, 1000): 2, (1000, 2000): 4, (2000, 4000): 12,
              (4000, 8000): 24, (8000, 16000): 48}


def compute_bands(stft_size: int, sample_rate: int) -> List[int]:
    """Bins per band (reference ``BandSplitModule.__init__``, ``:186-239``)."""
    num_freq_bins = stft_size // 2 + 1
    bands: List[int] = []
    freq_each_bin = sample_rate // 2 / num_freq_bins
    for (start, end), num_bins in BAND_SPLIT.items():
        num_band = math.ceil((end - start) / (num_bins * freq_each_bin))
        bands.extend([num_bins] * num_band)
    rest = num_freq_bins - sum(bands)
    if sample_rate == 48000:
        bands.extend([rest // 4, rest // 4, rest // 4, rest // 4 + rest % 4])
    else:
        bands.extend([math.floor(rest / 2), math.ceil(rest / 2)])
    assert sum(bands) == num_freq_bins, (sum(bands), num_freq_bins, bands)
    return bands


class BandEncoder(nn.Module):
    """GroupNorm(1) + 1x1 Conv1d for one band (reference ``:212-219``)."""

    in_channels: int
    emb_dim: int

    @nn.compact
    def __call__(self, x):
        """x: [B, T, band*coef] -> [B, T, emb]."""
        x = GroupNorm(1, self.in_channels, name="norm")(x)
        return Conv1d(self.in_channels, self.emb_dim, 1, name="conv")(x)


class BandDecoder(nn.Module):
    """GN -> 1x1 -> Tanh -> 1x1 -> 1x1 -> GLU for one band (reference
    ``:221-236``)."""

    emb_dim: int
    out_channels: int  # band * num_spk * coef (post-GLU)

    @nn.compact
    def __call__(self, x):
        """x: [B, T, emb] -> [B, T, out_channels]."""
        e = self.emb_dim
        x = GroupNorm(1, e, name="norm")(x)
        x = Conv1d(e, e * 4, 1, name="conv_0")(x)
        x = jnp.tanh(x)
        x = Conv1d(e * 4, e * 4, 1, name="conv_1")(x)
        x = Conv1d(e * 4, self.out_channels * 2, 1, name="conv_2")(x)
        a, b = x[..., :self.out_channels], x[..., self.out_channels:]
        return a * jax.nn.sigmoid(b)  # GLU over channels


class BSLocoformerSeparator(nn.Module):
    num_spk: int = 2
    n_layers: int = 6
    emb_dim: int = 128
    norm_type: str = "rmsgroupnorm"
    num_groups: int = 4
    tf_order: str = "ft"
    n_heads: int = 4
    flash_attention: bool = False
    attention_dim: int = 128
    pos_enc: str = "rope"
    ffn_type: Union[str, Tuple[str, ...]] = "swiglu_conv1d"
    ffn_hidden_dim: Union[int, Tuple[int, ...]] = 384
    conv1d_kernel: int = 4
    conv1d_shift: int = 1
    dropout: float = 0.0
    fused_ffn: bool = False
    sample_rate: int = 44100
    stft_size: int = 2048
    eps: float = 1.0e-5
    masking: bool = True
    stereo: bool = False
    precision: Precision = FP32

    @nn.compact
    def __call__(self, spec: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """spec: complex ``[B, M, T, F]`` (or ``[B, T, F]`` mono) ->
        complex ``[B, num_spk, (M,) T, F]``."""
        squeeze_m = False
        if spec.ndim == 3:
            assert not self.stereo
            spec = spec[:, None]  # [B, 1, T, F]
            squeeze_m = True
        b, m, n_frames, n_freqs = spec.shape
        coef = 4 if self.stereo else 2

        bands = compute_bands(self.stft_size, self.sample_rate)
        assert sum(bands) == n_freqs, (sum(bands), n_freqs)
        edges = list(accumulate([0] + bands))

        # [B, M, T, F] -> [B, T, F, 2M] (real parts then imag parts over M)
        x = jnp.moveaxis(spec, 1, -1)  # [B, T, F, M]
        x = jnp.concatenate([x.real, x.imag], axis=-1)  # [B, T, F, 2M] = coef

        # band-split encode: per band flatten (band, coef) band-major
        cols = []
        for bi, nb in enumerate(bands):
            sub = x[:, :, edges[bi]:edges[bi + 1], :]        # [B, T, nb, coef]
            sub = sub.reshape(b, n_frames, nb * coef)
            cols.append(BandEncoder(nb * coef, self.emb_dim,
                                    name=f"band_encoder_{bi}")(sub))
        h = jnp.stack(cols, axis=2)  # [B, T, n_bands, emb]

        h = h.astype(self.precision.compute_dtype)
        for i in range(self.n_layers):
            h = TFLocoformerBlock(
                emb_dim=self.emb_dim, norm_type=self.norm_type,
                num_groups=self.num_groups, tf_order=self.tf_order,
                n_heads=self.n_heads, flash_attention=self.flash_attention,
                attention_dim=self.attention_dim,
                use_rope=(self.pos_enc == "rope"),
                ffn_type=self.ffn_type, ffn_hidden_dim=self.ffn_hidden_dim,
                conv1d_kernel=self.conv1d_kernel, conv1d_shift=self.conv1d_shift,
                dropout=self.dropout, fused_ffn=self.fused_ffn, eps=self.eps,
                dtype=self.precision.compute_dtype,
                name=f"blocks_{i}")(h, deterministic=deterministic)
        h = h.astype(jnp.float32)

        # band-wise decode: channels (2, num_spk, [M], band) complex-major
        outs = []
        for bi, nb in enumerate(bands):
            dec = BandDecoder(self.emb_dim, nb * self.num_spk * coef,
                              name=f"band_decoder_{bi}")(h[:, :, bi, :])
            if self.stereo:
                dec = dec.reshape(b, n_frames, 2, self.num_spk, 2, nb)
            else:
                dec = dec.reshape(b, n_frames, 2, self.num_spk, nb)
            outs.append(dec)
        y = jnp.concatenate(outs, axis=-1)  # [B, T, 2, S, (M,) F]

        out = jax.lax.complex(y[:, :, 0], y[:, :, 1])  # [B, T, S, (M,) F]
        if self.stereo:
            out = jnp.transpose(out, (0, 2, 3, 1, 4))  # [B, S, M, T, F]
        else:
            out = jnp.transpose(out, (0, 2, 1, 3))     # [B, S, T, F]

        if self.masking:
            mix = spec  # [B, M, T, F]
            if self.stereo:
                out = out * mix[:, None]               # [B, S, M, T, F]
            else:
                out = out * mix[:, 0][:, None]         # [B, S, T, F]
        elif self.stereo:
            pass  # direct mapping, stereo output [B, S, M, T, F]
        if squeeze_m:
            pass  # mono path already [B, S, T, F]
        return out
