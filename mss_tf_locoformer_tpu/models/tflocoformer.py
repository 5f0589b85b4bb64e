"""TF-Locoformer separator (spec-in/spec-out) — the original MERL speech
model (``standalone/tflocoformer_separator.py:17-171``; ESPnet plugin
``espnet2/enh/separator/tflocoformer_separator.py:22-189``).

The caller owns the STFT: input is a complex spectrogram ``[B, T, F]`` (or
``[B, 1, T, F]``; mono only), output is complex ``[B, num_spk, T, F]``.
Shares the block stack with the MSS model; layout is channels-last inside.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.precision import FP32, Precision
from ..nn.blocks import TFLocoformerBlock
from ..nn.layers import Conv2d, ConvTranspose2d
from ..nn.norms import GroupNorm

__all__ = ["TFLocoformerSeparator"]


class TFLocoformerSeparator(nn.Module):
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
    eps: float = 1.0e-5
    precision: Precision = FP32

    @nn.compact
    def __call__(self, spec: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """spec: complex ``[B, T, F]`` or ``[B, 1, T, F]`` ->
        complex ``[B, num_spk, T, F]``."""
        if spec.ndim == 4:
            assert spec.shape[1] == 1, "Only monaural input is supported."
            spec = spec[:, 0]
        b, n_frames, n_freqs = spec.shape

        x = jnp.stack([spec.real, spec.imag], axis=-1)  # [B, T, F, 2]
        x = Conv2d(2, self.emb_dim, (3, 3), padding=(1, 1), dtype=jnp.float32,
                   name="conv")(x.astype(jnp.float32))
        x = GroupNorm(1, self.emb_dim, eps=self.eps, name="conv_norm")(x)

        x = x.astype(self.precision.compute_dtype)
        for i in range(self.n_layers):
            x = TFLocoformerBlock(
                emb_dim=self.emb_dim, norm_type=self.norm_type,
                num_groups=self.num_groups, tf_order=self.tf_order,
                n_heads=self.n_heads, flash_attention=self.flash_attention,
                attention_dim=self.attention_dim,
                use_rope=(self.pos_enc == "rope"),
                ffn_type=self.ffn_type, ffn_hidden_dim=self.ffn_hidden_dim,
                conv1d_kernel=self.conv1d_kernel, conv1d_shift=self.conv1d_shift,
                dropout=self.dropout, fused_ffn=self.fused_ffn, eps=self.eps,
                dtype=self.precision.compute_dtype,
                name=f"blocks_{i}")(x, deterministic=deterministic)

        x = ConvTranspose2d(self.emb_dim, self.num_spk * 2, (3, 3),
                            padding=(1, 1), dtype=jnp.float32,
                            name="deconv")(x.astype(jnp.float32))
        x = x.reshape(b, n_frames, n_freqs, self.num_spk, 2)
        out = jax.lax.complex(x[..., 0], x[..., 1])  # [B, T, F, S]
        return jnp.transpose(out, (0, 3, 1, 2))      # [B, S, T, F]
