"""TF-Locoformer for music source separation (audio -> 4 stems).

TPU-native re-design of the reference ``TFLocoformerMSS``
(``models/mss_tflocoformer.py:78-258``):

  * STFT/iSTFT are the torch-parity transforms from ``ops/stft.py`` (fp32).
  * Activations are channels-last ``[B, T, F, C]`` end to end (XLA/TPU's
    preferred layout); the reference's NCHW transposes disappear.
  * Mixed precision: blocks run in the policy's compute dtype (bf16 in
    training); the encoder conv+GroupNorm, decoder deconv, RMSGroupNorm and
    RoPE are fp32 islands — the exact sites the reference pins with
    ``autocast(enabled=False)`` (``:218,229,550,682``).
  * The reference's ``torch.cuda.empty_cache()`` calls between blocks are a
    CUDA allocator workaround with no TPU analogue (XLA plans memory
    statically) and are dropped.
  * Direct spectral *mapping* (no masking); stem order is the reference's
    hardcoded ``['vocals','drums','bass','other']``.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import ModelConfig, SOURCE_NAMES
from ..core.precision import Precision, FP32
from ..nn.blocks import TFLocoformerBlock
from ..nn.layers import Conv2d, ConvTranspose2d
from ..nn.norms import GroupNorm
from ..ops.stft import stft, istft
from ..ops.pallas import stft_kernel as fused

__all__ = ["TFLocoformerMSS"]


class TFLocoformerMSS(nn.Module):
    config: ModelConfig
    precision: Precision = FP32

    @nn.compact
    def __call__(
        self,
        mixture: jnp.ndarray,
        return_time_domain: bool = True,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """mixture [B, T_samples] -> dict of stems ([B, T_samples] each, or
        complex spectrograms [B, F, N] when ``return_time_domain=False``)."""
        cfg = self.config
        b = mixture.shape[0]
        original_length = mixture.shape[-1]

        from ..ops.pallas import pallas_enabled
        use_fused = cfg.fused_stft and pallas_enabled() and fused.supports(
            cfg.n_fft, cfg.hop_length, original_length)
        if use_fused:
            spec = fused.stft_pallas(mixture.astype(jnp.float32),
                                     cfg.n_fft, cfg.hop_length)  # [B, F, N]
        else:
            spec = stft(mixture.astype(jnp.float32), cfg.n_fft, cfg.hop_length)
        x = jnp.stack([spec.real, spec.imag], axis=-1)  # [B, F, N, 2]
        x = jnp.swapaxes(x, 1, 2)  # [B, T(frames), F, 2]
        n_frames, n_freqs = x.shape[1], x.shape[2]

        x = self.encode(x)                                       # fp32 island
        x = x.astype(self.precision.compute_dtype)
        # per-block remat: backward recomputes each block's activations
        # instead of storing them (the real version of the reference's no-op
        # gradient_checkpointing flag, ``training/train.py:336-340``)
        block_cls = (nn.remat(TFLocoformerBlock, static_argnums=(2,))
                     if cfg.remat_blocks else TFLocoformerBlock)
        for i in range(cfg.n_layers):
            x = block_cls(
                emb_dim=cfg.emb_dim, norm_type=cfg.norm_type,
                num_groups=cfg.num_groups, tf_order=cfg.tf_order,
                n_heads=cfg.n_heads, flash_attention=cfg.flash_attention,
                attention_dim=cfg.attention_dim, use_rope=(cfg.pos_enc == "rope"),
                ffn_type=cfg.ffn_type, ffn_hidden_dim=cfg.ffn_hidden_dim,
                conv1d_kernel=cfg.conv1d_kernel, conv1d_shift=cfg.conv1d_shift,
                dropout=cfg.dropout, fused_ffn=cfg.fused_ffn,
                remat_ffn=(cfg.remat_blocks if cfg.remat_ffn is None
                           else cfg.remat_ffn), eps=cfg.eps,
                dtype=self.precision.compute_dtype,
                name=f"blocks_{i}")(x, deterministic)
        x = self.decode(x.astype(jnp.float32))                   # fp32 island

        # [B, T, F, S*2] -> complex [B, S, F, N]; channel index = 2*s + (0:re, 1:im)
        x = x.reshape(b, n_frames, n_freqs, cfg.n_sources, 2)
        spec_out = jax.lax.complex(x[..., 0], x[..., 1])          # [B, T, F, S]
        spec_out = jnp.transpose(spec_out, (0, 3, 2, 1))          # [B, S, F, N]

        names = SOURCE_NAMES[:cfg.n_sources]
        if not return_time_domain:
            return {name: spec_out[:, i] for i, name in enumerate(names)}

        flat = spec_out.reshape(b * cfg.n_sources, n_freqs, n_frames)
        # iSTFT stays on the XLA path (~2 ms/call at bench shapes): a fully
        # fused irDFT+window+OLA Pallas kernel was built and interpret-parity
        # tested in round 2, but this backend's remote Mosaic compiler aborts
        # on it (PERFORMANCE.md "Fused iSTFT+OLA" retains the write-up; the
        # kernel was removed in round 3 — git history has it)
        audio = istft(flat, cfg.n_fft, cfg.hop_length, length=original_length)
        audio = audio.reshape(b, cfg.n_sources, original_length)
        return {name: audio[:, i] for i, name in enumerate(names)}

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Conv2d(2->emb, (3,3), pad (1,1)) + GroupNorm(1) 'global LayerNorm'
        (reference ``:141-146``), fp32."""
        cfg = self.config
        x = Conv2d(2, cfg.emb_dim, (3, 3), padding=(1, 1),
                   dtype=jnp.float32, name="conv")(x.astype(jnp.float32))
        return GroupNorm(1, cfg.emb_dim, eps=cfg.eps, name="conv_norm")(x)

    def decode(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        return ConvTranspose2d(cfg.emb_dim, cfg.n_sources * 2, (3, 3),
                               padding=(1, 1), dtype=jnp.float32,
                               name="deconv")(x)

