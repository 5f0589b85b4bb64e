"""BS-Locoformer end-to-end MSS model (audio -> stems).

The reference ships ``BSLocoformerSeparator`` as a spec-in/spec-out module
only (``standalone/bslocoformer_separator.py:23-270``) — there is no driver
that trains or serves it.  BASELINE.json names "BS-Locoformer 4-stem
separation on MUSDB18-HQ" as a config lane, so this wrapper gives the
band-split separator the same audio->stems contract as ``TFLocoformerMSS``:

    STFT -> BSLocoformerSeparator over (time x band) -> iSTFT

and thereby the same Trainer / chunked-OLA engine / CLI paths.  Supports
both reference modes: ``masking`` (complex mask x mixture spec) vs direct
mapping, and ``stereo`` (coef=4: the separator sees both channels jointly)
vs mono.  Mixed precision mirrors ``TFLocoformerMSS``: the transformer
stack runs in the policy compute dtype, band encoders/decoders and the
transforms stay fp32 (the separator's own fp32 islands).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import BSModelConfig, SOURCE_NAMES
from ..core.precision import FP32, Precision
from ..ops.stft import stft, istft
from .bslocoformer import BSLocoformerSeparator

__all__ = ["BSLocoformerMSS"]


class BSLocoformerMSS(nn.Module):
    config: BSModelConfig
    precision: Precision = FP32

    @nn.compact
    def __call__(
        self,
        mixture: jnp.ndarray,
        return_time_domain: bool = True,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """mixture ``[B, T]`` (mono) or ``[B, 2, T]`` (``stereo=True``) ->
        dict of stems with matching layout (or complex spectrograms
        ``[B, (M,) F, N]`` when ``return_time_domain=False``)."""
        cfg = self.config
        if cfg.stft_size != cfg.n_fft:
            raise ValueError(
                f"BSLocoformerMSS requires stft_size == n_fft for banding, "
                f"got {cfg.stft_size} != {cfg.n_fft}")
        if cfg.stereo:
            if mixture.ndim != 3 or mixture.shape[1] != 2:
                raise ValueError(
                    f"stereo BS-Locoformer expects mixture [B, 2, T], "
                    f"got {mixture.shape}")
        elif mixture.ndim != 2:
            raise ValueError(f"expected mixture [B, T], got {mixture.shape}")

        b = mixture.shape[0]
        m = 2 if cfg.stereo else 1
        original_length = mixture.shape[-1]

        flat = mixture.reshape(b * m, original_length).astype(jnp.float32)
        spec = stft(flat, cfg.n_fft, cfg.hop_length)          # [B*M, F, N]
        n_freqs, n_frames = spec.shape[1], spec.shape[2]
        spec = spec.reshape(b, m, n_freqs, n_frames)
        spec = jnp.swapaxes(spec, 2, 3)                        # [B, M, T, F]

        sep = BSLocoformerSeparator(
            num_spk=cfg.n_sources, n_layers=cfg.n_layers, emb_dim=cfg.emb_dim,
            norm_type=cfg.norm_type, num_groups=cfg.num_groups,
            tf_order=cfg.tf_order, n_heads=cfg.n_heads,
            flash_attention=cfg.flash_attention,
            attention_dim=cfg.attention_dim, pos_enc=cfg.pos_enc,
            ffn_type=cfg.ffn_type, ffn_hidden_dim=cfg.ffn_hidden_dim,
            conv1d_kernel=cfg.conv1d_kernel, conv1d_shift=cfg.conv1d_shift,
            dropout=cfg.dropout, fused_ffn=cfg.fused_ffn,
            sample_rate=cfg.sample_rate, stft_size=cfg.n_fft, eps=cfg.eps,
            masking=cfg.masking, stereo=cfg.stereo,
            precision=self.precision, name="separator")
        if cfg.stereo:
            out = sep(spec, deterministic=deterministic)     # [B, S, M, T, F]
        else:
            out = sep(spec[:, 0], deterministic=deterministic)  # [B, S, T, F]

        # -> [B, S, (M,) F, N] to match the TFLocoformerMSS spec convention
        spec_out = jnp.swapaxes(out, -1, -2)
        names = SOURCE_NAMES[:cfg.n_sources]
        if not return_time_domain:
            return {name: spec_out[:, i] for i, name in enumerate(names)}

        flat_out = spec_out.reshape(-1, n_freqs, n_frames)    # [B*S*(M), F, N]
        audio = istft(flat_out, cfg.n_fft, cfg.hop_length, length=original_length)
        if cfg.stereo:
            audio = audio.reshape(b, cfg.n_sources, m, original_length)
        else:
            audio = audio.reshape(b, cfg.n_sources, original_length)
        return {name: audio[:, i] for i, name in enumerate(names)}
