"""Locoformer blocks: macaron FFN-attention-FFN and the dual-path TF wrapper.

``LocoformerBlock`` mirrors the reference (``models/mss_tflocoformer.py:
356-464``) including its quirks: the macaron FFN module list is stored
*reversed* (``ffn_0`` = post-attention FFN = ``ffn_type[1]``, ``ffn_1`` =
pre-attention FFN = ``ffn_type[0]``), and there is no 1/2 macaron factor
(see the reference's own comment at ``standalone/tflocoformer_separator.py:
353-358``).

``TFLocoformerBlock`` (reference ``:261-353``) runs one LocoformerBlock over
the frequency axis and one over the time axis.  Activations are kept
channels-last ``[B, T, F, C]`` throughout — the TPU-native layout — so the
reference's movedim/transpose dance reduces to a single axes swap between
the two paths.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from .attention import MultiHeadSelfAttention, attn_step_applicable
from .ffn import ConvDeconv1d, SwiGLUConvDeconv1d, block_step_applicable
from .norms import LayerNorm, RMSGroupNorm

__all__ = ["LocoformerBlock", "TFLocoformerBlock"]

_FFN = {"conv1d": ConvDeconv1d, "swiglu_conv1d": SwiGLUConvDeconv1d}


class LocoformerBlock(nn.Module):
    emb_dim: int = 128
    norm_type: str = "rmsgroupnorm"
    num_groups: int = 4
    n_heads: int = 4
    flash_attention: bool = False
    attention_dim: int = 128
    use_rope: bool = True
    ffn_type: Union[str, Tuple[str, ...]] = "swiglu_conv1d"
    ffn_hidden_dim: Union[int, Tuple[int, ...]] = 384
    conv1d_kernel: int = 4
    conv1d_shift: int = 1
    dropout: float = 0.0
    fused_ffn: bool = False
    remat_ffn: bool = False  # rematerialize each FFN in backward (nested
    # under per-block remat: bounds the 2*inner-wide conv intermediates to
    # one live FFN at a time instead of all four per block)
    eps: float = 1.0e-5
    dtype: jnp.dtype = jnp.float32

    def _norm(self, name):
        if self.norm_type == "rmsgroupnorm":
            return RMSGroupNorm(self.num_groups, self.emb_dim, eps=self.eps, name=name)
        return LayerNorm(self.emb_dim, eps=self.eps, name=name)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: [B, S1, S2, C]; attention + conv along S2."""
        b, s1, s2, c = x.shape
        macaron = isinstance(self.ffn_type, (tuple, list))
        if macaron:
            types = tuple(self.ffn_type)[::-1]   # reversed storage, as reference
            dims = tuple(self.ffn_hidden_dim)[::-1]
        else:
            types = (self.ffn_type,)
            dims = (self.ffn_hidden_dim,)

        itemsize = jnp.dtype(self.dtype).itemsize
        fuse_step = [block_step_applicable(self.norm_type, t, self.fused_ffn,
                                           self.conv1d_kernel,
                                           self.conv1d_shift, s2, d,
                                           self.emb_dim,
                                           needs_bwd=not deterministic,
                                           itemsize=itemsize)
                     for t, d in zip(types, dims)]
        ffns = [
            (nn.remat(_FFN[t], static_argnums=(2,)) if self.remat_ffn
             else _FFN[t])(
                self.emb_dim, d, self.conv1d_kernel, self.conv1d_shift,
                dropout=self.dropout, use_fused=self.fused_ffn,
                dtype=self.dtype, name=f"ffn_{i}",
                **({"prenorm_groups": self.num_groups,
                    "prenorm_eps": self.eps} if fuse_step[i] else {}))
            for i, (t, d) in enumerate(zip(types, dims))
        ]
        ffn_norms = [self._norm(f"ffn_norm_{i}") for i in range(len(ffns))]

        def ffn_step(x, i):
            """x + dropout(ffn_i(norm_i(x))) — one fused kernel on TPU."""
            if fuse_step[i]:
                gamma = ffn_norms[i](x, return_scale=True)
                return ffns[i](x, deterministic, gamma)
            return ffns[i](ffn_norms[i](x), deterministic) + x

        if macaron:  # pre-attention FFN (module index -1 == last)
            x = ffn_step(x, len(ffns) - 1)

        fuse_attn = attn_step_applicable(
            self.norm_type, self.flash_attention, self.emb_dim,
            self.attention_dim, self.n_heads, s2, itemsize=itemsize)
        attn = MultiHeadSelfAttention(
            self.emb_dim, self.attention_dim, n_heads=self.n_heads,
            dropout=self.dropout, use_rope=self.use_rope,
            flash_attention=self.flash_attention, dtype=self.dtype,
            name="attn",
            **({"prenorm_groups": self.num_groups,
                "prenorm_eps": self.eps} if fuse_attn else {}))
        if fuse_attn:
            # x + OutProj(MHSA(RMSGroupNorm(x))) — one fused kernel on TPU
            gamma = self._norm("attn_norm")(x, return_scale=True)
            out = attn(x.reshape(b * s1, s2, c), deterministic, gamma)
            x = out.reshape(b, s1, s2, c)
        else:
            residual = x
            out = self._norm("attn_norm")(x)
            out = attn(out.reshape(b * s1, s2, c),
                       deterministic=deterministic)
            x = out.reshape(b, s1, s2, c) + residual

        return ffn_step(x, 0)


class TFLocoformerBlock(nn.Module):
    emb_dim: int = 128
    norm_type: str = "rmsgroupnorm"
    num_groups: int = 4
    tf_order: str = "ft"
    n_heads: int = 4
    flash_attention: bool = False
    attention_dim: int = 128
    use_rope: bool = True
    ffn_type: Union[str, Tuple[str, ...]] = "swiglu_conv1d"
    ffn_hidden_dim: Union[int, Tuple[int, ...]] = 384
    conv1d_kernel: int = 4
    conv1d_shift: int = 1
    dropout: float = 0.0
    fused_ffn: bool = False
    remat_ffn: bool = False
    eps: float = 1.0e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: [B, T, F, C] -> [B, T, F, C]."""
        kwargs = dict(
            emb_dim=self.emb_dim, norm_type=self.norm_type,
            num_groups=self.num_groups, n_heads=self.n_heads,
            flash_attention=self.flash_attention, attention_dim=self.attention_dim,
            use_rope=self.use_rope, ffn_type=self.ffn_type,
            ffn_hidden_dim=self.ffn_hidden_dim, conv1d_kernel=self.conv1d_kernel,
            conv1d_shift=self.conv1d_shift, dropout=self.dropout,
            fused_ffn=self.fused_ffn, remat_ffn=self.remat_ffn,
            eps=self.eps, dtype=self.dtype,
        )
        freq_path = LocoformerBlock(**kwargs, name="freq_path")
        frame_path = LocoformerBlock(**kwargs, name="frame_path")

        if self.tf_order == "ft":
            x = freq_path(x, deterministic=deterministic)          # attend over F
            x = jnp.swapaxes(x, 1, 2)                              # [B, F, T, C]
            x = frame_path(x, deterministic=deterministic)         # attend over T
            return jnp.swapaxes(x, 1, 2)
        else:
            x = jnp.swapaxes(x, 1, 2)                              # [B, F, T, C]
            x = frame_path(x, deterministic=deterministic)
            x = jnp.swapaxes(x, 1, 2)                              # [B, T, F, C]
            return freq_path(x, deterministic=deterministic)
