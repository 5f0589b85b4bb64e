"""Multi-head self-attention with optional RoPE.

Mirrors the reference MHSA (``models/mss_tflocoformer.py:467-559``): fused
QKV projection without bias, interleaved-pair RoPE on Q/K in fp32, SDPA, and
a bias-free output projection + dropout.  The ``flash`` backend selects the
Pallas fused kernel; ``xla`` is the einsum path (fp32 softmax either way).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from ..ops.rope import apply_rope
from .layers import Linear

__all__ = ["MultiHeadSelfAttention"]


class MultiHeadSelfAttention(nn.Module):
    emb_dim: int
    attention_dim: int
    n_heads: int = 8
    dropout: float = 0.0
    use_rope: bool = True
    flash_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: [B, L, C] -> [B, L, C]; attention over L."""
        b, l, _ = x.shape
        head_dim = self.attention_dim // self.n_heads

        qkv = Linear(self.emb_dim, self.attention_dim * 3, use_bias=False,
                     dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, l, 3, self.n_heads, head_dim)
        qkv = jnp.moveaxis(qkv, (2, 3), (0, 2))  # [3, B, H, L, D]
        q, k, v = qkv[0], qkv[1], qkv[2]

        backend = "flash" if self.flash_attention else "auto"
        if self.use_rope and self.flash_attention:
            # RoPE fused into the Pallas kernel (fp32 inside) — saves two
            # full HBM round-trips of Q and K
            out = dot_product_attention(q, k, v, backend=backend,
                                        fused_rope=True)
        else:
            if self.use_rope:
                q = apply_rope(q).astype(self.dtype)  # fp32 island inside
                k = apply_rope(k).astype(self.dtype)
            out = dot_product_attention(q, k, v, backend=backend)  # [B,H,L,D]

        out = jnp.swapaxes(out, 1, 2).reshape(b, l, self.attention_dim)
        out = Linear(self.attention_dim, self.emb_dim, use_bias=False,
                     dtype=self.dtype, name="aggregate_heads")(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)
