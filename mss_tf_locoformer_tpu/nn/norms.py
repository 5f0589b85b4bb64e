"""Normalization layers.

``RMSGroupNorm`` matches the reference exactly
(``models/mss_tflocoformer.py:658-706``): per-TF-bin RMS over channel groups,
computed in fp32 regardless of the surrounding compute dtype (the reference
forces this with ``@autocast(enabled=False)``), with the idiosyncratic
``x / (rms + eps)`` epsilon placement (added to the RMS, not the variance).

``LayerNorm`` matches ``torch.nn.LayerNorm`` over the last dim.
``GroupNorm`` matches ``torch.nn.GroupNorm`` on channels-last input; with
``num_groups=1`` it is the "global LayerNorm" the reference uses after the
encoder conv (``models/mss_tflocoformer.py:145``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import numpy as np
import jax.numpy as jnp

__all__ = ["RMSGroupNorm", "LayerNorm", "GroupNorm"]


class RMSGroupNorm(nn.Module):
    num_groups: int
    dim: int
    eps: float = 1e-8
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, return_scale: bool = False):
        assert self.dim % self.num_groups == 0, (self.dim, self.num_groups)
        dpg = self.dim // self.num_groups
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        if return_scale:
            # fused-kernel path: the caller applies the norm in-kernel and
            # only needs the scale (params still registered here so the
            # checkpoint schema is unchanged)
            assert not self.use_bias
            return gamma
        out_dtype = x.dtype
        x = x.astype(jnp.float32)  # fp32 island
        # TPU layout note: reshaping C=dim lanes to [G, C/G] puts C/G (e.g.
        # 24) on lanes — a relayout pass per call (~5 ms at MSS shapes).
        # Instead broadcast each group's sum-of-squares back to every channel
        # with one tiny block-diagonal matmul; all ops stay at lane width C.
        group_of = np.arange(self.dim) // dpg
        blockdiag = jnp.asarray(
            (group_of[:, None] == group_of[None, :]).astype(np.float32))
        sq_sum = jax.lax.dot_general(
            x * x, blockdiag, (((x.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)  # [..., C], per-group sums
        rms = jnp.sqrt(sq_sum) * (dpg ** -0.5)
        out = x / (rms + self.eps) * gamma
        if self.use_bias:
            beta = self.param("beta", nn.initializers.zeros, (self.dim,))
            out = out + beta
        return out.astype(out_dtype)


class LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        out_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        out = (x - mean) / jnp.sqrt(var + self.eps)
        return (out * weight + bias).astype(out_dtype)


class GroupNorm(nn.Module):
    """torch ``nn.GroupNorm`` on channels-last input ``[B, ...spatial, C]``:
    statistics per sample over (spatial, channels-within-group)."""

    num_groups: int
    num_channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.num_channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_channels,))
        out_dtype = x.dtype
        x = x.astype(jnp.float32)
        b = x.shape[0]
        g = self.num_groups
        cpg = self.num_channels // g
        # [B, spatial..., G, C/G] -> stats over (spatial..., C/G) per (B, G)
        grouped = x.reshape((b,) + x.shape[1:-1] + (g, cpg))
        axes = tuple(range(1, grouped.ndim - 2)) + (grouped.ndim - 1,)
        mean = jnp.mean(grouped, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(grouped - mean), axis=axes, keepdims=True)
        normed = (grouped - mean) / jnp.sqrt(var + self.eps)
        normed = normed.reshape(x.shape)
        return (normed * weight + bias).astype(out_dtype)
