"""Parameterized primitive layers (torch-compatible layouts and inits).

Weights are stored in PyTorch layouts (``Linear.weight [out, in]``,
``Conv.weight [O, I, K...]``, ``ConvTranspose.weight [I, O, K...]``) so the
checkpoint converter (``convert/``) is a pure tree rename with no transposes
beyond what torch itself stores.  Initializers replicate torch defaults
(kaiming-uniform a=sqrt(5) == U(±1/sqrt(fan_in)) for weight and bias).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
from jax import random

from ..ops import conv as conv_ops

__all__ = ["Linear", "Conv1d", "Conv2d", "ConvTranspose1d", "ConvTranspose2d"]


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


class Linear(nn.Module):
    """torch-parity ``nn.Linear`` (weight ``[out, in]``)."""

    in_features: int
    out_features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bound = 1.0 / (self.in_features ** 0.5)
        w = self.param("weight", _uniform_init(bound),
                       (self.out_features, self.in_features))
        x = x.astype(self.dtype)
        y = x @ w.T.astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", _uniform_init(bound), (self.out_features,))
            y = y + b.astype(self.dtype)
        return y


class Conv1d(nn.Module):
    """torch-parity ``nn.Conv1d`` on channels-last input ``[B, L, C]``."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = self.in_channels * self.kernel_size
        bound = 1.0 / (fan_in ** 0.5)
        w = self.param("weight", _uniform_init(bound),
                       (self.out_channels, self.in_channels, self.kernel_size))
        b = self.param("bias", _uniform_init(bound), (self.out_channels,)) \
            if self.use_bias else None
        x = x.astype(self.dtype)
        return conv_ops.conv1d(x, w.astype(self.dtype),
                               None if b is None else b.astype(self.dtype),
                               stride=self.stride, padding=self.padding)


class Conv2d(nn.Module):
    """torch-parity ``nn.Conv2d`` on channels-last input ``[B, H, W, C]``."""

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        fan_in = self.in_channels * kh * kw
        bound = 1.0 / (fan_in ** 0.5)
        w = self.param("weight", _uniform_init(bound),
                       (self.out_channels, self.in_channels, kh, kw))
        b = self.param("bias", _uniform_init(bound), (self.out_channels,)) \
            if self.use_bias else None
        x = x.astype(self.dtype)
        return conv_ops.conv2d(x, w.astype(self.dtype),
                               None if b is None else b.astype(self.dtype),
                               stride=self.stride, padding=self.padding)


class ConvTranspose1d(nn.Module):
    """torch-parity ``nn.ConvTranspose1d`` (weight ``[C_in, C_out, K]``)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch fan_in for ConvTranspose is weight.size(1)*K = out_channels*K
        fan_in = self.out_channels * self.kernel_size
        bound = 1.0 / (fan_in ** 0.5)
        w = self.param("weight", _uniform_init(bound),
                       (self.in_channels, self.out_channels, self.kernel_size))
        b = self.param("bias", _uniform_init(bound), (self.out_channels,)) \
            if self.use_bias else None
        x = x.astype(self.dtype)
        return conv_ops.conv_transpose1d(x, w.astype(self.dtype),
                                         None if b is None else b.astype(self.dtype),
                                         stride=self.stride, padding=self.padding)


class ConvTranspose2d(nn.Module):
    """torch-parity ``nn.ConvTranspose2d`` (weight ``[C_in, C_out, KH, KW]``)."""

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        fan_in = self.out_channels * kh * kw
        bound = 1.0 / (fan_in ** 0.5)
        w = self.param("weight", _uniform_init(bound),
                       (self.in_channels, self.out_channels, kh, kw))
        b = self.param("bias", _uniform_init(bound), (self.out_channels,)) \
            if self.use_bias else None
        x = x.astype(self.dtype)
        return conv_ops.conv_transpose2d(x, w.astype(self.dtype),
                                         None if b is None else b.astype(self.dtype),
                                         stride=self.stride, padding=self.padding)
