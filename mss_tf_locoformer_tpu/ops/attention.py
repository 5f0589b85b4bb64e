"""Scaled dot-product attention.

The reference dispatches between flash / mem-efficient / math CUDA SDPA
kernels (``models/mss_tflocoformer.py:491-502,524-531``).  On TPU the two
backends are:

  * ``xla`` — a plain einsum attention; XLA fuses scale+softmax and maps the
    two matmuls onto the MXU.  Softmax statistics are always fp32.
  * ``flash`` — a Pallas fused kernel (``ops/pallas/flash_attention.py``),
    selected by the model's ``flash_attention`` flag; falls back to ``xla``
    when the shape is unsupported or when not running on TPU.

Sequence lengths here are moderate (F = n_fft/2+1 ≤ 2049 bins, or T = chunked
frame counts), with very large row-batches (B·T or B·F), so the win from
flash is avoiding the HBM round-trip of the [L, L] score matrix.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["dot_product_attention"]


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    head_dim = q.shape[-1]
    scale = 1.0 / (head_dim ** 0.5)
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    backend: str = "xla",
) -> jnp.ndarray:
    """Self-attention over ``[..., L, D]`` tensors (no mask — the reference
    never masks; rows are independent TF strips)."""
    if backend == "flash":
        try:
            from .pallas.flash_attention import flash_attention
            return flash_attention(q, k, v)
        except Exception:  # unsupported shape/platform -> XLA fallback
            return _xla_attention(q, k, v)
    return _xla_attention(q, k, v)
