"""Rotary position embedding (RoPE).

Matches the convention of ``rotary-embedding-torch`` 0.6.1, which the
reference applies to Q/K in fp32 (``models/mss_tflocoformer.py:550-559``):

  * inverse frequencies ``theta ** -(2i / d)`` with ``theta = 10000``,
  * each frequency repeated twice -> angle layout ``(f0, f0, f1, f1, ...)``,
  * rotation over *interleaved* (even, odd) pairs — the GPT-J convention,
    NOT the half-split (GPT-NeoX) convention most JAX codebases use.  This
    matters for checkpoint bit-parity.

RoPE has no learnable parameters (reference state_dicts contain no rope
keys), so it is a pure function here.

TPU note: instead of materializing the interleaved shuffle (a lane-crossing
permutation), we compute on the de-interleaved pair view
``x -> [..., d/2, 2]`` where the rotation is a plain 2-D rotation per pair —
XLA fuses this into two multiplies and an add per element.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["rope_angles", "apply_rope"]


@functools.lru_cache(maxsize=64)
def _angles_np(seq_len: int, dim: int, theta: float) -> np.ndarray:
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    return np.outer(np.arange(seq_len, dtype=np.float64), inv_freq)  # [L, d/2]


def rope_angles(seq_len: int, dim: int, theta: float = 10000.0):
    """cos/sin tables ``[L, d/2]`` (fp32), one angle per interleaved pair."""
    ang = _angles_np(seq_len, dim, theta)
    return (jnp.asarray(np.cos(ang), dtype=jnp.float32),
            jnp.asarray(np.sin(ang), dtype=jnp.float32))


def apply_rope(x: jnp.ndarray, theta: float = 10000.0) -> jnp.ndarray:
    """Rotate ``x [..., L, D]`` positions along axis -2, pairs along axis -1.

    Equivalent to ``RotaryEmbedding(D).rotate_queries_or_keys(x)`` of
    rotary-embedding-torch (interleaved pairs, full-dim rotation, fp32).
    """
    seq_len, dim = x.shape[-2], x.shape[-1]
    cos, sin = rope_angles(seq_len, dim, theta)
    orig_dtype = x.dtype
    xp = x.astype(jnp.float32).reshape(x.shape[:-1] + (dim // 2, 2))
    x_even, x_odd = xp[..., 0], xp[..., 1]
    # pair rotation: (x_e, x_o) -> (x_e c - x_o s, x_o c + x_e s)
    out_even = x_even * cos - x_odd * sin
    out_odd = x_odd * cos + x_even * sin
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)
