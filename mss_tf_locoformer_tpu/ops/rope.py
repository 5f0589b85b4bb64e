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

TPU layout note: head_dim D (16-64 here) lives on the 128-wide lane axis.
Reshaping it to ``[d/2, 2]`` pair views puts 2 on lanes — a relayout
catastrophe (measured ~6 ms per call at MSS shapes).  Instead the rotation
uses full-width ``[L, D]`` cos/sin tables (each angle repeated for its pair)
and expresses the interleaved partner-swap as two single-lane rolls plus an
even/odd lane select:

  out = x * cos + swap(x) * sin,   swap(x)[2i] = -x[2i+1],
                                   swap(x)[2i+1] = x[2i]

— every op stays at the original lane width and XLA fuses the whole thing
into one elementwise pass.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["rope_angles", "rope_tables", "apply_rope"]


@functools.lru_cache(maxsize=64)
def _angles_np(seq_len: int, dim: int, theta: float) -> np.ndarray:
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    return np.outer(np.arange(seq_len, dtype=np.float64), inv_freq)  # [L, d/2]


def rope_angles(seq_len: int, dim: int, theta: float = 10000.0):
    """cos/sin tables ``[L, d/2]`` (fp32), one angle per interleaved pair."""
    ang = _angles_np(seq_len, dim, theta)
    return (jnp.asarray(np.cos(ang), dtype=jnp.float32),
            jnp.asarray(np.sin(ang), dtype=jnp.float32))


@functools.lru_cache(maxsize=64)
def _tables_np(seq_len: int, dim: int, theta: float):
    ang = np.repeat(_angles_np(seq_len, dim, theta), 2, axis=-1)  # [L, D]
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def rope_tables(seq_len: int, dim: int, theta: float = 10000.0):
    """Full-width cos/sin tables ``[L, D]`` (each pair's angle repeated)."""
    cos, sin = _tables_np(seq_len, dim, theta)
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_rope(x: jnp.ndarray, theta: float = 10000.0,
               inverse: bool = False) -> jnp.ndarray:
    """Rotate ``x [..., L, D]`` positions along axis -2, pairs along axis -1.

    Equivalent to ``RotaryEmbedding(D).rotate_queries_or_keys(x)`` of
    rotary-embedding-torch (interleaved pairs, full-dim rotation, fp32).
    ``inverse=True`` applies the transpose rotation (angle negated) — used to
    back-rotate cotangents, since each pair rotation is orthogonal.
    """
    seq_len, dim = x.shape[-2], x.shape[-1]
    cos, sin = rope_tables(seq_len, dim, theta)
    if inverse:
        sin = -sin
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    # interleaved partner with sign: [-x1, x0, -x3, x2, ...]
    fwd = jnp.roll(xf, -1, axis=-1)   # lane i <- x[i+1]
    bwd = jnp.roll(xf, 1, axis=-1)    # lane i <- x[i-1]
    lane = jnp.arange(dim) % 2 == 0
    swapped = jnp.where(lane, -fwd, bwd)
    out = xf * cos + swapped * sin
    return out.astype(orig_dtype)
