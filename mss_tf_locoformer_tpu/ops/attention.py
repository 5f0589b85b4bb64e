"""Scaled dot-product attention with memory-bounded backends.

The reference dispatches between flash / mem-efficient / math CUDA SDPA
kernels (``models/mss_tflocoformer.py:491-502,524-531``); its own docs record
an 80 GiB SDPA allocation as the motivating failure (MEMORY_ANALYSIS.md).
The TF-Locoformer attention shape is unusual: an enormous row batch
(B*frames or B*freqs, often >1000 rows) x moderate sequence length
(F <= 2049 bins or chunked frame counts) x small head_dim (24-32).  A naive
attention materializes ``rows * heads * L * L`` fp32 scores — tens of GB.

Backends:
  * ``xla``     — plain einsum attention (scores in HBM); fine for small
                  row-batches, fuses well.
  * ``chunked`` — ``lax.map`` over row groups: bounds live score memory to
                  ``~max_score_bytes`` while keeping every matmul MXU-sized.
                  Differentiable (scan-based), used for training and as the
                  universal fallback.
  * ``flash``   — Pallas fused kernel (``ops/pallas/flash_attention.py``):
                  online-softmax, scores never leave VMEM.
  * ``auto``    — flash on TPU when available, else chunked/xla by a score-
                  memory estimate.

Softmax statistics are fp32 in every backend.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["dot_product_attention"]

_DEFAULT_MAX_SCORE_BYTES = 1 << 30  # 1 GiB of live fp32 scores


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   dropout_rate: float = 0.0,
                   dropout_key=None) -> jnp.ndarray:
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_key is not None:
        # the reference's SDPA attention-probability dropout site
        # (``dropout_p=self.dropout if self.training else 0.0``,
        # ``models/mss_tflocoformer.py:524-531``): drop the NORMALIZED
        # probabilities, scale survivors by 1/keep, no renormalization
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("...qk,...kd->...qd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _chunked_attention(q, k, v, max_score_bytes: int,
                       dropout_rate: float = 0.0,
                       dropout_key=None) -> jnp.ndarray:
    """Row-group-chunked attention: fold all leading axes into one row axis
    and ``lax.map`` over groups sized to the score-memory budget."""
    *lead, L, D = q.shape
    rows = math.prod(lead) if lead else 1
    qf = q.reshape(rows, L, D)
    kf = k.reshape(rows, L, D)
    vf = v.reshape(rows, L, D)
    per_row = 4 * L * L  # fp32 scores
    group = max(1, min(rows, max_score_bytes // max(per_row, 1)))
    # pad rows to a multiple of the group size (masked rows are just wasted work)
    padded = -(-rows // group) * group
    if padded != rows:
        pad = [(0, padded - rows), (0, 0), (0, 0)]
        qf, kf, vf = (jnp.pad(a, pad) for a in (qf, kf, vf))
    # jax.checkpoint on the group body: without it, the scan underlying
    # lax.map saves EVERY group's fp32 scores as residuals for the backward,
    # re-materializing exactly the rows*L*L tensor this function exists to
    # bound (measured: a 1-sample base-config train step asked for 30 GB HBM)
    if dropout_rate > 0.0 and dropout_key is not None:
        row_keys = jax.random.split(dropout_key, padded)  # per-row masks

        def _row(t):  # one flattened row; lax.map vmaps over batch_size
            qq, kk, vv, rk = t
            return _xla_attention(qq, kk, vv, dropout_rate, rk)

        body = jax.checkpoint(_row)
        out = jax.lax.map(body, (qf, kf, vf, row_keys), batch_size=group)
    else:
        body = jax.checkpoint(lambda t: _xla_attention(*t))
        out = jax.lax.map(body, (qf, kf, vf), batch_size=group)
    return out[:rows].reshape(*lead, L, D)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    backend: str = "auto",
    max_score_bytes: int = _DEFAULT_MAX_SCORE_BYTES,
    fused_rope: bool = False,
    rope_theta: float = 10000.0,
    dropout_rate: float = 0.0,
    dropout_key=None,
) -> jnp.ndarray:
    """Self-attention over ``[..., L, D]`` (no mask — the reference never
    masks; rows are independent TF strips).

    ``fused_rope`` applies interleaved-pair RoPE to q/k inside the flash
    kernel (flash backend only); non-flash callers must pre-rotate.
    ``dropout_rate``/``dropout_key`` enable the reference's SDPA
    attention-probability dropout (training only); the standalone flash
    kernel does not implement it, so a dropout request routes to the
    XLA/chunked path (the fused attention-STEP kernel has its own in-kernel
    implementation and does not come through here).
    """
    dropping = dropout_rate > 0.0 and dropout_key is not None
    if backend == "flash" and dropping:
        backend = "auto"
    if backend == "flash":
        from .pallas import pallas_enabled
        if not pallas_enabled():
            backend = "auto"  # Pallas only on TPU and never under mp>1
        else:
            try:
                from .pallas.flash_attention import flash_attention
                return flash_attention(q, k, v, fused_rope, rope_theta)
            except Exception as e:
                from .pallas import warn_fallback
                warn_fallback("flash_attention", e)
                backend = "auto"
    if fused_rope:  # fallback path: rotate explicitly
        from .rope import apply_rope
        q = apply_rope(q, rope_theta).astype(q.dtype)
        k = apply_rope(k, rope_theta).astype(k.dtype)
    rate = dropout_rate if dropping else 0.0
    key = dropout_key if dropping else None
    if backend == "xla":
        return _xla_attention(q, k, v, rate, key)

    *lead, L, _ = q.shape
    rows = math.prod(lead) if lead else 1
    score_bytes = 4 * rows * L * L
    if score_bytes > max_score_bytes:
        return _chunked_attention(q, k, v, max_score_bytes, rate, key)
    return _xla_attention(q, k, v, rate, key)
