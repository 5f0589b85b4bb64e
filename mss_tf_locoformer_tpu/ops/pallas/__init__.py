"""Pallas TPU kernels (fused STFT, flash attention, SwiGLU FFN).

Every kernel module exposes ``supports(...)`` guards; all of them consult
:func:`on_tpu` so that on non-TPU backends (CPU tests, virtual-device
meshes) callers transparently fall back to the XLA reference paths.
"""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=None)
def on_tpu() -> bool:
    """True when the default JAX backend is a real TPU (Pallas-lowerable)."""
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False
