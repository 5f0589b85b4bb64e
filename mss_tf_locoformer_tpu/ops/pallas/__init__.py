"""Pallas TPU kernels (fused STFT, flash attention, SwiGLU FFN).

Every kernel module exposes ``supports(...)`` guards; all of them consult
:func:`pallas_enabled` so that on non-TPU backends (CPU tests,
virtual-device meshes) callers transparently fall back to the XLA reference
paths.

Model-parallel gate: the fused kernels declare no SPMD sharding rules, so
under a mesh with ``mp > 1`` XLA's partitioner would at best fully
replicate around each ``pallas_call`` (a silent perf cliff) and at worst
error.  ``parallel.mesh.make_mesh`` records whether the active mesh has a
non-trivial ``mp`` axis; while it does, :func:`pallas_enabled` is False and
every fused path falls back to its XLA implementation (which XLA shards
correctly through the Megatron rules in ``parallel/sharding.py``).
"""

from __future__ import annotations

import functools

_MP_ACTIVE = False


@functools.lru_cache(maxsize=None)
def on_tpu() -> bool:
    """True when the default JAX backend is a real TPU (Pallas-lowerable)."""
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def set_model_parallel(active: bool) -> None:
    """Record whether a model-parallel (mp>1) mesh is active.

    Called by ``parallel.mesh.make_mesh``; while True, fused Pallas paths
    are disabled in favor of the XLA fallbacks (which SPMD can shard)."""
    global _MP_ACTIVE
    _MP_ACTIVE = bool(active)


def model_parallel_active() -> bool:
    return _MP_ACTIVE


def pallas_enabled() -> bool:
    """Whether fused Pallas kernels may serve compute: a real TPU backend
    AND no model-parallel mesh active (see module docstring)."""
    return on_tpu() and not _MP_ACTIVE


_WARNED: set = set()


def warn_fallback(name: str, exc: Exception | None = None) -> None:
    """One-time WARNING when a fused kernel silently yields to its XLA
    fallback — a shape regression in a kernel must not manifest only as an
    unexplained slowdown.  Tests can assert on ``fallback_names()``."""
    if name in _WARNED:
        return
    _WARNED.add(name)
    import logging
    logging.getLogger(__name__).warning(
        "Pallas kernel '%s' fell back to its XLA path%s", name,
        f": {type(exc).__name__}: {exc}" if exc is not None else "")


def fallback_names() -> frozenset:
    """Names passed to :func:`warn_fallback` so far (for test assertions)."""
    return frozenset(_WARNED)


def reset_fallbacks() -> None:
    _WARNED.clear()
