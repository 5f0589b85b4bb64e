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
the single-device fused paths fall back to their XLA implementations
(which XLA shards correctly through the Megatron rules in
``parallel/sharding.py``).

The EXCEPTION is the pair of fully fused block-step kernels, which DO run
under model parallelism: ``parallel/tp_fused.py`` wraps them in
``jax.shard_map`` over the recorded mesh's ``mp`` axis (heads / inner
channels sharded per chip, explicit psum on the row-parallel products).
:func:`tp_fused_mesh` exposes the recorded mesh to those call sites; it is
non-None only on a real TPU backend (the CPU dryrun keeps the XLA
fallbacks) or under :func:`force_tp_fused_for_testing` (interpret-mode
multi-device CPU tests).
"""

from __future__ import annotations

import functools

_MP_ACTIVE = False
_TP_MESH = None
_TP_FORCE = False


@functools.lru_cache(maxsize=None)
def on_tpu() -> bool:
    """True when the default JAX backend is a real TPU (Pallas-lowerable)."""
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def set_model_parallel(active: bool, mesh=None) -> None:
    """Record whether a model-parallel (mp>1) mesh is active.

    Called by ``parallel.mesh.make_mesh``; while True, the single-device
    fused Pallas paths are disabled in favor of the XLA fallbacks (which
    SPMD can shard) and the shard_map-wrapped TP block steps take over
    where their shape gates admit.  ``mesh`` is the active
    ``jax.sharding.Mesh`` (with ``dp``/``mp`` axes) for those wrappers."""
    global _MP_ACTIVE, _TP_MESH
    _MP_ACTIVE = bool(active)
    _TP_MESH = mesh if active else None


def model_parallel_active() -> bool:
    return _MP_ACTIVE


def model_parallel_state():
    """Snapshot of (active, mesh) — lets ``parallel.mesh.activate_mesh``
    save/restore around a scope instead of trusting last-call-wins."""
    return _MP_ACTIVE, _TP_MESH


def force_tp_fused_for_testing(force: bool) -> None:
    """Let CPU tests exercise the shard_map-wrapped TP kernels (inside
    ``pltpu.force_tpu_interpret_mode``) without enabling every other fused
    path the way monkeypatching :func:`on_tpu` would."""
    global _TP_FORCE
    _TP_FORCE = bool(force)


def tp_fused_mesh():
    """The active model-parallel mesh when the shard_map-wrapped TP block
    steps may serve compute (real TPU backend, or forced for interpret-mode
    tests); None otherwise."""
    if _TP_MESH is None or not (on_tpu() or _TP_FORCE):
        return None
    return _TP_MESH


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
