"""Device mesh and sharding rules.

The reference MSS framework is single-GPU (multi-GPU exists only via ESPnet
DDP/NCCL in the original speech recipes — ``egs2/*/exp/*/config.yaml:18-26``).
The TPU-native equivalent of that data parallelism is a ``jax.sharding.Mesh``
over ICI with ``pjit``-partitioned steps: the batch is sharded over the
``dp`` axis, parameters are replicated, and XLA inserts the gradient
all-reduce (the NCCL analogue) automatically.

Axes:
  * ``dp`` — data parallel (batch / OLA-chunk axis).
  * ``mp`` — reserved model axis (head/ffn sharding) for large configs;
    size 1 by default at these model scales.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "local_mesh", "activate_mesh"]


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              dp: int = -1, mp: int = 1) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, mp)
    if dp <= 0:
        dp = n // mp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != {n} devices")
    # With mp > 1 the plain fused Pallas kernels (no SPMD sharding rules)
    # yield to XLA fallbacks, while the fused BLOCK steps run through the
    # shard_map TP wrappers over this mesh (parallel/tp_fused.py).
    arr = np.asarray(devices).reshape(dp, mp)
    mesh = Mesh(arr, axis_names=("dp", "mp"))
    from ..ops.pallas import set_model_parallel
    set_model_parallel(mp > 1, mesh)
    return mesh


def local_mesh() -> Mesh:
    """Mesh over all visible devices (single-chip -> trivial 1x1 mesh)."""
    return make_mesh()


@contextlib.contextmanager
def activate_mesh(mesh: Optional[Mesh]):
    """Re-assert ``mesh``'s model-parallel gating for traces in this scope.

    ``make_mesh`` records its mesh in process-global state (the common
    one-mesh-per-process case), but that state is last-call-wins: a later
    ``make_mesh``/``local_mesh`` from any other component would silently
    flip the Pallas gate for code still tracing against an earlier mesh —
    single-device fused kernels under an mp>1 mesh (Mosaic partitioning
    error), or TP wrappers under a dp-only one.  The trainers and the
    separation engine wrap their trace/execute scopes in this context so
    the gate always reflects the mesh actually in use; prior state is
    restored on exit.  ``None`` asserts single-device gating (no mesh).
    """
    from ..ops.pallas import model_parallel_state, set_model_parallel
    prev_active, prev_mesh = model_parallel_state()
    mp = int(mesh.shape.get("mp", 1)) if mesh is not None else 1
    set_model_parallel(mp > 1, mesh if mp > 1 else None)
    try:
        yield mesh
    finally:
        set_model_parallel(prev_active, prev_mesh)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch with the leading axis sharded over dp.
    Multihost-safe: each process contributes its local rows
    (``parallel/multihost.py``)."""
    from .multihost import put_global
    return put_global(tree, batch_sharding(mesh))
