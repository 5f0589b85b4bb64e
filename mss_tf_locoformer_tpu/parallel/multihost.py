"""Multi-host (multi-process) execution: TPU pod slices / multi-slice DP.

The reference's only distributed execution is 4-GPU DDP over NCCL driven by
the external ESPnet trainer (``egs2/*/exp/*/config.yaml:18-26``).  The
TPU-native equivalent at pod scale is multi-PROCESS JAX: one process per
host, each seeing its local chips, with one global ``jax.sharding.Mesh``
over every chip in the slice and XLA collectives riding ICI/DCN.  This
module is the (thin) runtime layer for that:

  * :func:`initialize` — bring up the JAX distributed runtime (explicit
    coordinator for ad-hoc clusters and tests; zero-config auto-detection
    on real TPU pods where ``jax.distributed.initialize()`` reads the
    metadata server).
  * :func:`put_global` — assemble a GLOBAL array from per-process local
    data (``jax.make_array_from_process_local_data``): each host's loader
    contributes its local batch rows to the ``dp``-sharded global batch,
    so data loading scales with hosts and no host ever materializes the
    global batch.
  * :func:`replicate` — multihost-safe parameter/state replication (plain
    ``jax.device_put`` cannot target non-addressable devices).
  * :func:`shard_indices` — equal-count round-robin dataset sharding for
    map-style iteration (equal per-process batch counts keep every process
    entering the same collectives — unequal counts deadlock a pod).

Everything degrades to the single-process fast path when the distributed
runtime is not initialized, so the trainers call these helpers
unconditionally.

Checkpointing needs no code here: orbax is multihost-aware — every process
calls save/restore with the global-array state (orbax writes each shard
from one owning process and runs its own barriers; coordinator-only save
would deadlock its ``sync_global_devices`` calls).  The checkpoint
directory must be on a filesystem all hosts share (GCS on real pods).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize", "process_count", "process_index", "is_coordinator",
    "put_global", "replicate", "local_batch_size", "shard_indices",
    "broadcast_from_coordinator",
]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Start the JAX distributed runtime (idempotent).

    With no arguments, defers to ``jax.distributed.initialize()``'s
    auto-detection (TPU pod metadata / cluster env).  Explicit arguments
    drive ad-hoc clusters and the multi-process CPU tests.
    """
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_coordinator() -> bool:
    return jax.process_index() == 0


def put_global(tree, sharding: NamedSharding):
    """Assemble global device arrays from per-process local data.

    Single-process: one async ``device_put`` per leaf (the committed-
    sharding fast path).  Multi-process: each leaf's local rows become this
    process's shard of the global array — for a ``P("dp")`` batch sharding
    the global batch is the concatenation of every host's local batch (in
    process order); for ``P()`` every process must supply the same full
    value.
    """
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: jax.device_put(x, sharding)
            if isinstance(x, (np.ndarray, jax.Array)) else x, tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x))
        if isinstance(x, (np.ndarray, jax.Array)) else x, tree)


def replicate(mesh: Mesh, tree):
    """Replicate host values over every device of a (possibly multi-host)
    mesh.  Values must be identical across processes (deterministic init
    from a shared seed, or :func:`broadcast_from_coordinator` first)."""
    rep = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, rep)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            rep, np.asarray(jax.device_get(x))), tree)


def broadcast_from_coordinator(tree):
    """Host-level broadcast of a pytree from process 0 (single-process:
    identity).  For state that only the coordinator can produce."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return jax.device_get(multihost_utils.broadcast_one_to_all(tree))


def local_batch_size(global_batch: int) -> int:
    """Per-process share of a global batch (must divide evenly — unequal
    shares would desynchronize the per-step collectives)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes")
    return global_batch // n


def shard_indices(n: int, rank: Optional[int] = None,
                  world: Optional[int] = None) -> Tuple[int, int, int]:
    """Equal-count round-robin shard of ``range(n)``: returns
    ``(start, stop, step)`` = ``(rank, rank + world * count, world)`` with
    ``count = n // world`` so every process iterates exactly the same
    number of items (the tail ``n % world`` items are dropped — the
    multihost analogue of ``drop_last``)."""
    rank = jax.process_index() if rank is None else rank
    world = jax.process_count() if world is None else world
    count = n // world
    return rank, rank + world * count, world
