"""Checkpoint / resume via orbax.

Reference behavior (``utils/common.py:46-102``, ``training/train.py:382-386,
426-447``): a ``.pth`` per save containing model + optimizer + epoch + loss
(+ ``best_val_loss``), written every ``save_interval`` epochs, plus
``best_model.pth`` on improvement; ``--resume`` restores model/optimizer/
epoch/best.  Here: an orbax ``CheckpointManager`` with ``keep_last``
retention and a ``best`` tracking policy, storing the jitted train state
(params/opt_state/step) plus a JSON metadata blob (epoch, losses, LR
controller and early-stop state).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory: str, keep_last: int = 10, save_best: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep_last, create=True, enable_async_checkpointing=False),
        )
        self.save_best = save_best
        self._best_dir = os.path.join(self.directory, "best")

    def save(self, epoch: int, state, metadata: Dict[str, Any],
             is_best: bool = False) -> None:
        self._mgr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                metadata=ocp.args.JsonSave(metadata),
            ),
        )
        self._mgr.wait_until_finished()
        if is_best and self.save_best:
            best = ocp.StandardCheckpointer()
            path = os.path.join(self._best_dir, "state")
            # multihost: the coordinator alone clears any stale dir, and
            # the barrier is UNCONDITIONAL — an all-process rmtree would
            # race on the shared filesystem, and keying barrier entry on
            # each process's own exists() would deadlock the pod whenever
            # metadata caching (NFS/gcsfuse) gives hosts divergent views
            if jax.process_index() == 0 and os.path.exists(path):
                import shutil
                shutil.rmtree(path)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils
                multihost_utils.sync_global_devices("ckpt_best_clear")
            best.save(path, state)
            best.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template, epoch: Optional[int] = None
                ) -> Tuple[Any, Dict[str, Any], int]:
        """Restore (state, metadata, epoch).  ``state_template`` supplies the
        tree structure/shardings (an abstract or concrete train state)."""
        epoch = epoch if epoch is not None else self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"No checkpoint in {self.directory}")
        restored = self._mgr.restore(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                metadata=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["metadata"], epoch

    def restore_best(self, state_template):
        best = ocp.StandardCheckpointer()
        return best.restore(os.path.join(self._best_dir, "state"), state_template)

    def close(self):
        self._mgr.close()
