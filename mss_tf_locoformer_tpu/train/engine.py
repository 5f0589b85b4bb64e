"""Shared trainer plumbing: the device-feeding hot loop and TensorBoard.

Both trainers (MSS ``train/loop.py`` and speech ``train/speech.py``) drive
the same epoch engine: a host-side batch generator feeds
``prefetch_to_device`` (one async ``device_put`` per batch, pipelined with
compute — the TPU answer to the reference's pinned-memory
``non_blocking=True`` H2D copies, ``training/train.py:95-99``), and the only
per-step host sync is the scalar loss for logging.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax

from ..data.loader import prefetch_to_device
from ..utils.common import AverageMeter, format_time

__all__ = ["make_writer", "Scalars", "run_train_epoch"]


def make_writer(log_dir: str):
    """TensorBoard writer, or None when tensorboardX is unavailable."""
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(log_dir)
    except ImportError:
        return None


class Scalars:
    """No-op-safe scalar logger over an optional TensorBoard writer."""

    def __init__(self, writer):
        self.writer = writer

    def __call__(self, tag: str, value: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)

    def close(self):
        if self.writer is not None:
            self.writer.close()


def run_train_epoch(
    step_fn: Callable,           # (state, batch_dict, lr, rng) -> (state, loss_dict)
    state,
    host_batches: Iterable[Dict],
    *,
    sharding,
    prefetch: int,
    lr_ctl,
    rng,
    profiler,
    epoch: int,
    log_interval: int,
    log: Callable[[str], None],
    scalars: Scalars,
) -> Tuple[object, float, object]:
    """One training epoch over device-prefetched host batches.

    ``host_batches`` yields pytrees of host arrays whose leading axis is the
    batch; each is device_put exactly once with ``sharding`` by the
    prefetcher.  ``step_fn`` receives the device-side batch verbatim.
    Returns ``(state, epoch_mean_loss, rng)``."""
    meter = AverageMeter()
    t0 = time.time()
    for i, batch in enumerate(prefetch_to_device(host_batches, size=prefetch,
                                                 sharding=sharding)):
        lr = lr_ctl.lr_at(int(state.step))
        rng, sub = jax.random.split(rng)
        profiler.step_start(int(state.step))
        state, ld = step_fn(state, batch, lr, sub)
        loss = float(ld["total_loss"])  # host sync point
        profiler.step_end(int(state.step) - 1)
        n = jax.tree.leaves(batch)[0].shape[0]
        meter.update(loss, n)
        if i % log_interval == 0:
            step = int(state.step)
            scalars("train/loss_step", loss, step)
            scalars("train/lr", lr, step)
            if "grad_norm" in ld:
                scalars("train/grad_norm", float(ld["grad_norm"]), step)
            log(f"  epoch {epoch} step {step} loss {loss:.4f} "
                f"lr {lr:.2e} ({format_time(time.time() - t0)})")
    return state, meter.avg, rng
