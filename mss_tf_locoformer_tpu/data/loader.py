"""Host-side data loading: threaded workers + device prefetch.

The reference uses ``torch.utils.data.DataLoader`` worker *processes* with
pinned memory and async H2D copies (``training/train.py:95-99,312-328``).
TPU-native equivalent: worker *threads* (the native audio engine reads WAVs
via ctypes without holding the GIL, so threads scale without pickling
overhead), a bounded prefetch queue, and a device-prefetch generator that
keeps ``prefetch_factor`` batches in flight on the chip (the pinned-memory
double-buffering analogue — ``jax.device_put`` overlaps with compute).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np

from .musdb import collate_fn

__all__ = ["DataLoader", "prefetch_to_device"]


class DataLoader:
    """Minimal threaded loader: iterates ``dataset`` by index, collates into
    batches, overlaps I/O with a bounded queue."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 num_workers: int = 0, collate: Callable = collate_fn,
                 prefetch_factor: int = 2, drop_last: bool = False,
                 seed: int = 0, shard: Optional[Sequence[int]] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.collate = collate
        self.prefetch_factor = max(1, prefetch_factor)
        self.drop_last = drop_last
        self._epoch = 0
        self._seed = seed
        # (rank, world) multihost shard: equal-count round-robin over the
        # index space so every process runs the SAME number of batches per
        # epoch (unequal counts deadlock the per-step collectives).
        self.shard = tuple(shard) if shard else None
        if self.shard and not (0 <= self.shard[0] < self.shard[1]):
            raise ValueError(f"bad shard {shard}")

    def _local_count(self) -> int:
        n = len(self.dataset)
        return n // self.shard[1] if self.shard else n

    def __len__(self) -> int:
        n = self._local_count()
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            # shard-independent shuffle: every rank permutes identically,
            # THEN takes its round-robin slice — shards stay disjoint
            rng = np.random.default_rng(self._seed + self._epoch)
            rng.shuffle(order)
        if self.shard:
            rank, world = self.shard
            order = order[rank::world][:n // world]
            n = order.shape[0]
        batches = [order[i:i + self.batch_size]
                   for i in range(0, n, self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        self._epoch += 1
        batches = self._index_batches()
        if self.num_workers == 0:
            for idxs in batches:
                yield self.collate([self.dataset[int(i)] for i in idxs])
            return
        yield from self._threaded_iter(batches)

    def _threaded_iter(self, batches):
        item_q: "queue.Queue" = queue.Queue()
        out: Dict[int, Any] = {}
        lock = threading.Lock()
        errors: list = []
        stop = threading.Event()
        # Backpressure: at most num_workers * prefetch_factor batches may be
        # loaded-but-unconsumed.  Without this a slow consumer (validation
        # pause, checkpoint write) would buffer the whole epoch in RAM.
        capacity = max(self.num_workers * self.prefetch_factor,
                       self.num_workers)
        slots = threading.Semaphore(capacity)

        for bi, idxs in enumerate(batches):
            item_q.put((bi, idxs))

        def worker():
            while not stop.is_set():
                if not slots.acquire(timeout=0.1):
                    continue  # full — re-check stop, then retry
                try:
                    bi, idxs = item_q.get_nowait()
                except queue.Empty:
                    slots.release()
                    return
                try:
                    batch = self.collate([self.dataset[int(i)] for i in idxs])
                except Exception as e:  # surfaced on the consumer side
                    slots.release()
                    with lock:
                        errors.append(e)
                    return
                with lock:
                    out[bi] = batch

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        next_bi = 0
        import time
        try:
            while next_bi < len(batches):
                with lock:
                    if errors:
                        raise errors[0]
                    batch = out.pop(next_bi, None)
                if batch is None:
                    if not any(t.is_alive() for t in threads):
                        with lock:
                            if errors:
                                raise errors[0]
                            batch = out.pop(next_bi, None)
                        if batch is None:
                            raise RuntimeError("DataLoader workers exited early")
                    else:
                        time.sleep(0.002)
                        continue
                slots.release()
                yield batch
                next_bi += 1
        finally:
            stop.set()  # unblock workers if the consumer abandons the epoch


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Keep ``size`` batches resident on device ahead of the consumer.

    With a (Named)sharding, batches go through
    :func:`..parallel.multihost.put_global`: on a multi-process mesh each
    host contributes its LOCAL batch rows to the dp-sharded global batch."""
    import collections

    import jax

    from ..parallel.multihost import put_global

    buf = collections.deque()

    def put(batch):
        if sharding is not None:
            return put_global(batch, sharding)
        return jax.tree.map(lambda x: jax.device_put(x)
                            if isinstance(x, np.ndarray) else x, batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
