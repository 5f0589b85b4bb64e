"""Chunked overlap-add separation.

The reference runs ONE forward over the full track
(``inference/separate.py:147-148``) — no chunking anywhere in the repo —
which is exactly what OOMs on long tracks (MEMORY_ANALYSIS.md).  The
TPU-native replacement: fixed-size chunks (static shapes -> one XLA
compilation), batched to fill the chip and shardable across a ``dp`` mesh
(chunk-parallelism — the TPU answer to long sequences here), recombined by
windowed overlap-add.

Cross-fade uses a triangular (Bartlett) weighting over the overlap region;
interior chunk weights sum to exactly 1, and the envelope is normalized so
edges are exact too.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SeparationEngine", "triangular_window"]


def triangular_window(length: int, overlap: int) -> np.ndarray:
    """Flat-top window with linear ramps of ``overlap`` samples on each side."""
    w = np.ones(length, dtype=np.float32)
    if overlap > 0:
        ramp = (np.arange(overlap, dtype=np.float32) + 1.0) / (overlap + 1.0)
        w[:overlap] = ramp
        w[-overlap:] = ramp[::-1]
    return w


class SeparationEngine:
    """Batched chunked-OLA separation around a spec-mapping model.

    Args:
        apply_fn: ``(mixture [B, W]) -> {stem: [B, W]}`` jittable forward.
        chunk_samples: chunk length W (static).
        overlap: overlap samples between consecutive chunks.
        batch_size: chunks per forward (static).
        sharding: optional ``NamedSharding`` to shard the chunk batch over a
            device mesh (chunk-parallel inference).
        max_in_flight: batches dispatched ahead of the host-side fetch.
            jit calls are async, so keeping a bounded queue of un-fetched
            device results overlaps the D2H stem transfers (and the next
            H2D chunk upload) with device compute — on a remote-tunnel
            device the blocking per-batch fetch is a large fraction of
            end-to-end latency.  1 = fully synchronous (old behavior);
            each queued batch holds ~n_stems x B x W floats of HBM.
        params: optional param tree.  When given, ``apply_fn`` must take
            ``(params, mixture)`` and the tree is passed as a jit ARGUMENT
            on every call.  A closure-captured param tree is embedded into
            the lowered program as constants — at xlarge scale (~25 M
            params, ~100 MB) that serialized program exceeds remote-compile
            request limits (measured: HTTP 413 over the axon tunnel) and
            bloats the compile cache; argument-passed params keep the
            program weight-free.
    """

    def __init__(self, apply_fn: Callable, chunk_samples: int,
                 overlap: Optional[int] = None, batch_size: int = 4,
                 sharding=None, max_in_flight: int = 2, params=None):
        self.chunk = int(chunk_samples)
        self.overlap = int(overlap) if overlap is not None else self.chunk // 4
        if not 0 <= self.overlap < self.chunk:
            raise ValueError(f"overlap {self.overlap} must be in [0, {self.chunk})")
        self.hop = self.chunk - self.overlap
        self.batch_size = int(batch_size)
        self.sharding = sharding
        self.max_in_flight = max(1, int(max_in_flight))
        self._params = params
        self._apply = jax.jit(apply_fn)
        self._window = triangular_window(self.chunk, self.overlap)

    def __call__(self, audio: np.ndarray) -> Dict[str, np.ndarray]:
        """audio ``[T]`` (mono) or ``[C, T]`` (stereo models) -> dict of
        stems with matching layout."""
        # trace/execute under THIS engine's mesh gating (or single-device
        # gating when unsharded) — the module-global gate may reflect some
        # other component's mesh (parallel/mesh.py:activate_mesh)
        from ..parallel.mesh import activate_mesh
        with activate_mesh(getattr(self.sharding, "mesh", None)):
            return self._separate(audio)

    def _separate(self, audio: np.ndarray) -> Dict[str, np.ndarray]:
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim not in (1, 2):
            raise ValueError(f"expected [T] or [C, T], got {audio.shape}")
        t = audio.shape[-1]
        lead = audio.shape[:-1]  # () mono, (C,) multichannel

        def pad_tail(x, n):
            return np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n)])

        if t <= self.chunk:
            padded = pad_tail(audio, self.chunk - t)
            out = self._forward(padded[None])
            return {k: np.asarray(v)[0, ..., :t] for k, v in out.items()}

        n_chunks = 1 + math.ceil((t - self.chunk) / self.hop)
        total = (n_chunks - 1) * self.hop + self.chunk
        padded = pad_tail(audio, total - t)
        starts = np.arange(n_chunks) * self.hop
        chunks = np.stack([padded[..., s:s + self.chunk]
                           for s in starts])  # [N, (C,) W]

        # batch to the static batch size (pad with zero chunks)
        n_batches = -(-n_chunks // self.batch_size)
        pad_chunks = n_batches * self.batch_size - n_chunks
        if pad_chunks:
            chunks = np.concatenate(
                [chunks, np.zeros((pad_chunks, *lead, self.chunk), np.float32)])

        # Bounded-depth async pipeline: dispatch up to ``max_in_flight``
        # jit calls before forcing the oldest batch's D2H fetch, so stem
        # downloads / chunk uploads ride under device compute instead of
        # serializing after it.
        stem_chunks: Dict[str, list] = {}
        in_flight: list = []

        def _drain_one():
            out = in_flight.pop(0)
            for k, v in out.items():
                stem_chunks.setdefault(k, []).append(np.asarray(v))

        for b in range(n_batches):
            block = chunks[b * self.batch_size:(b + 1) * self.batch_size]
            if self.sharding is not None:
                block = jax.device_put(block, self.sharding)
            in_flight.append(self._forward(block))
            if len(in_flight) >= self.max_in_flight:
                _drain_one()
        while in_flight:
            _drain_one()

        window = self._window
        envelope = np.zeros(total, dtype=np.float64)
        for s in starts:
            envelope[s:s + self.chunk] += window
        results: Dict[str, np.ndarray] = {}
        for k, blocks in stem_chunks.items():
            flat = np.concatenate(blocks)[:n_chunks]  # [N, (C,) W]
            acc = np.zeros((*flat.shape[1:-1], total), dtype=np.float64)
            for i, s in enumerate(starts):
                acc[..., s:s + self.chunk] += flat[i] * window
            results[k] = ((acc / np.maximum(envelope, 1e-8))
                          .astype(np.float32)[..., :t])
        return results

    def _forward(self, block: np.ndarray):
        if self._params is not None:
            return self._apply(self._params, block)
        return self._apply(block)
