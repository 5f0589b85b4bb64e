"""Profiling / tracing hooks.

The reference's only observability is CUDA memory counters in a tqdm postfix
(``training/train.py:157-163``).  TPU-native replacement: a ``jax.profiler``
trace window (viewable in TensorBoard's profile plugin or Perfetto) plus
host-side step-time statistics.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax

__all__ = ["StepProfiler", "step_time_stats"]


class StepProfiler:
    """Captures a ``jax.profiler`` trace for steps
    ``[start_step, start_step + n_steps)`` and records per-step wall times.

    Call :meth:`step_start` / :meth:`step_end` around each optimizer step;
    ``step_end`` must run after the host has blocked on the step's results
    (the trainer syncs on the scalar loss, which is sufficient).
    """

    def __init__(self, log_dir: str, n_steps: int = 0, start_step: int = 5):
        self.log_dir = log_dir
        self.n_steps = n_steps
        self.start_step = start_step
        self._active = False
        self._done = n_steps <= 0
        self._t0: Optional[float] = None
        self.times: list = []

    def step_start(self, step: int) -> None:
        if (not self._done and not self._active and step >= self.start_step):
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        self._t0 = time.perf_counter()

    def step_end(self, step: int) -> None:
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
        if self._active and step >= self.start_step + self.n_steps - 1:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def stats(self) -> Dict[str, float]:
        return step_time_stats(self.times)


def step_time_stats(times) -> Dict[str, float]:
    """Robust step-time summary (skips the first/compile step)."""
    if not times:
        return {}
    steady = sorted(times[1:] or times)
    n = len(steady)
    return {
        "steps": float(len(times)),
        "mean_s": sum(steady) / n,
        "p50_s": steady[n // 2],
        "p90_s": steady[min(n - 1, int(0.9 * n))],
        "max_s": steady[-1],
    }
