"""Common utilities mirroring ``utils/common.py`` of the reference
(seed, param counting, JSON IO, meters, time formatting)."""

from __future__ import annotations

import json
import random
import time
from typing import Any, Dict

import numpy as np

__all__ = ["set_seed", "count_parameters", "save_json", "load_json",
           "AverageMeter", "format_time", "Timer"]


def set_seed(seed: int) -> None:
    """Seed python + numpy (reference ``utils/common.py:18-31``; JAX RNG is
    explicit-key so there is no global to seed — keys derive from configs)."""
    random.seed(seed)
    np.random.seed(seed)


def count_parameters(params) -> int:
    """Total parameter count of a JAX param tree (reference ``:34-43``)."""
    import jax
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def save_json(data: Dict[str, Any], path: str) -> None:
    with open(path, "w") as f:
        json.dump(data, f, indent=2, default=float)


def load_json(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


class AverageMeter:
    """Running average (reference ``utils/common.py:130-146``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0


def format_time(seconds: float) -> str:
    """``1h 02m 03s`` style (reference ``utils/common.py:162-180``)."""
    seconds = int(seconds)
    h, rem = divmod(seconds, 3600)
    m, s = divmod(rem, 60)
    if h:
        return f"{h}h {m:02d}m {s:02d}s"
    if m:
        return f"{m}m {s:02d}s"
    return f"{s}s"


class Timer:
    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
