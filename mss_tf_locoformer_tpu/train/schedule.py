"""Learning-rate control: linear warmup (jit-side) + ReduceLROnPlateau and
early stopping (host-side).

The reference configures ``warmup_steps`` / ``early_stopping`` in YAML but
never implements them (SURVEY.md §2.4); its only live scheduler is
``torch.optim.lr_scheduler.ReduceLROnPlateau`` stepped on val loss
(``training/train.py:366-376,422-423``).  Here all three are real:

  * warmup is a pure function of the step count, folded into the jitted
    update via ``optax.inject_hyperparams``;
  * plateau reduction is a small host-side controller with torch-compatible
    semantics (mode/factor/patience/cooldown/min_lr) whose scale multiplies
    the warmup schedule;
  * early stopping mirrors ESPnet's ``patience`` behavior.
"""

from __future__ import annotations

import jax.numpy as jnp

from dataclasses import dataclass, field, replace
from typing import Optional

from ..core.config import EarlyStoppingConfig, SchedulerConfig

__all__ = ["warmup_schedule", "ReduceLROnPlateau", "EarlyStopping"]


def warmup_schedule(base_lr: float, warmup_steps: int, warmup_start_lr: float = 0.0):
    """Linear warmup to ``base_lr`` then constant.  Returns an optax schedule."""
    def schedule(step):
        if warmup_steps <= 0:
            return base_lr
        frac = jnp.minimum(step / warmup_steps, 1.0)
        return warmup_start_lr + (base_lr - warmup_start_lr) * frac
    return schedule


@dataclass
class ReduceLROnPlateau:
    """torch-semantics plateau controller producing a multiplicative scale."""

    config: SchedulerConfig
    base_lr: float
    scale: float = 1.0
    best: Optional[float] = None
    num_bad: int = 0
    cooldown_left: int = 0

    def _is_better(self, value: float) -> bool:
        if self.best is None:
            return True
        return value < self.best if self.config.mode == "min" else value > self.best

    def step(self, value: float) -> float:
        """Feed a validation metric; returns the current LR scale."""
        if self._is_better(value):
            self.best = value
            self.num_bad = 0
        elif self.cooldown_left > 0:
            self.cooldown_left -= 1
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.config.patience:
                new_scale = max(self.scale * self.config.factor,
                                self.config.min_lr / max(self.base_lr, 1e-30))
                self.scale = new_scale
                self.cooldown_left = self.config.cooldown
                self.num_bad = 0
        return self.scale

    def state_dict(self) -> dict:
        return {"scale": self.scale, "best": self.best, "num_bad": self.num_bad,
                "cooldown_left": self.cooldown_left}

    def load_state_dict(self, d: dict):
        self.scale = d["scale"]
        self.best = d["best"]
        self.num_bad = d["num_bad"]
        self.cooldown_left = d["cooldown_left"]


@dataclass
class EarlyStopping:
    config: EarlyStoppingConfig
    best: Optional[float] = None
    num_bad: int = 0

    def step(self, value: float) -> bool:
        """Feed a val metric; returns True when training should stop."""
        if not self.config.enabled:
            return False
        if self.best is None or value < self.best - self.config.min_delta:
            self.best = value
            self.num_bad = 0
            return False
        self.num_bad += 1
        return self.num_bad >= self.config.patience

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d: dict):
        self.best = d["best"]
        self.num_bad = d["num_bad"]

