"""Train state + optimizer construction.

The reference uses torch AdamW (lr/weight_decay/eps from YAML; betas silently
ignored — implemented here) with hardcoded grad-clip 5.0
(``training/train.py:126,145,354-363``).  On TPU: ``optax.adamw`` (XLA fuses
the update), global-norm clipping from ``training.gradient_clip``, and the
learning rate injected per-step from the host-side schedule controller
(warmup x plateau-scale, see ``train/schedule.py``).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..core.config import OptimizerConfig, TrainingConfig

__all__ = ["TrainState", "make_optimizer", "LRController"]


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_optimizer(train_cfg: TrainingConfig) -> optax.GradientTransformation:
    opt = train_cfg.optimizer
    if opt.type.lower() != "adamw":
        raise ValueError(f"Unsupported optimizer type: {opt.type}")
    return optax.chain(
        optax.clip_by_global_norm(train_cfg.gradient_clip),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=opt.lr,
            b1=opt.betas[0], b2=opt.betas[1],
            eps=opt.eps, weight_decay=opt.weight_decay,
        ),
    )


def set_learning_rate(opt_state, lr):
    """Functionally set the injected learning rate inside the chain state."""
    inner = opt_state[1]
    hp = dict(inner.hyperparams)
    hp["learning_rate"] = lr
    return (opt_state[0], inner._replace(hyperparams=hp))


class LRController:
    """Host-side LR = warmup(step) * plateau_scale (see train/schedule.py)."""

    def __init__(self, train_cfg: TrainingConfig):
        from .schedule import ReduceLROnPlateau
        self.base_lr = train_cfg.optimizer.lr
        sched = train_cfg.scheduler
        self.warmup_steps = sched.warmup_steps
        self.warmup_start_lr = sched.warmup_start_lr
        self.plateau = ReduceLROnPlateau(sched, self.base_lr)

    def lr_at(self, step: int) -> float:
        if self.warmup_steps > 0 and step < self.warmup_steps:
            frac = step / self.warmup_steps
            base = self.warmup_start_lr + (self.base_lr - self.warmup_start_lr) * frac
        else:
            base = self.base_lr
        return base * self.plateau.scale

    def on_validation(self, val_loss: float) -> float:
        return self.plateau.step(val_loss)

    def state_dict(self):
        return {"plateau": self.plateau.state_dict()}

    def load_state_dict(self, d):
        self.plateau.load_state_dict(d["plateau"])


def init_state(params, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))
