"""Jitted train / eval steps with gradient accumulation.

Reference behavior being re-designed (``training/train.py:68-172``): autocast
bf16 forward, loss / accum_steps, backward, clip(5.0), AdamW step on
accumulation boundaries.  TPU-native form: one jitted function per step that
  * runs the bf16 forward+backward (fp32 islands inside the model),
  * microbatches via ``lax.scan`` when ``gradient_accumulation_steps > 1``
    (grads averaged on-device — no optimizer-state churn between micro-steps),
  * clips by global norm and applies the fused optax AdamW update.

The whole step is one XLA program: no per-step host sync except the scalar
losses fetched for logging (the reference syncs every step via
``loss.item()``, ``training/train.py:121,141``).

Sharding: callers place the batch with its leading axis sharded over the
mesh's ``dp`` axis and keep params replicated; XLA's SPMD partitioner then
inserts the gradient all-reduce over ICI automatically (the NCCL-DDP
equivalent).  ``jax.checkpoint`` wraps the loss when
``gradient_checkpointing`` is on — a real rematerialization, unlike the
reference's no-op flag (``training/train.py:336-340``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.config import Config
from ..losses.mss_loss import mss_loss
from .state import TrainState, set_learning_rate

__all__ = ["make_train_step", "make_eval_step", "make_update_step"]


def _loss_fn(model, loss_cfg, params, mixture, targets, dropout_rng, train):
    preds = model.apply(
        params, mixture, deterministic=not train,
        rngs={"dropout": dropout_rng} if train else None)
    ld = mss_loss(preds, targets, loss_cfg)
    return ld["total_loss"], ld


def make_update_step(loss_fn: Callable, tx, accum: int = 1) -> Callable:
    """Shared optimizer step for every trainer (MSS and speech).

    ``loss_fn(params, inputs, targets, rng, train) -> (loss, loss_dict)``
    where ``inputs`` is an array and ``targets`` any array pytree, both with
    a leading batch axis divisible by ``accum``.  Returns
    ``step(state, inputs, targets, lr, rng) -> (state, loss_dict)``; the
    dict gains a pre-clip ``grad_norm`` entry (clipping itself lives in the
    optax chain — exactly once).
    """
    accum = max(1, accum)
    grad_fn = jax.grad(loss_fn, argnums=0, has_aux=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, inputs, targets, lr, rng):
        if accum == 1:
            grads, ld = grad_fn(state.params, inputs, targets, rng, True)
        else:
            micro = inputs.shape[0] // accum

            def split(v):
                return v.reshape(accum, micro, *v.shape[1:])

            in_m = split(inputs)
            tgt_m = jax.tree.map(split, targets)
            rngs = jax.random.split(rng, accum)

            def body(carry, xs):
                g_acc, ld_acc = carry
                in_i, tgt_i, rng_i = xs
                g, ld = grad_fn(state.params, in_i, tgt_i, rng_i, True)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                ld_acc = jax.tree.map(jnp.add, ld_acc, ld)
                return (g_acc, ld_acc), None

            g0 = jax.tree.map(jnp.zeros_like, state.params)
            _, ld_shape = jax.eval_shape(
                lambda: loss_fn(state.params, in_m[0],
                                jax.tree.map(lambda v: v[0], tgt_m),
                                rngs[0], True))
            ld0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), ld_shape)
            (grads, ld), _ = jax.lax.scan(
                body, (g0, ld0), (in_m, tgt_m, rngs))
            grads = jax.tree.map(lambda g: g / accum, grads)
            ld = jax.tree.map(lambda v: v / accum, ld)

        opt_state = set_learning_rate(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        ld["grad_norm"] = optax.global_norm(grads)
        return new_state, ld

    return step


def make_train_step(model, cfg: Config, tx) -> Callable:
    """Returns ``step(state, mixture, targets, lr, rng) -> (state, loss_dict)``.

    ``mixture [B, T]``; ``targets`` dict of ``[B, T]``.  When
    ``gradient_accumulation_steps > 1``, B must be divisible by it.

    gradient_checkpointing is realized as PER-BLOCK remat inside the model
    (the trainer maps the flag onto ModelConfig.remat_blocks); a whole-loss
    jax.checkpoint here would save nothing — the rematerialized forward
    still has to keep every intermediate alive during the backward.
    """
    loss_fn = functools.partial(_loss_fn, model, cfg.loss)
    return make_update_step(loss_fn, tx,
                            cfg.training.gradient_accumulation_steps)


def make_eval_step(model, cfg: Config) -> Callable:
    """Returns ``step(params, mixture, targets, weights=None) -> loss_dict``.

    Without ``weights`` the dict holds the plain batch-mean losses.  With a
    ``[B]`` weight vector, every entry is the weighted mean of PER-SAMPLE
    losses (``sum_i w_i * loss_i / sum_i w_i``) — what chunked validation
    needs when a group mixes full chunks with zero-padded tails (a
    batch-mean scaled by the summed weights would give every chunk an equal
    1/B share regardless of its valid fraction).  The forward runs once on
    the full batch either way; only the cheap loss reduction is vmapped.
    """
    loss_fn = functools.partial(_loss_fn, model, cfg.loss)

    @jax.jit
    def step(params, mixture, targets):
        _, ld = loss_fn(params, mixture, targets, None, False)
        return ld

    @jax.jit
    def weighted_step(params, mixture, targets, weights):
        preds = model.apply(params, mixture, deterministic=True)
        per = jax.vmap(lambda p, t: mss_loss(
            jax.tree.map(lambda x: x[None], p),
            jax.tree.map(lambda x: x[None], t), cfg.loss))(preds, targets)
        w = weights.astype(jnp.float32)
        w = w / jnp.sum(w)
        return jax.tree.map(lambda v: jnp.sum(v * w), per)

    def dispatch(params, mixture, targets, weights=None):
        if weights is None:
            return step(params, mixture, targets)
        return weighted_step(params, mixture, targets, jnp.asarray(weights))

    return dispatch
