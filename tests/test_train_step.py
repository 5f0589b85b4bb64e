"""Training-step tests: loss decreases on synthetic data; accumulation
equivalence; schedule controllers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mss_tf_locoformer_tpu.core.config import (Config, LossConfig, ModelConfig,
                                               OptimizerConfig, SchedulerConfig,
                                               TrainingConfig)
from mss_tf_locoformer_tpu.core.precision import BF16
from mss_tf_locoformer_tpu.models.mss_tflocoformer import TFLocoformerMSS
from mss_tf_locoformer_tpu.train.schedule import EarlyStopping, ReduceLROnPlateau
from mss_tf_locoformer_tpu.train.state import (LRController, init_state,
                                               make_optimizer)
from mss_tf_locoformer_tpu.train.step import make_eval_step, make_train_step


def tiny_config(**training_kw):
    return Config(
        model=ModelConfig(n_fft=256, hop_length=128, n_layers=1, emb_dim=16,
                          num_groups=4, n_heads=2, attention_dim=16,
                          ffn_type="swiglu_conv1d", ffn_hidden_dim=32),
        loss=LossConfig(loss_type="si_sdr"),
        training=TrainingConfig(optimizer=OptimizerConfig(lr=1e-3), **training_kw),
    )


def synth_batch(rng, b=4, t=2000):
    stems = {k: 0.3 * rng.standard_normal((b, t)).astype(np.float32)
             for k in ("vocals", "drums", "bass", "other")}
    mixture = sum(stems.values())
    return mixture, stems


def test_loss_decreases(rng):
    cfg = tiny_config()
    model = TFLocoformerMSS(cfg.model)
    mixture, targets = synth_batch(rng)
    params = model.init(jax.random.PRNGKey(0), mixture[:1])
    tx = make_optimizer(cfg.training)
    state = init_state(params, tx)
    step = make_train_step(model, cfg, tx)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(12):
        key, sub = jax.random.split(key)
        state, ld = step(state, mixture, targets, 1e-3, sub)
        losses.append(float(ld["total_loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 12


def test_accumulation_matches_full_batch(rng):
    cfg1 = tiny_config(gradient_accumulation_steps=1)
    cfg4 = tiny_config(gradient_accumulation_steps=4)
    model = TFLocoformerMSS(cfg1.model)
    mixture, targets = synth_batch(rng, b=4)
    params = model.init(jax.random.PRNGKey(0), mixture[:1])
    tx = make_optimizer(cfg1.training)

    # copy params: the train step donates its input state buffers
    s1 = init_state(jax.tree.map(jnp.copy, params), tx)
    s4 = init_state(jax.tree.map(jnp.copy, params), tx)
    step1 = make_train_step(model, cfg1, tx)
    step4 = make_train_step(model, cfg4, tx)
    k = jax.random.PRNGKey(2)
    s1, ld1 = step1(s1, mixture, targets, 1e-3, k)
    s4, ld4 = step4(s4, mixture, targets, 1e-3, k)
    # same data -> same mean loss; grads averaged the same way (batch-mean vs
    # mean-of-micro-means with equal micro sizes)
    np.testing.assert_allclose(float(ld1["total_loss"]), float(ld4["total_loss"]),
                               rtol=1e-4)
    # grads match up to fp32 reassociation (different XLA program structure);
    # the AdamW normalizer makes first-step updates ~±lr, so compare with a
    # tolerance well below lr but above reassociation noise.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_eval_step(rng):
    cfg = tiny_config()
    model = TFLocoformerMSS(cfg.model)
    mixture, targets = synth_batch(rng, b=2)
    params = model.init(jax.random.PRNGKey(0), mixture[:1])
    ld = make_eval_step(model, cfg)(params, mixture, targets)
    assert np.isfinite(float(ld["total_loss"]))


def test_eval_step_weighted_is_per_sample(rng):
    """With weights, the eval step must return the weighted mean of
    PER-SAMPLE losses (sum w_i l_i / sum w_i) — not the batch mean rescaled
    — so a mostly-padding validation tail chunk can't claim a full 1/B
    share of a mixed group."""
    cfg = tiny_config()
    model = TFLocoformerMSS(cfg.model)
    mixture, targets = synth_batch(rng, b=2)
    # make sample 1 a zero-padded tail: markedly different loss from 0
    mixture[1, 500:] = 0.0
    for v in targets.values():
        v[1, 500:] = 0.0
    params = model.init(jax.random.PRNGKey(0), mixture[:1])
    step = make_eval_step(model, cfg)

    l0 = float(step(params, mixture[:1],
                    {k: v[:1] for k, v in targets.items()})["total_loss"])
    l1 = float(step(params, mixture[1:],
                    {k: v[1:] for k, v in targets.items()})["total_loss"])
    w = np.array([1.0, 0.25], np.float32)
    got = float(step(params, mixture, targets, weights=w)["total_loss"])
    want = (w[0] * l0 + w[1] * l1) / w.sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # and it must differ from the rescaled batch mean whenever l0 != l1
    assert abs(got - (l0 + l1) / 2) > 1e-6


def test_plateau_controller():
    sched = SchedulerConfig(factor=0.5, patience=2, min_lr=1e-7, cooldown=1)
    ctl = ReduceLROnPlateau(sched, base_lr=1e-3)
    assert ctl.step(1.0) == 1.0          # first is best
    assert ctl.step(0.9) == 1.0          # improvement
    for v in (0.95, 0.95):               # 2 bad epochs tolerated
        assert ctl.step(v) == 1.0
    assert ctl.step(0.95) == 0.5         # 3rd bad -> reduce
    assert ctl.step(0.95) == 0.5         # cooldown swallows one bad epoch
    ctl.step(0.95); ctl.step(0.95)
    assert ctl.step(0.95) == 0.25        # reduces again after patience


def test_plateau_respects_min_lr():
    sched = SchedulerConfig(factor=0.1, patience=0, min_lr=1e-5)
    ctl = ReduceLROnPlateau(sched, base_lr=1e-3)
    ctl.step(1.0)
    for _ in range(10):
        ctl.step(2.0)
    assert ctl.scale >= 1e-5 / 1e-3 - 1e-12


def test_early_stopping():
    from mss_tf_locoformer_tpu.core.config import EarlyStoppingConfig
    es = EarlyStopping(EarlyStoppingConfig(enabled=True, patience=2))
    assert not es.step(1.0)
    assert not es.step(1.1)
    assert es.step(1.2)


def test_lr_controller_warmup():
    tcfg = TrainingConfig(optimizer=OptimizerConfig(lr=1e-3),
                          scheduler=SchedulerConfig(warmup_steps=100))
    ctl = LRController(tcfg)
    assert ctl.lr_at(0) == 0.0
    assert abs(ctl.lr_at(50) - 5e-4) < 1e-9
    assert ctl.lr_at(200) == 1e-3


def test_remat_blocks_grad_matches(rng):
    """Per-block remat changes memory, not math: grads identical."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from mss_tf_locoformer_tpu.core.config import ModelConfig
    from mss_tf_locoformer_tpu.models.mss_tflocoformer import TFLocoformerMSS

    kw = dict(n_fft=256, hop_length=128, n_layers=2, emb_dim=16, num_groups=4,
              n_heads=2, attention_dim=16, ffn_type="swiglu_conv1d",
              ffn_hidden_dim=32, dropout=0.0)
    x = rng.standard_normal((1, 2000)).astype(np.float32)
    m0 = TFLocoformerMSS(ModelConfig(**kw))
    params = m0.init(jax.random.PRNGKey(0), x)
    m1 = TFLocoformerMSS(ModelConfig(**kw, remat_blocks=True))

    def loss(m):
        return lambda p: sum(jnp.sum(v ** 2) for v in m.apply(p, x).values())

    g0 = jax.grad(loss(m0))(params)
    g1 = jax.grad(loss(m1))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
