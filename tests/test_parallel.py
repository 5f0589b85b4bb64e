"""Sharded-path tests on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from mss_tf_locoformer_tpu.core.config import (Config, LossConfig, ModelConfig,
                                               OptimizerConfig, TrainingConfig)
from mss_tf_locoformer_tpu.models.mss_tflocoformer import TFLocoformerMSS
from mss_tf_locoformer_tpu.parallel import mesh as M
from mss_tf_locoformer_tpu.train.state import init_state, make_optimizer
from mss_tf_locoformer_tpu.train.step import make_train_step


def test_mesh_construction():
    mesh = M.make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp", "mp")
    mesh2 = M.make_mesh(dp=4, mp=2)
    assert mesh2.shape["dp"] == 4 and mesh2.shape["mp"] == 2


def test_activate_mesh_scopes_the_mp_gate():
    """make_mesh's module-global gate is last-call-wins; activate_mesh must
    re-assert (and restore) the gating of the mesh actually in use."""
    from mss_tf_locoformer_tpu.ops.pallas import (model_parallel_active,
                                                  model_parallel_state)

    mp_mesh = M.make_mesh(dp=4, mp=2)
    assert model_parallel_active()
    M.make_mesh()  # dp-only from some other component: gate silently clears
    assert not model_parallel_active()
    with M.activate_mesh(mp_mesh):
        assert model_parallel_active()
        assert model_parallel_state()[1] is mp_mesh
        with M.activate_mesh(None):  # nested single-device scope
            assert not model_parallel_active()
        assert model_parallel_active()
    assert not model_parallel_active()  # prior (dp-only) state restored
    M.make_mesh()  # leave the suite in the default dp-only state


def test_sharded_train_step(rng):
    cfg = Config(
        model=ModelConfig(n_fft=256, hop_length=128, n_layers=1, emb_dim=16,
                          num_groups=4, n_heads=2, attention_dim=16,
                          ffn_type="swiglu_conv1d", ffn_hidden_dim=32),
        loss=LossConfig(loss_type="si_sdr"),
        training=TrainingConfig(optimizer=OptimizerConfig(lr=1e-3)),
    )
    model = TFLocoformerMSS(cfg.model)
    mesh = M.make_mesh()

    b, t = 8, 2000
    stems = {k: 0.3 * rng.standard_normal((b, t)).astype(np.float32)
             for k in ("vocals", "drums", "bass", "other")}
    mixture = sum(stems.values())

    params = model.init(jax.random.PRNGKey(0), mixture[:1])
    tx = make_optimizer(cfg.training)
    state = init_state(params, tx)

    # replicate state, shard batch over dp
    rep = M.replicated(mesh)
    state = jax.device_put(state, rep)
    batch = M.shard_batch(mesh, {"mixture": mixture, **stems})
    mixture_s = batch.pop("mixture")

    step = make_train_step(model, cfg, tx)
    state2, ld = step(state, mixture_s, batch, 1e-3, jax.random.PRNGKey(1))
    assert np.isfinite(float(ld["total_loss"]))
    assert int(state2.step) == 1
    # params stay replicated after the update
    leaf = jax.tree.leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_matches_single_device(rng):
    cfg = Config(
        model=ModelConfig(n_fft=256, hop_length=128, n_layers=1, emb_dim=16,
                          num_groups=4, n_heads=2, attention_dim=16,
                          ffn_type="swiglu_conv1d", ffn_hidden_dim=32),
        loss=LossConfig(loss_type="si_sdr"),
        training=TrainingConfig(optimizer=OptimizerConfig(lr=1e-3)),
    )
    model = TFLocoformerMSS(cfg.model)
    b, t = 8, 2000
    stems = {k: 0.3 * rng.standard_normal((b, t)).astype(np.float32)
             for k in ("vocals", "drums", "bass", "other")}
    mixture = sum(stems.values())
    params = model.init(jax.random.PRNGKey(0), mixture[:1])
    tx = make_optimizer(cfg.training)
    step = make_train_step(model, cfg, tx)
    key = jax.random.PRNGKey(1)

    s_single = init_state(jax.tree.map(jnp.copy, params), tx)
    s_single, ld_single = step(s_single, mixture, stems, 1e-3, key)

    mesh = M.make_mesh()
    s_shard = jax.device_put(init_state(jax.tree.map(jnp.copy, params), tx),
                             M.replicated(mesh))
    batch = M.shard_batch(mesh, {"mixture": mixture, **stems})
    mixture_s = batch.pop("mixture")
    s_shard, ld_shard = step(s_shard, mixture_s, batch, 1e-3, key)

    np.testing.assert_allclose(float(ld_single["total_loss"]),
                               float(ld_shard["total_loss"]), rtol=1e-5)
    # tolerance: fp32 reassociation between the 8-shard psum and the single
    # reduction, amplified to ~lr scale by AdamW's first-step normalizer
    for a, b_ in zip(jax.tree.leaves(s_single.params), jax.tree.leaves(s_shard.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)


def test_tensor_parallel_matches_single_device(rng):
    """dp=4 x mp=2 mesh with Megatron-style param sharding == single device.

    Params (and optimizer moments) are sharded by ``tp_shardings``; XLA's
    SPMD partitioner inserts the head/FFN-inner collectives over mp."""
    from mss_tf_locoformer_tpu.parallel.sharding import tp_shardings, validate_tp

    cfg = Config(
        model=ModelConfig(n_fft=256, hop_length=128, n_layers=1, emb_dim=16,
                          num_groups=4, n_heads=2, attention_dim=16,
                          ffn_type="swiglu_conv1d", ffn_hidden_dim=32),
        loss=LossConfig(loss_type="si_sdr"),
        training=TrainingConfig(optimizer=OptimizerConfig(lr=1e-3)),
    )
    validate_tp(cfg.model, mp=2)
    model = TFLocoformerMSS(cfg.model)
    b, t = 8, 2000
    stems = {k: 0.3 * rng.standard_normal((b, t)).astype(np.float32)
             for k in ("vocals", "drums", "bass", "other")}
    mixture = sum(stems.values())
    params = model.init(jax.random.PRNGKey(0), mixture[:1])
    tx = make_optimizer(cfg.training)
    step = make_train_step(model, cfg, tx)
    key = jax.random.PRNGKey(1)

    s_single = init_state(jax.tree.map(jnp.copy, params), tx)
    s_single, ld_single = step(s_single, mixture, stems, 1e-3, key)

    mesh = M.make_mesh(dp=4, mp=2)
    state = init_state(jax.tree.map(jnp.copy, params), tx)
    s_shard = jax.device_put(state, tp_shardings(state, mesh))
    # at least one weight leaf must actually be partitioned over mp
    shardings = tp_shardings(state, mesh)
    assert any(not s.is_fully_replicated
               for s in jax.tree.leaves(shardings))
    batch = M.shard_batch(mesh, {"mixture": mixture, **stems})
    mixture_s = batch.pop("mixture")
    s_shard, ld_shard = step(s_shard, mixture_s, batch, 1e-3, key)

    np.testing.assert_allclose(float(ld_single["total_loss"]),
                               float(ld_shard["total_loss"]), rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(s_single.params),
                     jax.tree.leaves(s_shard.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)


def test_validate_tp_rejects_uneven_splits():
    from mss_tf_locoformer_tpu.parallel.sharding import validate_tp
    import pytest
    cfg = ModelConfig(n_fft=256, hop_length=128, n_layers=1, emb_dim=16,
                      num_groups=4, n_heads=2, attention_dim=16,
                      ffn_type="swiglu_conv1d", ffn_hidden_dim=31)
    with pytest.raises(ValueError, match="ffn_hidden_dim"):
        validate_tp(cfg, mp=2)


def test_chunk_parallel_inference_matches_single_device(rng):
    """SeparationEngine with a dp-sharded chunk batch == unsharded engine
    (chunk-parallel inference, the TPU answer to full-track forwards)."""
    import jax
    from mss_tf_locoformer_tpu.core.config import ModelConfig
    from mss_tf_locoformer_tpu.infer.overlap_add import SeparationEngine
    from mss_tf_locoformer_tpu.models.mss_tflocoformer import TFLocoformerMSS
    from mss_tf_locoformer_tpu.parallel import mesh as M

    cfg = ModelConfig(n_fft=256, hop_length=128, n_layers=1, emb_dim=16,
                      num_groups=4, n_heads=2, attention_dim=16,
                      ffn_type="swiglu_conv1d", ffn_hidden_dim=32)
    model = TFLocoformerMSS(cfg)
    chunk = 2000
    audio = rng.standard_normal(6 * chunk + 123).astype(np.float32) * 0.2
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, chunk), np.float32))

    def apply_fn(mixture):
        return model.apply(params, mixture)

    plain = SeparationEngine(apply_fn, chunk_samples=chunk, overlap=400,
                             batch_size=8)
    mesh = M.make_mesh(jax.devices()[:8], dp=8, mp=1)
    sharded = SeparationEngine(apply_fn, chunk_samples=chunk, overlap=400,
                               batch_size=8, sharding=M.batch_sharding(mesh))
    out_a = plain(audio)
    out_b = sharded(audio)
    assert set(out_a) == set(out_b)
    for k in out_a:
        np.testing.assert_allclose(out_b[k], out_a[k], atol=1e-5)
