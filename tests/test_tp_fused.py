"""shard_map-wrapped fused block steps under model-parallel meshes.

Round-2 simply disabled every fused Pallas kernel when ``mp > 1`` (the
kernels carry no SPMD rules); ``parallel/tp_fused.py`` re-enables the two
fully fused BLOCK steps by running them inside ``jax.shard_map`` with
heads / FFN-inner channels split over ``mp`` and one explicit psum.

CPU coverage notes:

* the wrappers are FULLY manual over both mesh axes everywhere (the TPU
  lowering rejects partial-auto around Mosaic custom calls; see the
  AbstractMesh lowering test in ``test_hardware_smoke.py``).  dp x mp
  EXECUTION (not just lowering) is covered at dp=2 x mp=2 — a 4-device
  fully-manual interpret mesh runs forward AND backward on this host.
  An 8-device (dp=4, mp=2) fully-manual interpret mesh still never
  finishes on this 1-core box (>380 s vs 50 s at 4 devices; interpret
  mode serializes every shard's io_callback chain through the single
  XLA CPU thread, and the per-step psum rendezvous multiplies the
  serialized chains), so 8-device coverage stays lowering-only.
* the in-kernel dropout sites draw from the TPU PRNG, which yields zeros
  under interpret mode; dropout variants are TPU-only (matching
  ``test_attention_block.py``).
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mss_tf_locoformer_tpu.ops import pallas as P
from mss_tf_locoformer_tpu.ops.pallas import attention_block as AB
from mss_tf_locoformer_tpu.ops.pallas import swiglu_block as SB
from mss_tf_locoformer_tpu.parallel import mesh as M
from mss_tf_locoformer_tpu.parallel.tp_fused import (tp_attention_step,
                                                     tp_ffn_step)

_TPU = jax.default_backend() == "tpu"


def _ctx():
    return contextlib.nullcontext() if _TPU else pltpu.force_tpu_interpret_mode()


@pytest.fixture(autouse=True)
def _tp_mesh_state():
    P.force_tp_fused_for_testing(True)
    yield
    P.force_tp_fused_for_testing(False)
    P.set_model_parallel(False)


def _mp_mesh(mp):
    if len(jax.devices()) < mp:
        pytest.skip(f"needs {mp} devices")
    return M.make_mesh(jax.devices()[:mp], dp=1, mp=mp)


def _dp_mp_mesh(dp, mp):
    if len(jax.devices()) < dp * mp:
        pytest.skip(f"needs {dp * mp} devices")
    return M.make_mesh(jax.devices()[:dp * mp], dp=dp, mp=mp)


def _attn_args(rng, r=2, l=64, c=16, a=16):
    x = (0.5 * rng.standard_normal((r, l, c))).astype(np.float32)
    gamma = (1.0 + 0.1 * rng.standard_normal(c)).astype(np.float32)
    w_qkv = (rng.standard_normal((3 * a, c)) / np.sqrt(c)).astype(np.float32)
    w_out = (rng.standard_normal((c, a)) / np.sqrt(a)).astype(np.float32)
    return tuple(map(jnp.asarray, (x, gamma, w_qkv, w_out)))


def _ffn_args(rng, r=2, l=64, c=16, inner=32, k=4):
    x = (0.5 * rng.standard_normal((r, l, c))).astype(np.float32)
    gamma = (1.0 + 0.1 * rng.standard_normal(c)).astype(np.float32)
    cw = (rng.standard_normal((2 * inner, c, k)) / np.sqrt(c * k)
          ).astype(np.float32)
    cb = (0.1 * rng.standard_normal(2 * inner)).astype(np.float32)
    dw = (rng.standard_normal((inner, c, k)) / np.sqrt(inner)
          ).astype(np.float32)
    return tuple(map(jnp.asarray, (x, gamma, cw, cb, dw)))


# ----------------------------------------------------------- forward parity

@pytest.mark.parametrize("mp,h", [(2, 2), (2, 4), (4, 4)])
def test_tp_attention_forward_parity(rng, mp, h):
    mesh = _mp_mesh(mp)
    x, gamma, w_qkv, w_out = _attn_args(rng)
    want = np.asarray(AB.reference_attention_block(
        x, gamma, w_qkv, w_out, h, 4, 1e-5, True, 10000.0, residual=False))
    with _ctx():
        got = np.asarray(tp_attention_step(
            x, gamma, w_qkv, w_out, h, 4, 1e-5, True, 10000.0, 0.0, None,
            mesh))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=2e-3)


@pytest.mark.parametrize("mp", [2, 4])
def test_tp_ffn_forward_parity(rng, mp):
    mesh = _mp_mesh(mp)
    x, gamma, cw, cb, dw = _ffn_args(rng)
    db0 = jnp.zeros((x.shape[-1],), jnp.float32)
    want = np.asarray(SB.reference_norm_ffn_residual(
        x, gamma, cw, cb, dw, db0, 4, 4, 1e-5, residual=False))
    with _ctx():
        got = np.asarray(tp_ffn_step(
            x, gamma, cw, cb, dw, 4, 4, 1e-5, 0.0, None, mesh))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=2e-3)


# ---------------------------------------------------------------- gradients

def test_shard_seed_stride_avoids_in_kernel_collisions():
    """The shard fold must NOT reuse the golden-ratio stride the in-kernel
    generators mix (tile, head, q-subtile) indices with: with the same
    constant, shard idx+1 at tile t replays shard idx's tile t+1 mask
    bit-for-bit.  Assert the per-(shard, tile) seed words stay pairwise
    distinct across realistic index ranges."""
    from mss_tf_locoformer_tpu.parallel.tp_fused import _SHARD_SEED_STRIDE

    g = int(AB._PROB_TILE_STRIDE) & 0xFFFFFFFF
    a = int(_SHARD_SEED_STRIDE) & 0xFFFFFFFF
    assert a != g
    assert int(SB._TILE_SEED_STRIDE) & 0xFFFFFFFF == g  # both kernels use G
    shards = np.arange(16, dtype=np.int64)       # dp*mp shard indices
    tiles = np.arange(1, 8193, dtype=np.int64)   # (t+1)/head*1024+qt mixes
    seeds = (shards[:, None] * a + tiles[None, :] * g) % (1 << 32)
    assert np.unique(seeds).size == seeds.size
    # the old (collision) choice fails this: same stride for both folds
    bad = (shards[:, None] * g + tiles[None, :] * g) % (1 << 32)
    assert np.unique(bad).size < bad.size


def test_tp_attention_grad_parity(rng):
    """All four cotangents through shard_map + psum + the fused backward
    kernel vs jax.vjp of the unfused reference (residual=False mode)."""
    mesh = _mp_mesh(2)
    args = _attn_args(rng)
    cot = jnp.asarray(rng.standard_normal(args[0].shape).astype(np.float32))

    def f_tp(*a):
        return jnp.vdot(tp_attention_step(*a, 2, 4, 1e-5, True, 10000.0,
                                          0.0, None, mesh), cot)

    def f_ref(*a):
        return jnp.vdot(AB.reference_attention_block(
            *a, 2, 4, 1e-5, True, 10000.0, residual=False), cot)

    with _ctx():
        got = jax.grad(f_tp, argnums=(0, 1, 2, 3))(*args)
    want = jax.grad(f_ref, argnums=(0, 1, 2, 3))(*args)
    for g, w in zip(got, want):
        scale = max(np.abs(np.asarray(w)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4 * scale, rtol=2e-3)


def test_tp_ffn_grad_parity(rng):
    mesh = _mp_mesh(2)
    args = _ffn_args(rng)
    cot = jnp.asarray(rng.standard_normal(args[0].shape).astype(np.float32))
    db0 = jnp.zeros((args[0].shape[-1],), jnp.float32)

    def f_tp(*a):
        return jnp.vdot(tp_ffn_step(*a, 4, 4, 1e-5, 0.0, None, mesh), cot)

    def f_ref(*a):
        return jnp.vdot(SB.reference_norm_ffn_residual(
            *a, db0, 4, 4, 1e-5, residual=False), cot)

    with _ctx():
        got = jax.grad(f_tp, argnums=(0, 1, 2, 3, 4))(*args)
    want = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for g, w in zip(got, want):
        scale = max(np.abs(np.asarray(w)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4 * scale, rtol=2e-3)


# ----------------------------------------------- dp x mp EXECUTION (not
# lowering): rows split over dp AND heads/channels over mp on a 4-device
# fully-manual mesh, forward + all cotangents, vs the single-device oracle.

@pytest.mark.slow
def test_tp_attention_dp2_mp2_executes(rng):
    mesh = _dp_mp_mesh(2, 2)
    args = _attn_args(rng, r=4)  # 2 rows per dp shard
    cot = jnp.asarray(rng.standard_normal(args[0].shape).astype(np.float32))

    def f_tp(*a):
        return jnp.vdot(tp_attention_step(*a, 2, 4, 1e-5, True, 10000.0,
                                          0.0, None, mesh), cot)

    def f_ref(*a):
        return jnp.vdot(AB.reference_attention_block(
            *a, 2, 4, 1e-5, True, 10000.0, residual=False), cot)

    with _ctx():
        out = np.asarray(tp_attention_step(
            *args, 2, 4, 1e-5, True, 10000.0, 0.0, None, mesh))
        got = jax.grad(f_tp, argnums=(0, 1, 2, 3))(*args)
    want_out = np.asarray(AB.reference_attention_block(
        *args, 2, 4, 1e-5, True, 10000.0, residual=False))
    scale = max(np.abs(want_out).max(), 1.0)
    np.testing.assert_allclose(out, want_out, atol=2e-4 * scale, rtol=2e-3)
    want = jax.grad(f_ref, argnums=(0, 1, 2, 3))(*args)
    for g, w in zip(got, want):
        s = max(np.abs(np.asarray(w)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4 * s, rtol=2e-3)


@pytest.mark.slow
def test_tp_ffn_dp2_mp2_executes(rng):
    mesh = _dp_mp_mesh(2, 2)
    args = _ffn_args(rng, r=4)
    cot = jnp.asarray(rng.standard_normal(args[0].shape).astype(np.float32))
    db0 = jnp.zeros((args[0].shape[-1],), jnp.float32)

    def f_tp(*a):
        return jnp.vdot(tp_ffn_step(*a, 4, 4, 1e-5, 0.0, None, mesh), cot)

    def f_ref(*a):
        return jnp.vdot(SB.reference_norm_ffn_residual(
            *a, db0, 4, 4, 1e-5, residual=False), cot)

    with _ctx():
        got = jax.grad(f_tp, argnums=(0, 1, 2, 3, 4))(*args)
    want = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for g, w in zip(got, want):
        s = max(np.abs(np.asarray(w)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4 * s, rtol=2e-3)


# ------------------------------------------------------------ gates / specs

def test_tp_gates_respect_divisibility(monkeypatch):
    """Under a tp-fused mesh the step gates apply PER-SHARD shapes and
    refuse splits that don't divide heads / inner channels."""
    from mss_tf_locoformer_tpu.nn.attention import attn_step_applicable
    from mss_tf_locoformer_tpu.nn.ffn import block_step_applicable

    _mp_mesh(2)
    assert P.tp_fused_mesh() is not None
    # heads 4 / inner 384 divide mp=2: fused TP steps admitted
    assert attn_step_applicable("rmsgroupnorm", True, 96, 96, 4, 256)
    assert block_step_applicable("rmsgroupnorm", "swiglu_conv1d", True,
                                 4, 1, 256, 384, 96)
    # odd head count / inner dim: back to the XLA fallbacks
    assert not attn_step_applicable("rmsgroupnorm", True, 96, 96, 3, 256)
    assert not block_step_applicable("rmsgroupnorm", "swiglu_conv1d", True,
                                     4, 1, 256, 383, 96)
    # plain (non-block) fused kernels stay disabled under mp>1
    assert not P.pallas_enabled()


def test_tp_mesh_requires_tpu_or_force():
    """Without the testing override the TP wrappers only engage on a real
    TPU backend — the CPU dryrun keeps the XLA fallbacks."""
    P.force_tp_fused_for_testing(False)
    _mp_mesh(2)
    assert (P.tp_fused_mesh() is not None) == P.on_tpu()


# ----------------------------------------------------- TPU-target lowering

def test_train_step_lowers_for_tpu_target(rng):
    """Lower the FULL train step with the TP wrappers active for the real
    TPU target on a 2x2 AbstractMesh — from the CPU backend.  This runs the
    Pallas->Mosaic MLIR pipeline and GSPMD spec checks that interpret-mode
    execution skips entirely (it is what caught the partial-manual design
    Mosaic refuses to partition) and asserts the fused kernels actually
    appear in the multi-chip program."""
    from jax.sharding import AbstractMesh, NamedSharding
    from jax.sharding import PartitionSpec as PS
    from mss_tf_locoformer_tpu.core.config import (Config, LossConfig,
                                                   ModelConfig,
                                                   OptimizerConfig,
                                                   TrainingConfig)
    from mss_tf_locoformer_tpu.models.mss_tflocoformer import TFLocoformerMSS
    from mss_tf_locoformer_tpu.parallel.sharding import tp_shardings
    from mss_tf_locoformer_tpu.train.state import init_state, make_optimizer
    from mss_tf_locoformer_tpu.train.step import make_train_step

    cfg = Config(
        model=ModelConfig(n_fft=128, hop_length=64, n_layers=1, emb_dim=16,
                          num_groups=4, n_heads=2, attention_dim=16,
                          ffn_type="swiglu_conv1d", ffn_hidden_dim=32,
                          flash_attention=True, fused_ffn=True,
                          fused_stft=False),
        loss=LossConfig(loss_type="si_sdr"),
        training=TrainingConfig(optimizer=OptimizerConfig(lr=1e-3)),
    )
    model = TFLocoformerMSS(cfg.model)
    b, t = 2, 1000
    tx = make_optimizer(cfg.training)

    # shapes are traced BEFORE the mesh activates: init runs batch-1, whose
    # rows don't divide dp=2 (init itself runs un-TP'd in production too —
    # params are initialized once, then device_put to the TP shardings)
    params_sd = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                               jax.ShapeDtypeStruct((1, t), jnp.float32))
    state_sd = jax.eval_shape(lambda p: init_state(p, tx), params_sd)

    amesh = AbstractMesh((2, 2), ("dp", "mp"))
    P.set_model_parallel(True, amesh)
    assert P.tp_fused_mesh() is amesh
    state_sd = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        state_sd, tp_shardings(state_sd, amesh))
    bsh = NamedSharding(amesh, PS("dp"))
    mix_sd = jax.ShapeDtypeStruct((b, t), jnp.float32, sharding=bsh)
    stems_sd = {k: jax.ShapeDtypeStruct((b, t), jnp.float32, sharding=bsh)
                for k in ("vocals", "drums", "bass", "other")}

    step = make_train_step(model, cfg, tx)
    txt = step.trace(state_sd, mix_sd, stems_sd, 1e-3, jax.random.PRNGKey(1)
                     ).lower(lowering_platforms=("tpu",)).as_text()
    # fused attention + FFN kernels, forward AND backward, must be in the
    # multi-chip program (sub-step fusions may add more)
    assert txt.count("tpu_custom_call") >= 4


# ------------------------------------------------------- module integration

def test_train_step_runs_tp_fused(rng, monkeypatch):
    """One full optimizer step (STFT -> blocks -> loss -> grads -> AdamW)
    with the TP wrappers serving both fused sub-steps on an mp=2 mesh,
    vs the SAME params stepped through the single-device fused kernels.
    Proves the shard_map wrappers compose with jit + custom-vjp + optax,
    not just with a bare block apply."""
    from mss_tf_locoformer_tpu.core.config import (Config, LossConfig,
                                                   ModelConfig,
                                                   OptimizerConfig,
                                                   TrainingConfig)
    from mss_tf_locoformer_tpu.models.mss_tflocoformer import TFLocoformerMSS
    from mss_tf_locoformer_tpu.train.state import init_state, make_optimizer
    from mss_tf_locoformer_tpu.train.step import make_train_step

    monkeypatch.setattr(P, "on_tpu", lambda: True)
    cfg = Config(
        model=ModelConfig(n_fft=128, hop_length=64, n_layers=1, emb_dim=16,
                          num_groups=4, n_heads=2, attention_dim=16,
                          ffn_type="swiglu_conv1d", ffn_hidden_dim=32,
                          flash_attention=True, fused_ffn=True,
                          fused_stft=False),
        loss=LossConfig(loss_type="si_sdr"),
        training=TrainingConfig(optimizer=OptimizerConfig(lr=1e-3)),
    )
    model = TFLocoformerMSS(cfg.model)
    b, t = 1, 1000
    stems = {k: 0.3 * rng.standard_normal((b, t)).astype(np.float32)
             for k in ("vocals", "drums", "bass", "other")}
    mixture = sum(stems.values())
    tx = make_optimizer(cfg.training)
    step = make_train_step(model, cfg, tx)
    key = jax.random.PRNGKey(1)

    mesh = _mp_mesh(2)
    with _ctx():
        params = model.init(jax.random.PRNGKey(0), mixture[:1])
        s_tp = init_state(jax.tree.map(jnp.copy, params), tx)
        s_tp, ld_tp = step(s_tp, mixture, stems, 1e-3, key)
        loss_tp = float(ld_tp["total_loss"])

    P.set_model_parallel(False)  # single-device fused path, same params
    assert P.tp_fused_mesh() is None and P.pallas_enabled()
    # fresh jit instance: the path gates are read at TRACE time, so reusing
    # `step` would silently replay the TP-compiled executable
    step_sd = make_train_step(model, cfg, tx)
    with _ctx():
        s_sd = init_state(jax.tree.map(jnp.copy, params), tx)
        s_sd, ld_sd = step_sd(s_sd, mixture, stems, 1e-3, key)
    np.testing.assert_allclose(loss_tp, float(ld_sd["total_loss"]),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(s_sd.params), jax.tree.leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)
    del mesh


def test_tp_inference_through_separation_engine(rng, monkeypatch):
    """Chunked-OLA separation with the model's fused steps running through
    the TP wrappers on an mp=2 mesh == the same engine on the single-device
    fused path (TP serving: model sharded over mp, chunk batch over dp)."""
    from mss_tf_locoformer_tpu.core.config import ModelConfig
    from mss_tf_locoformer_tpu.infer.overlap_add import SeparationEngine
    from mss_tf_locoformer_tpu.models.mss_tflocoformer import TFLocoformerMSS

    monkeypatch.setattr(P, "on_tpu", lambda: True)
    cfg = ModelConfig(n_fft=128, hop_length=64, n_layers=1, emb_dim=16,
                      num_groups=4, n_heads=2, attention_dim=16,
                      ffn_type="swiglu_conv1d", ffn_hidden_dim=32,
                      flash_attention=True, fused_ffn=True, fused_stft=False)
    model = TFLocoformerMSS(cfg)
    track = (0.1 * rng.standard_normal(3000)).astype(np.float32)

    mesh = _mp_mesh(2)
    with _ctx():
        params = model.init(jax.random.PRNGKey(0),
                            np.zeros((1, 1024), np.float32))
        apply_fn = lambda m: model.apply(params, m)
        eng = SeparationEngine(apply_fn, chunk_samples=1024, overlap=256,
                               batch_size=2)
        got = {k: np.asarray(v) for k, v in eng(track).items()}

    P.set_model_parallel(False)
    assert P.pallas_enabled()
    with _ctx():
        eng_sd = SeparationEngine(lambda m: model.apply(params, m),
                                  chunk_samples=1024, overlap=256,
                                  batch_size=2)
        want = {k: np.asarray(v) for k, v in eng_sd(track).items()}
    assert set(got) == set(want)
    for k in want:
        scale = max(np.abs(want[k]).max(), 1e-3)
        np.testing.assert_allclose(got[k], want[k], atol=2e-4 * scale,
                                   rtol=2e-3)
    del mesh


def test_block_runs_tp_fused_end_to_end(rng, monkeypatch):
    """LocoformerBlock routes both sub-steps through the TP wrappers under
    an mp mesh and matches the SAME params run through the single-device
    fused kernels (on_tpu patched so both builds pick the fused param
    layout)."""
    from mss_tf_locoformer_tpu.nn.blocks import LocoformerBlock

    monkeypatch.setattr(P, "on_tpu", lambda: True)
    block = LocoformerBlock(emb_dim=16, num_groups=4, n_heads=2,
                            flash_attention=True, attention_dim=16,
                            ffn_type="swiglu_conv1d", ffn_hidden_dim=32,
                            conv1d_kernel=4, conv1d_shift=1,
                            fused_ffn=True, dtype=jnp.float32)
    x = jnp.asarray(0.5 * rng.standard_normal((1, 3, 48, 16)), jnp.float32)

    mesh = _mp_mesh(2)
    assert P.tp_fused_mesh() is not None
    with _ctx():
        params = block.init(jax.random.PRNGKey(0), x)
        got = np.asarray(block.apply(params, x))

    # single-device fused path: clear the mp mesh, keep on_tpu patched
    P.set_model_parallel(False)
    assert P.tp_fused_mesh() is None and P.pallas_enabled()
    with _ctx():
        want = np.asarray(block.apply(params, x))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=2e-3)
    del mesh
