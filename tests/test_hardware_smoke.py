"""Hardware (TPU) end-to-end smokes — `TESTS_ON_TPU=1` lane only.

CPU already covers this logic (`test_trainer.py`, `test_separators.py`,
`test_speech_train.py`); what these add is proof the full stacks run on the
REAL chip with the fused Pallas kernels live: trainer fit -> checkpoint ->
resume -> chunked-OLA separation for the MSS family, and forward + PIT
training step for the speech/BS families.  Complex tensors are reduced
on-device (complex D2H is unimplemented over remote-device tunnels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_TPU = jax.default_backend() == "tpu"
pytestmark = pytest.mark.skipif(
    not _TPU, reason="hardware smoke: real-chip lane (TESTS_ON_TPU=1)")

SR = 8000
STEMS = ("vocals", "drums", "bass", "other")


def _musdb_tree(tmp_path, rng):
    from mss_tf_locoformer_tpu.data import audio_io
    for subset, tracks in (("train", 2), ("test", 1)):
        for t in range(tracks):
            d = tmp_path / "musdb" / subset / f"track{t}"
            d.mkdir(parents=True)
            n = SR * 2
            stems = {s: (0.1 * rng.standard_normal((n, 2))).astype(np.float32)
                     for s in STEMS}
            for s, x in stems.items():
                audio_io.write(str(d / f"{s}.wav"), x, SR, bits=16)
            audio_io.write(str(d / "mixture.wav"), sum(stems.values()), SR,
                           bits=16)
    return tmp_path / "musdb"


def test_trainer_fit_resume_separate_on_tpu(tmp_path, rng):
    from mss_tf_locoformer_tpu.core.config import (Config, DatasetConfig,
                                                   LossConfig, ModelConfig,
                                                   OptimizerConfig,
                                                   PathsConfig,
                                                   TrainingConfig)
    from mss_tf_locoformer_tpu.infer.separate import separate_audio
    from mss_tf_locoformer_tpu.train.loop import Trainer

    root = _musdb_tree(tmp_path, rng)
    out = tmp_path / "exp"

    def cfg(epochs):
        return Config(
            dataset=DatasetConfig(root_dir=str(root), sample_rate=SR,
                                  segment_length=SR // 2, sources=STEMS),
            model=ModelConfig(n_fft=256, hop_length=128, n_layers=1,
                              emb_dim=32, num_groups=4, n_heads=2,
                              attention_dim=32, ffn_type="swiglu_conv1d",
                              ffn_hidden_dim=128, dropout=0.1),
            loss=LossConfig(loss_type="si_sdr"),
            training=TrainingConfig(batch_size=2, num_epochs=epochs,
                                    num_workers=2, save_interval=1,
                                    val_interval=1, log_interval=1,
                                    use_amp=True, amp_dtype="bfloat16",
                                    optimizer=OptimizerConfig(lr=1e-3)),
            paths=PathsConfig(output_dir=str(out)),
            seed=0,
        )

    trainer = Trainer(cfg(2), verbose=False)
    state = trainer.fit()
    assert int(state.step) > 0
    assert trainer.ckpt.latest_epoch() == 1

    trainer2 = Trainer(cfg(3), resume="latest", verbose=False)
    state2 = trainer2.fit()
    assert trainer2.start_epoch == 2
    assert int(state2.step) > int(state.step)

    mix = root / "test" / "track0" / "mixture.wav"
    separate_audio(str(mix), str(tmp_path / "sep"), trainer2.model,
                   state2.params, sample_rate=SR, chunk_seconds=1.0,
                   overlap_seconds=0.25, batch_size=2)
    wavs = sorted(p.name for p in (tmp_path / "sep").glob("*.wav"))
    assert len(wavs) == 4, wavs


def _cplx(rng, shape):
    re = rng.standard_normal(shape).astype(np.float32)
    im = rng.standard_normal(shape).astype(np.float32)
    return jax.lax.complex(jnp.asarray(re), jnp.asarray(im))


def test_speech_families_forward_and_pit_step_on_tpu(rng):
    from mss_tf_locoformer_tpu.core.config import SpeechConfig
    from mss_tf_locoformer_tpu.models.bslocoformer import BSLocoformerSeparator
    from mss_tf_locoformer_tpu.models.tflocoformer import TFLocoformerSeparator
    from mss_tf_locoformer_tpu.train.speech import make_speech_step
    from mss_tf_locoformer_tpu.train.state import init_state, make_optimizer

    spec = _cplx(rng, (2, 50, 65))
    mod = TFLocoformerSeparator(num_spk=2, n_layers=2, emb_dim=32,
                                num_groups=4, n_heads=2,
                                flash_attention=True,
                                ffn_type="swiglu_conv1d", ffn_hidden_dim=64)
    params = mod.init(jax.random.PRNGKey(0), spec)
    out = mod.apply(params, spec)
    assert out.shape == (2, 2, 50, 65)
    assert np.isfinite(float(jnp.sum(jnp.abs(out))))

    spec2 = _cplx(rng, (1, 2, 40, 257))  # stereo, stft_size 512
    bs = BSLocoformerSeparator(num_spk=2, n_layers=1, emb_dim=32,
                               num_groups=4, n_heads=2, attention_dim=32,
                               ffn_type="swiglu_conv1d", ffn_hidden_dim=64,
                               sample_rate=44100, stft_size=512,
                               stereo=True, masking=True)
    bparams = bs.init(jax.random.PRNGKey(1), spec2)
    bout = bs.apply(bparams, spec2)
    assert bout.shape == (1, 2, 2, 40, 257)
    assert np.isfinite(float(jnp.sum(jnp.abs(bout))))

    # PIT SI-SNR training step (the speech trainer's jitted step) runs and
    # reduces the loss on real data shapes
    cfg = SpeechConfig()
    tx = make_optimizer(cfg.training)
    state = init_state(params, tx)
    step, _ = make_speech_step(mod, cfg, tx)
    mix = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    refs = jnp.asarray(0.3 * rng.standard_normal((2, 2, 4000))
                       .astype(np.float32))
    state, ld = step(state, mix, refs, 1e-4, jax.random.PRNGKey(3))
    loss0 = float(ld["total_loss"])
    state, ld = step(state, mix, refs, 1e-4, jax.random.PRNGKey(4))
    assert np.isfinite(loss0) and np.isfinite(float(ld["total_loss"]))
    assert float(ld["total_loss"]) < loss0


def test_tp_fused_wrappers_lower_for_tpu_target():
    """The shard_map TP wrappers must LOWER for the real TPU target on
    multi-device AbstractMeshes (no second chip needed): this runs the
    Pallas->Mosaic MLIR pipeline + SPMD spec checks and is what caught the
    partial-manual design ("Mosaic kernels cannot be automatically
    partitioned") that interpret-mode CPU tests cannot see."""
    from jax.sharding import AbstractMesh
    from mss_tf_locoformer_tpu.parallel import tp_fused

    R, L, C, H, A, I, K = 4, 64, 16, 4, 16, 32, 4
    x = jnp.zeros((R, L, C), jnp.float32)
    gamma = jnp.zeros((C,), jnp.float32)
    w_qkv = jnp.zeros((3 * A, C), jnp.float32)
    w_out = jnp.zeros((C, A), jnp.float32)
    cw = jnp.zeros((2 * I, C, K), jnp.float32)
    cb = jnp.zeros((2 * I,), jnp.float32)
    dw = jnp.zeros((I, C, K), jnp.float32)
    for dp, mp in [(1, 2), (2, 2), (2, 4)]:
        mesh = AbstractMesh((dp, mp), ("dp", "mp"))
        lowered = jax.jit(lambda *a: tp_fused.tp_attention_step(
            *a, H, 4, 1e-5, True, 10000.0, 0.0, None, mesh)
        ).lower(x, gamma, w_qkv, w_out)
        assert "tpu_custom_call" in lowered.as_text()
        lowered = jax.jit(lambda *a: tp_fused.tp_ffn_step(
            *a, K, 4, 1e-5, 0.0, None, mesh)).lower(x, gamma, cw, cb, dw)
        assert "tpu_custom_call" in lowered.as_text()


def test_bslocoformer_mss_lane_on_tpu(rng):
    """BS-Locoformer end-to-end lane on the chip: audio->stems forward,
    one optimizer step, and chunked-OLA serving (stereo masking mode —
    the shipped ``configs/musdb18_bslocoformer.yaml`` modes at small dims)."""
    from mss_tf_locoformer_tpu.core.config import (BSModelConfig, Config,
                                                   LossConfig)
    from mss_tf_locoformer_tpu.core.precision import BF16
    from mss_tf_locoformer_tpu.infer.separate import make_engine
    from mss_tf_locoformer_tpu.models import build_model
    from mss_tf_locoformer_tpu.train.state import init_state, make_optimizer
    from mss_tf_locoformer_tpu.train.step import make_train_step

    mcfg = BSModelConfig(name="bslocoformer", n_fft=512, hop_length=256,
                         stft_size=512, sample_rate=44100, n_sources=4,
                         n_layers=1, emb_dim=32, num_groups=4, n_heads=2,
                         attention_dim=32, ffn_type="swiglu_conv1d",
                         ffn_hidden_dim=64, masking=True, stereo=True)
    model = build_model(mcfg, precision=BF16)
    track = (0.1 * rng.standard_normal((2, SR * 2))).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), track[None])
    out = model.apply(params, track[None])
    assert out["vocals"].shape == (1, 2, SR * 2)
    assert np.isfinite(float(jnp.sum(jnp.abs(out["vocals"]))))

    cfg = Config(model=mcfg, loss=LossConfig(loss_type="si_sdr"))
    tx = make_optimizer(cfg.training)
    state = init_state(params, tx)
    step = make_train_step(model, cfg, tx)
    mix = jnp.asarray((0.1 * rng.standard_normal((2, 2, SR)))
                      .astype(np.float32))
    stems = {k: jnp.asarray((0.05 * rng.standard_normal((2, 2, SR)))
                            .astype(np.float32)) for k in STEMS}
    state, ld = step(state, mix, stems, 1e-4, jax.random.PRNGKey(3))
    loss0 = float(ld["total_loss"])
    state, ld = step(state, mix, stems, 1e-4, jax.random.PRNGKey(4))
    assert np.isfinite(loss0) and float(ld["total_loss"]) < loss0

    engine = make_engine(model, state.params, chunk_seconds=1.0,
                         overlap_seconds=0.25, sample_rate=SR, batch_size=2)
    sep = engine(track)
    assert sep["vocals"].shape == track.shape
    assert all(np.all(np.isfinite(v)) for v in sep.values())
