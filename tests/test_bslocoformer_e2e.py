"""BS-Locoformer end-to-end lane: config -> Trainer -> OLA engine -> CLIs.

The reference treats BS-Locoformer as a standalone spec->spec module with no
driver (``standalone/bslocoformer_separator.py:23-270``); BASELINE.json names
"BS-Locoformer 4-stem separation on MUSDB18-HQ" as a config lane, so these
tests pin the full drivable path added here: the ``model.name: bslocoformer``
switch, the audio->stems wrapper, training (mono + stereo), chunked-OLA
serving, CLI separation, and realistic-dims parity vs the reference module.
"""

import os

import numpy as np
import pytest

from mss_tf_locoformer_tpu.core.config import (BSModelConfig, Config,
                                               DatasetConfig, LossConfig,
                                               OptimizerConfig, PathsConfig,
                                               TrainingConfig, load_config)
from mss_tf_locoformer_tpu.data import audio_io
from mss_tf_locoformer_tpu.models import build_model
from mss_tf_locoformer_tpu.models.bslocoformer_mss import BSLocoformerMSS
from mss_tf_locoformer_tpu.core.precision import FP32

SR = 8000
STEMS = ("vocals", "drums", "bass", "other")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_bs_cfg(stereo: bool, **over) -> BSModelConfig:
    # model sample_rate stays 44100: the BS-Roformer band table spans up to
    # 16 kHz, so banding requires a >=32 kHz Nyquist (the reference module
    # has the same constraint); the synthetic test audio itself is 8 kHz
    kw = dict(name="bslocoformer", n_fft=256, hop_length=128, stft_size=256,
              sample_rate=44100, n_sources=4, n_layers=1, emb_dim=16,
              num_groups=4, n_heads=2, attention_dim=16,
              ffn_type="swiglu_conv1d", ffn_hidden_dim=32,
              masking=True, stereo=stereo)
    kw.update(over)
    return BSModelConfig(**kw)


@pytest.fixture
def musdb_root(tmp_path, rng):
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


def bs_train_config(root, out, stereo: bool, epochs=1) -> Config:
    return Config(
        dataset=DatasetConfig(root_dir=str(root), sample_rate=SR,
                              segment_length=SR // 2, sources=STEMS),
        model=tiny_bs_cfg(stereo),
        loss=LossConfig(loss_type="si_sdr"),
        training=TrainingConfig(batch_size=2, num_epochs=epochs,
                                num_workers=0, save_interval=1,
                                val_interval=1, log_interval=1,
                                use_amp=False,
                                optimizer=OptimizerConfig(lr=1e-3)),
        paths=PathsConfig(output_dir=str(out)),
        seed=0,
    )


def test_shipped_yaml_builds_bs_model():
    cfg = load_config(os.path.join(REPO_ROOT, "configs",
                                   "musdb18_bslocoformer.yaml"))
    assert isinstance(cfg.model, BSModelConfig)
    assert cfg.model.stereo and cfg.model.masking
    model = build_model(cfg.model, precision=FP32)
    assert isinstance(model, BSLocoformerMSS)


def test_build_model_rejects_unknown_name():
    from mss_tf_locoformer_tpu.core.config import ModelConfig
    with pytest.raises(ValueError):
        build_model(ModelConfig(name="nope"))


@pytest.mark.parametrize("stereo", [False, True])
def test_bs_trainer_fit_and_resume(musdb_root, tmp_path, stereo):
    from mss_tf_locoformer_tpu.train.loop import Trainer
    out = tmp_path / ("exp_st" if stereo else "exp_mono")
    cfg = bs_train_config(musdb_root, out, stereo, epochs=1)
    trainer = Trainer(cfg, verbose=False)
    assert isinstance(trainer.model, BSLocoformerMSS)
    state = trainer.fit()
    assert int(state.step) > 0
    assert trainer.ckpt.latest_epoch() == 0

    cfg2 = bs_train_config(musdb_root, out, stereo, epochs=2)
    trainer2 = Trainer(cfg2, resume="latest", verbose=False)
    state2 = trainer2.fit()
    assert trainer2.start_epoch == 1
    assert int(state2.step) > int(state.step)


@pytest.mark.parametrize("stereo", [False, True])
def test_bs_engine_chunked_ola(rng, stereo):
    """Chunked-OLA serving through the generic engine, mono and stereo."""
    import jax

    from mss_tf_locoformer_tpu.infer.separate import make_engine

    mcfg = tiny_bs_cfg(stereo)
    model = build_model(mcfg, precision=FP32)
    t = SR * 3
    track = (0.1 * rng.standard_normal((2, t) if stereo else (t,))
             ).astype(np.float32)
    example = track[None]
    params = model.init(jax.random.PRNGKey(0), example)

    engine = make_engine(model, params, chunk_seconds=1.0,
                         overlap_seconds=0.25, sample_rate=SR, batch_size=2)
    stems = engine(track)
    assert set(stems) == set(STEMS)
    for v in stems.values():
        assert v.shape == track.shape
        assert np.all(np.isfinite(v))

    # masking mode at tiny init: output ~ mask * mixture; just check the
    # track reconstructs deterministically across two runs
    stems2 = engine(track)
    np.testing.assert_allclose(stems["vocals"], stems2["vocals"], atol=1e-6)


def test_bs_separate_audio_cli_path(tmp_path, rng):
    """File in -> stems on disk through ``separate_audio`` (the CLI body),
    stereo lane: stems must be true stereo (not duplicated mono)."""
    import jax

    from mss_tf_locoformer_tpu.infer.separate import separate_audio

    mcfg = tiny_bs_cfg(stereo=True)
    model = build_model(mcfg, precision=FP32)
    track = (0.1 * rng.standard_normal((2, SR))).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), track[None])

    wav = tmp_path / "mix.wav"
    audio_io.write(str(wav), track.T, SR, bits=16)
    out = tmp_path / "sep"
    stems = separate_audio(str(wav), str(out), model, params,
                           sample_rate=SR, chunk_seconds=0.5,
                           overlap_seconds=0.1, batch_size=2)
    assert set(stems) == set(STEMS)
    for name, est in stems.items():
        assert est.shape == (2, SR)
        path = out / f"mix_{name}.wav"
        assert path.exists()
        back, back_sr = audio_io.read(str(path))
        assert back_sr == SR and back.shape == (SR, 2)
        # true stereo: masking of a random stereo mixture decorrelates
        # channels (duplicated mono would be bit-identical)
        assert not np.array_equal(back[:, 0], back[:, 1])


@pytest.mark.slow
@pytest.mark.parametrize("masking,stereo", [(True, False), (False, True),
                                            (True, True), (False, False)])
def test_bs_reference_parity_realistic_dims(rng, masking, stereo):
    """Parity vs the reference torch module at REALISTIC dims: the shipped
    lane's banding (stft_size 2048 @ 44.1 kHz -> 62 bands), 2 layers,
    emb 64 (reference ``standalone/bslocoformer_separator.py:23-270``)."""
    torch = pytest.importorskip("torch")
    from mss_tf_locoformer_tpu.convert.torch_ckpt import convert_state_dict
    from mss_tf_locoformer_tpu.models.bslocoformer import BSLocoformerSeparator
    from tests.reference_oracle import reference_standalone_modules

    _, bs_mod = reference_standalone_modules()
    torch.manual_seed(0)
    kw = dict(num_spk=4, n_layers=2, emb_dim=64, norm_type="rmsgroupnorm",
              num_groups=4, n_heads=4, attention_dim=64,
              ffn_type="swiglu_conv1d", ffn_hidden_dim=128,
              sample_rate=44100, stft_size=2048, masking=masking,
              stereo=stereo)
    ref = bs_mod.BSLocoformerSeparator(**kw)
    ref.eval()
    model = BSLocoformerSeparator(**kw)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_state_dict(sd)

    f = 2048 // 2 + 1
    shape = (1, 2, 24, f) if stereo else (1, 24, f)
    spec = (rng.standard_normal(shape) +
            1j * rng.standard_normal(shape)).astype(np.complex64)
    with torch.no_grad():
        want = ref(torch.from_numpy(spec)).numpy()
    got = np.asarray(model.apply(params, spec))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
