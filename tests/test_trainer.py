"""Trainer integration: fit on tiny synthetic MUSDB data, checkpoint, resume,
CLI surfaces."""

import numpy as np
import pytest

from mss_tf_locoformer_tpu.core.config import (Config, DatasetConfig, LossConfig,
                                               ModelConfig, OptimizerConfig,
                                               PathsConfig, SchedulerConfig,
                                               TrainingConfig)
from mss_tf_locoformer_tpu.data import audio_io
from mss_tf_locoformer_tpu.train.loop import Trainer

SR = 8000
STEMS = ("vocals", "drums", "bass", "other")


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
            audio_io.write(str(d / "mixture.wav"), sum(stems.values()), SR, bits=16)
    return tmp_path / "musdb"


def tiny_train_config(root, out, epochs=2):
    return Config(
        dataset=DatasetConfig(root_dir=str(root), sample_rate=SR,
                              segment_length=SR // 2, sources=STEMS),
        model=ModelConfig(n_fft=256, hop_length=128, n_layers=1, emb_dim=16,
                          num_groups=4, n_heads=2, attention_dim=16,
                          ffn_type="swiglu_conv1d", ffn_hidden_dim=32),
        loss=LossConfig(loss_type="si_sdr"),
        training=TrainingConfig(batch_size=2, num_epochs=epochs, num_workers=0,
                                save_interval=1, val_interval=1, log_interval=1,
                                use_amp=False,
                                optimizer=OptimizerConfig(lr=1e-3)),
        paths=PathsConfig(output_dir=str(out)),
        seed=0,
    )


def test_fit_and_resume(musdb_root, tmp_path):
    out = tmp_path / "exp"
    cfg = tiny_train_config(musdb_root, out, epochs=2)
    trainer = Trainer(cfg, verbose=False)
    state = trainer.fit()
    assert int(state.step) > 0
    assert trainer.ckpt.latest_epoch() == 1

    # resume continues from the saved epoch
    cfg2 = tiny_train_config(musdb_root, out, epochs=3)
    trainer2 = Trainer(cfg2, resume="latest", verbose=False)
    state2 = trainer2.fit()
    assert trainer2.start_epoch == 2
    assert int(state2.step) > int(state.step)


def test_cli_parsers():
    from mss_tf_locoformer_tpu.cli.evaluate import parse_args as eval_args
    from mss_tf_locoformer_tpu.cli.separate import parse_args as sep_args
    from mss_tf_locoformer_tpu.cli.train import parse_args as train_args

    a = train_args(["--config", "c.yaml", "--resume", "ckpt"])
    assert a.config == "c.yaml" and a.resume == "ckpt"
    a = sep_args(["--input", "x.wav", "--checkpoint", "ck"])
    assert a.output_dir == "./separated"
    a = eval_args(["--config", "c.yaml", "--checkpoint", "ck", "--save_audio"])
    assert a.save_audio


def test_reference_yaml_configs_load(tmp_path):
    """Our config system must accept the reference's YAML surface."""
    import shutil
    from mss_tf_locoformer_tpu.core.config import load_config
    for name in ("musdb18.yaml", "musdb18_small.yaml",
                 "musdb18_memory_optimized.yaml", "musdb18_ultra_safe.yaml",
                 "musdb18_rtx5090_xlarge.yaml"):
        src = f"/root/reference/configs/{name}"
        cfg = load_config(src)
        assert cfg.model.n_fft in (1024, 2048, 4096)
        assert cfg.training.optimizer.lr > 0


def test_step_profiler_stats(tmp_path):
    from mss_tf_locoformer_tpu.utils.profiling import StepProfiler, step_time_stats
    p = StepProfiler(str(tmp_path), n_steps=0)  # tracing disabled
    for i in range(5):
        p.step_start(i)
        p.step_end(i)
    p.close()
    stats = p.stats()
    assert stats["steps"] == 5
    assert stats["mean_s"] >= 0.0
    assert step_time_stats([]) == {}


def test_step_profiler_trace_window(tmp_path):
    """profile_steps>0 writes a profile trace under log_dir."""
    import os
    from mss_tf_locoformer_tpu.utils.profiling import StepProfiler
    p = StepProfiler(str(tmp_path), n_steps=2, start_step=1)
    import jax.numpy as jnp
    for i in range(4):
        p.step_start(i)
        jnp.ones((8, 8)).sum().block_until_ready()
        p.step_end(i)
    p.close()
    found = [f for root, _, fs in os.walk(tmp_path) for f in fs]
    assert found, "no profiler artifacts written"


def test_chunked_validation_bounded_shapes(musdb_root, tmp_path, rng):
    """Validation cuts arbitrary-length tracks into fixed chunks: at most two
    distinct eval-step shapes (full group + ragged tail) for any mix of track
    lengths, and short tracks are padded rather than dropped."""
    out = tmp_path / "exp"
    cfg = tiny_train_config(musdb_root, out)
    import dataclasses
    cfg = dataclasses.replace(cfg, training=dataclasses.replace(
        cfg.training, val_segment_length=SR // 2, val_batch_size=2))
    trainer = Trainer(cfg, verbose=False)
    state = trainer.init_model(np.zeros((1, SR // 2), np.float32))

    shapes = []
    orig = trainer.eval_step

    def spy(params, mixture, targets, weights=None):
        shapes.append(tuple(mixture.shape))
        return orig(params, mixture, targets, weights=weights)

    trainer.eval_step = spy

    def fake_loader():
        for t in (SR, SR + 1234, SR // 3):  # multi-chunk, ragged, too-short
            mix = (0.1 * rng.standard_normal((1, 2, t))).astype(np.float32)
            yield {"mixture": mix, **{s: 0.25 * mix for s in STEMS}}

    loss = trainer.validate(state, fake_loader())
    assert np.isfinite(loss)
    assert len(set(shapes)) <= 2, shapes
    assert all(s[-1] == SR // 2 for s in shapes)
