"""Subprocess worker for the multi-process (multi-host) tests.

Launched by ``tests/test_multihost.py`` as N separate processes, each with
2 virtual CPU devices, joined into one JAX distributed runtime via gloo
collectives — a faithful miniature of a TPU pod slice (one process per
host, one global mesh over every chip).

Usage: python multihost_worker.py <pid> <nproc> <port> <mode> <tmpdir>
Modes:
  trainstep — 3 jitted optimizer steps on a deterministic global batch
              assembled from per-process local rows; writes the loss
              sequence + a param digest for the parent to compare against
              its single-process reference run.
  fit       — full Trainer.fit on a synthetic MUSDB tree (sharded loaders,
              replicated validation, all-process orbax checkpointing),
              then a resume epoch.
"""

import json
import os
import sys


def _setup(pid, nproc, port):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from mss_tf_locoformer_tpu.parallel import multihost as MH
    MH.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 2
    return jax


def _tiny_model_cfg():
    from mss_tf_locoformer_tpu.core.config import ModelConfig
    return ModelConfig(n_fft=256, hop_length=128, n_layers=1, emb_dim=16,
                       num_groups=4, n_heads=2, attention_dim=16,
                       ffn_type="swiglu_conv1d", ffn_hidden_dim=32)


def global_trainstep_batch(t=4000):
    """The deterministic 4-row global batch both the workers and the
    parent's single-process reference use."""
    import numpy as np
    r = np.random.default_rng(42)
    stems = {k: (0.2 * r.standard_normal((4, t))).astype(np.float32)
             for k in ("vocals", "drums", "bass", "other")}
    mixture = sum(stems.values())
    return mixture, stems


def run_trainstep_reference():
    """Single-process dp=4 reference (invoked inline by the parent test)."""
    import jax
    mixture, stems = global_trainstep_batch()
    return _run_steps(jax, jax.devices()[:4], mixture, stems,
                      local_rows=slice(None))


def _run_steps(jax, devices, mixture, stems, local_rows):
    import jax.numpy as jnp  # noqa: F401
    import numpy as np
    from mss_tf_locoformer_tpu.core.config import (Config, LossConfig,
                                                   TrainingConfig)
    from mss_tf_locoformer_tpu.models.mss_tflocoformer import TFLocoformerMSS
    from mss_tf_locoformer_tpu.parallel import mesh as M
    from mss_tf_locoformer_tpu.parallel import multihost as MH
    from mss_tf_locoformer_tpu.train.state import init_state, make_optimizer
    from mss_tf_locoformer_tpu.train.step import make_train_step

    cfg = Config(model=_tiny_model_cfg(), loss=LossConfig(loss_type="si_sdr"),
                 training=TrainingConfig(use_amp=False))
    model = TFLocoformerMSS(cfg.model)
    mesh = M.make_mesh(devices, dp=4, mp=1)
    params = model.init(jax.random.PRNGKey(0), mixture[:1])
    tx = make_optimizer(cfg.training)
    state = MH.replicate(mesh, init_state(params, tx))
    step = make_train_step(model, cfg, tx)
    sharding = M.batch_sharding(mesh)

    batch = MH.put_global({"mixture": mixture[local_rows],
                           **{k: v[local_rows] for k, v in stems.items()}},
                          sharding)
    losses = []
    rng = jax.random.PRNGKey(7)
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        mix = batch["mixture"]
        tgt = {k: batch[k] for k in stems}
        state, ld = step(state, mix, tgt, 1e-3, sub)
        losses.append(float(ld["total_loss"]))
    digest = float(sum(float(jax.numpy.sum(jax.numpy.abs(
        x.astype(jax.numpy.float32)))) for x in jax.tree.leaves(state.params)))
    return losses, digest


def mode_trainstep(jax, pid, tmpdir):
    mixture, stems = global_trainstep_batch()
    losses, digest = _run_steps(jax, jax.devices(), mixture, stems,
                                local_rows=slice(2 * pid, 2 * pid + 2))
    with open(os.path.join(tmpdir, f"out_{pid}.json"), "w") as f:
        json.dump({"losses": losses, "digest": digest}, f)


def mode_fit(jax, pid, tmpdir):
    from mss_tf_locoformer_tpu.core.config import (Config, DatasetConfig,
                                                   LossConfig, MeshConfig,
                                                   OptimizerConfig,
                                                   PathsConfig,
                                                   TrainingConfig)
    from mss_tf_locoformer_tpu.train.loop import Trainer

    sr = 8000
    out = os.path.join(tmpdir, "exp")
    cfg = Config(
        dataset=DatasetConfig(root_dir=os.path.join(tmpdir, "musdb"),
                              sample_rate=sr, segment_length=sr // 2,
                              sources=("vocals", "drums", "bass", "other")),
        model=_tiny_model_cfg(),
        loss=LossConfig(loss_type="si_sdr"),
        training=TrainingConfig(batch_size=4, num_epochs=2, num_workers=0,
                                save_interval=1, val_interval=1,
                                log_interval=1, use_amp=False,
                                optimizer=OptimizerConfig(lr=1e-3)),
        paths=PathsConfig(output_dir=out),
        mesh=MeshConfig(dp=4, mp=1),
        seed=0,
    )
    trainer = Trainer(cfg, verbose=pid == 0)
    assert trainer.n_proc == 2
    trainer.fit()

    # resume for one more epoch: all processes restore the orbax checkpoint
    import dataclasses
    cfg3 = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, num_epochs=3))
    trainer2 = Trainer(cfg3, resume=os.path.join(out, "checkpoints"),
                       verbose=pid == 0)
    state2 = trainer2.fit()
    assert trainer2.start_epoch == 2
    step_after = int(state2.step)

    with open(os.path.join(tmpdir, f"out_{pid}.json"), "w") as f:
        json.dump({"best_val": trainer.best_val_loss,
                   "best_val_resumed": trainer2.best_val_loss,
                   "step_after_resume": step_after}, f)


def mode_fit_speech(jax, pid, tmpdir):
    from mss_tf_locoformer_tpu.core.config import (MeshConfig,
                                                   OptimizerConfig,
                                                   PathsConfig,
                                                   SeparatorConfig,
                                                   SpeechConfig,
                                                   SpeechDatasetConfig,
                                                   SpeechLossConfig,
                                                   STFTConfig,
                                                   TrainingConfig)
    from mss_tf_locoformer_tpu.train.speech import SpeechTrainer

    root = os.path.join(tmpdir, "speech")
    cfg = SpeechConfig(
        dataset=SpeechDatasetConfig(root_dir=root, valid_dir=root,
                                    sample_rate=8000, segment_length=2000,
                                    num_spk=2),
        separator=SeparatorConfig(num_spk=2, n_layers=1, emb_dim=16,
                                  num_groups=4, n_heads=2, attention_dim=16,
                                  ffn_hidden_dim=32),
        stft=STFTConfig(n_fft=128, hop_length=64),
        loss=SpeechLossConfig(criterion="si_snr", wrapper="pit"),
        training=TrainingConfig(batch_size=4, num_epochs=1, num_workers=0,
                                save_interval=1, val_interval=1,
                                log_interval=1, use_amp=False,
                                optimizer=OptimizerConfig(lr=1e-3)),
        paths=PathsConfig(output_dir=os.path.join(tmpdir, "exp_speech")),
        mesh=MeshConfig(dp=4, mp=1), seed=0)
    trainer = SpeechTrainer(cfg, verbose=pid == 0)
    assert trainer.n_proc == 2
    state = trainer.fit()
    with open(os.path.join(tmpdir, f"out_{pid}.json"), "w") as f:
        json.dump({"best_val": trainer.best_val, "step": int(state.step)}, f)


def mode_validate(jax, pid, tmpdir):
    """Sharded pod validation: each process scores only its round-robin
    shard of the val tracks (locally), one allgather merges the meters."""
    import numpy as np
    from mss_tf_locoformer_tpu.core.config import (Config, DatasetConfig,
                                                   LossConfig, MeshConfig,
                                                   PathsConfig,
                                                   TrainingConfig)
    from mss_tf_locoformer_tpu.data.loader import DataLoader
    from mss_tf_locoformer_tpu.train.loop import Trainer

    sr = 8000
    cfg = Config(
        dataset=DatasetConfig(root_dir=os.path.join(tmpdir, "musdb"),
                              sample_rate=sr, segment_length=sr // 2,
                              sources=("vocals", "drums", "bass", "other")),
        model=_tiny_model_cfg(),
        loss=LossConfig(loss_type="si_sdr"),
        training=TrainingConfig(batch_size=4, num_workers=0,
                                val_batch_size=2, use_amp=False),
        paths=PathsConfig(output_dir=os.path.join(tmpdir, "exp_val")),
        mesh=MeshConfig(dp=4, mp=1), seed=0)
    trainer = Trainer(cfg, verbose=False)
    assert trainer.n_proc == 2
    _, val_ds = trainer._datasets()
    loader = DataLoader(val_ds, batch_size=1)
    state = trainer.init_model(np.zeros((1, sr // 2), np.float32))
    val = trainer.validate(state, loader)
    with open(os.path.join(tmpdir, f"out_{pid}.json"), "w") as f:
        json.dump({"val": val, "val_steps": trainer._val_steps}, f)


def mode_evaluate(jax, pid, tmpdir):
    from mss_tf_locoformer_tpu.cli import evaluate as E

    out = os.path.join(tmpdir, "eval_out")
    E.main(["--config", os.path.join(tmpdir, "eval.yaml"),
            "--checkpoint", os.path.join(tmpdir, "ckpt"),
            "--output_dir", out, "--chunk_seconds", "0.25",
            "--overlap_seconds", "0.05", "--batch_size", "1"])
    results = os.path.join(out, "results.json")
    with open(os.path.join(tmpdir, f"out_{pid}.json"), "w") as f:
        json.dump({"rank": pid,
                   "results_exists": os.path.exists(results)}, f)


def main():
    pid, nproc, port, mode, tmpdir = (int(sys.argv[1]), int(sys.argv[2]),
                                      sys.argv[3], sys.argv[4], sys.argv[5])
    jax = _setup(pid, nproc, port)
    if mode == "trainstep":
        mode_trainstep(jax, pid, tmpdir)
    elif mode == "fit":
        mode_fit(jax, pid, tmpdir)
    elif mode == "fit_speech":
        mode_fit_speech(jax, pid, tmpdir)
    elif mode == "evaluate":
        mode_evaluate(jax, pid, tmpdir)
    elif mode == "validate":
        mode_validate(jax, pid, tmpdir)
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(f"worker {pid} mode {mode}: OK", flush=True)


if __name__ == "__main__":
    main()
