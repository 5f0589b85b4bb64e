"""Speech-separation training: end-to-end on a tiny synthetic corpus
(TPU-native counterpart of the reference's external ESPnet recipe path)."""

import numpy as np
import pytest

from mss_tf_locoformer_tpu.core.config import (OptimizerConfig, PathsConfig,
                                               SeparatorConfig, SpeechConfig,
                                               SpeechDatasetConfig,
                                               SpeechLossConfig, STFTConfig,
                                               TrainingConfig,
                                               load_speech_config,
                                               speech_config_from_dict)
from mss_tf_locoformer_tpu.utils.audio import save_audio


@pytest.fixture
def corpus(tmp_path, rng):
    for sub in ("tr", "cv"):
        for d in ("mix", "s1", "s2"):
            (tmp_path / sub / d).mkdir(parents=True)
        for utt in ("a.wav", "b.wav", "c.wav", "d.wav"):
            s1 = 0.1 * rng.standard_normal(6000).astype(np.float32)
            s2 = 0.1 * rng.standard_normal(6000).astype(np.float32)
            save_audio(str(tmp_path / sub / "s1" / utt), s1, 8000, normalize=False)
            save_audio(str(tmp_path / sub / "s2" / utt), s2, 8000, normalize=False)
            save_audio(str(tmp_path / sub / "mix" / utt), s1 + s2, 8000,
                       normalize=False)
    return tmp_path


def _config(corpus, out, criterion="si_snr", wrapper="pit"):
    return SpeechConfig(
        dataset=SpeechDatasetConfig(root_dir=str(corpus / "tr"),
                                    valid_dir=str(corpus / "cv"),
                                    num_spk=2, segment_length=4000),
        separator=SeparatorConfig(num_spk=2, n_layers=1, emb_dim=16,
                                  num_groups=4, n_heads=2, attention_dim=16,
                                  ffn_type="swiglu_conv1d", ffn_hidden_dim=32),
        stft=STFTConfig(n_fft=64, hop_length=32),
        loss=SpeechLossConfig(criterion=criterion, wrapper=wrapper),
        training=TrainingConfig(batch_size=2, num_epochs=2, num_workers=0,
                                optimizer=OptimizerConfig(lr=1e-3),
                                save_interval=1, val_interval=1,
                                log_interval=100),
        paths=PathsConfig(output_dir=str(out)),
        seed=3,
    )


def test_speech_training_loss_decreases(corpus, tmp_path):
    from mss_tf_locoformer_tpu.train.speech import SpeechTrainer
    trainer = SpeechTrainer(_config(corpus, tmp_path / "exp"), verbose=False)
    import jax
    import jax.numpy as jnp
    from mss_tf_locoformer_tpu.data.loader import DataLoader
    from mss_tf_locoformer_tpu.data.speech import SpeechMixtureDataset

    state = trainer.fit()
    assert int(state.step) >= 4  # 2 epochs x 2 batches

    # validation loss of the final state beats a fresh init
    ds = SpeechMixtureDataset(str(corpus / "cv"), num_spk=2,
                              segment_length=4000, sample_rate=8000,
                              random_crop=False)
    batch = next(iter(DataLoader(ds, batch_size=2)))
    mix, src = trainer._mono(batch)
    final = float(trainer.eval_fn(state.params, mix, src))
    spec0 = jnp.swapaxes(
        __import__("mss_tf_locoformer_tpu.ops.stft", fromlist=["stft"]).stft(
            jnp.asarray(mix[:1]), 64, 32), -1, -2)
    fresh = trainer.module.init(jax.random.PRNGKey(123), spec0)
    init = float(trainer.eval_fn(fresh, mix, src))
    assert final < init


def test_speech_training_mr_l1_fixed_order(corpus, tmp_path):
    from mss_tf_locoformer_tpu.train.speech import SpeechTrainer
    cfg = _config(corpus, tmp_path / "exp2", criterion="mr_l1_tfd",
                  wrapper="fixed_order")
    trainer = SpeechTrainer(cfg, verbose=False)
    state = trainer.fit()
    assert int(state.step) >= 4


def test_evaluate_speech_cli_end_to_end(corpus, tmp_path):
    """Train briefly, then drive the evaluate-speech CLI on the trainer's
    orbax output: PIT-resolved SI-SNR/SDR/STOI per utterance + results.json."""
    import json

    import yaml

    from mss_tf_locoformer_tpu.cli.evaluate_speech import main
    from mss_tf_locoformer_tpu.train.speech import SpeechTrainer

    import dataclasses
    cfg = _config(corpus, tmp_path / "exp3")
    cfg = dataclasses.replace(cfg, training=dataclasses.replace(
        cfg.training, num_epochs=1))
    SpeechTrainer(cfg, verbose=False).fit()

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "task": "speech_separation",
        "dataset": {"root_dir": str(corpus / "tr"),
                    "valid_dir": str(corpus / "cv"),
                    "num_spk": 2, "sample_rate": 8000},
        "stft": {"n_fft": 64, "hop_length": 32},
        "separator": {"num_spk": 2, "n_layers": 1, "emb_dim": 16,
                      "num_groups": 4, "n_heads": 2, "attention_dim": 16,
                      "ffn_type": "swiglu_conv1d", "ffn_hidden_dim": 32},
    }))
    main(["--config", str(cfg_path),
          "--checkpoint", str(tmp_path / "exp3" / "checkpoints" / "best"),
          "--output_dir", str(tmp_path / "eval"), "--max_utts", "2"])
    with open(tmp_path / "eval" / "results.json") as f:
        res = json.load(f)
    assert len(res["per_utterance"]) == 2
    assert all(np.isfinite(v) for v in res["mean"].values())
    assert 0.0 <= res["mean"]["stoi"] <= 1.0


def test_speech_yaml_configs_load():
    for name in ("speech_wsj0_2mix", "speech_whamr", "speech_whamr_nope",
                 "speech_dns"):
        cfg = load_speech_config(f"configs/{name}.yaml")
        assert cfg.separator.num_spk in (1, 2)
        assert cfg.training.scheduler.warmup_steps == 4000


def test_speech_config_rejects_unknown_key():
    with pytest.raises(ValueError):
        speech_config_from_dict({"separater": {}})
    with pytest.raises(ValueError):
        speech_config_from_dict({"loss": {"criterion": "nope"}})
