"""ESPnet-compat adapter: 3-tuple forward contract + waveform pipeline
(reference plugin ``espnet2/enh/separator/tflocoformer_separator.py:139-186``
and pretrained CLI ``egs2/wsj0_2mix/enh1/separate.py``)."""

from collections import OrderedDict

import jax
import numpy as np
import pytest

from mss_tf_locoformer_tpu.models.espnet_compat import (ESPnetSeparatorAdapter,
                                                        SpeechSeparator)
from mss_tf_locoformer_tpu.models.tflocoformer import TFLocoformerSeparator


@pytest.fixture(scope="module")
def sep_and_params():
    model = TFLocoformerSeparator(num_spk=2, n_layers=1, emb_dim=16,
                                  num_groups=4, n_heads=2, attention_dim=16,
                                  ffn_type="swiglu_conv1d", ffn_hidden_dim=32)
    rng = np.random.default_rng(0)
    spec = (rng.standard_normal((1, 10, 33)) +
            1j * rng.standard_normal((1, 10, 33))).astype(np.complex64)
    params = model.init(jax.random.PRNGKey(0), spec)
    return model, params


def test_adapter_contract(sep_and_params, rng):
    model, params = sep_and_params
    adapter = ESPnetSeparatorAdapter(model, params)
    assert adapter.num_spk == 2
    spec = (rng.standard_normal((2, 12, 33)) +
            1j * rng.standard_normal((2, 12, 33))).astype(np.complex64)
    ilens = np.array([12, 10])
    masked, out_ilens, others = adapter.forward(spec, ilens)
    assert isinstance(masked, list) and len(masked) == 2
    for m in masked:
        assert m.shape == (2, 12, 33)
        assert np.iscomplexobj(np.asarray(m))
    np.testing.assert_array_equal(np.asarray(out_ilens), ilens)
    assert isinstance(others, OrderedDict)


def test_separate_speech_cli(sep_and_params, rng, tmp_path):
    """mss-separate-speech end-to-end: orbax params checkpoint + YAML ->
    per-speaker WAVs at the mixture's length, length-bucketed."""
    import orbax.checkpoint as ocp

    from mss_tf_locoformer_tpu.cli.separate_speech import main
    from mss_tf_locoformer_tpu.utils.audio import load_audio, save_audio

    model, params = sep_and_params
    ck = ocp.StandardCheckpointer()
    ck.save(str(tmp_path / "ckpt"), jax.device_get(params), force=True)
    ck.wait_until_finished()

    sr = 8000
    (tmp_path / "cfg.yaml").write_text("""
task: speech_separation
dataset: {root_dir: /nonexistent, num_spk: 2, sample_rate: 8000}
stft: {n_fft: 64, hop_length: 32}
separator:
  num_spk: 2
  n_layers: 1
  emb_dim: 16
  num_groups: 4
  n_heads: 2
  attention_dim: 16
  ffn_type: swiglu_conv1d
  ffn_hidden_dim: 32
""")
    t = sr + 123  # not a bucket multiple: exercises pad + crop
    mix = (0.1 * rng.standard_normal(t)).astype(np.float32)
    save_audio(str(tmp_path / "mix.wav"), mix, sr, normalize=False)

    main(["--config", str(tmp_path / "cfg.yaml"),
          "--checkpoint", str(tmp_path / "ckpt"),
          "--input", str(tmp_path / "mix.wav"),
          "--output_dir", str(tmp_path / "out"),
          "--bucket_seconds", "0.5"])

    for s in (1, 2):
        est, esr = load_audio(str(tmp_path / "out" / f"mix_spk{s}.wav"))
        assert esr == sr
        assert est.shape == (1, t)
        assert np.all(np.isfinite(est))


def test_speech_separator_waveform(sep_and_params, rng):
    model, params = sep_and_params
    pipe = SpeechSeparator(model, params, n_fft=64, hop_length=32)
    audio = rng.standard_normal((2, 1600), dtype=np.float32)
    out = pipe(audio)
    assert out.shape == (2, 2, 1600)
    assert np.all(np.isfinite(out))
    # mono input gets batched
    out1 = pipe(audio[0])
    assert out1.shape == (1, 2, 1600)
    # std normalization round-trips scale: scaling input scales output
    out_scaled = pipe(audio * 5.0)
    np.testing.assert_allclose(out_scaled, out * 5.0, rtol=1e-3, atol=1e-4)
