"""Inference (chunked OLA) and evaluation metric tests."""

import jax
import numpy as np
import pytest

from mss_tf_locoformer_tpu.core.config import ModelConfig
from mss_tf_locoformer_tpu.eval import metrics as M
from mss_tf_locoformer_tpu.infer.overlap_add import SeparationEngine, triangular_window
from mss_tf_locoformer_tpu.models.mss_tflocoformer import TFLocoformerMSS


def test_triangular_window_ola_sums_to_one():
    w = triangular_window(100, 20)
    hop = 80
    env = np.zeros(hop * 5 + 100)
    for i in range(6):
        env[i * hop:i * hop + 100] += w
    # interior fully covered region sums to ~1
    np.testing.assert_allclose(env[100:-100], 1.0, atol=1e-6)


def test_ola_identity_model(rng):
    """With an identity 'model', chunked OLA must reconstruct the input."""
    def apply_fn(mixture):
        return {"vocals": mixture}

    eng = SeparationEngine(apply_fn, chunk_samples=1000, overlap=200, batch_size=3)
    x = rng.standard_normal(5731).astype(np.float32)
    out = eng(x)["vocals"]
    np.testing.assert_allclose(out, x, atol=1e-5)


def test_ola_pipelined_matches_synchronous(rng):
    """The bounded async-dispatch pipeline (max_in_flight > 1) must be a
    pure latency optimization: outputs identical to the synchronous engine
    for a multi-batch track, including the zero-padded final batch."""
    def apply_fn(mixture):
        return {"vocals": mixture * 0.5, "drums": -mixture}

    x = rng.standard_normal(9973).astype(np.float32)
    kw = dict(chunk_samples=1000, overlap=200, batch_size=2)
    sync = SeparationEngine(apply_fn, max_in_flight=1, **kw)(x)
    piped = SeparationEngine(apply_fn, max_in_flight=3, **kw)(x)
    assert sorted(sync) == sorted(piped)
    for k in sync:
        np.testing.assert_array_equal(sync[k], piped[k])


def test_ola_short_input(rng):
    def apply_fn(mixture):
        return {"vocals": mixture * 2.0}
    eng = SeparationEngine(apply_fn, chunk_samples=1000, overlap=100)
    x = rng.standard_normal(300).astype(np.float32)
    out = eng(x)["vocals"]
    np.testing.assert_allclose(out, 2 * x, atol=1e-5)


def test_ola_matches_full_forward_for_real_model(rng):
    """Chunked OLA on a real (random) model: interior regions should be close
    to the full forward (boundary effects only at chunk edges)."""
    cfg = ModelConfig(n_fft=256, hop_length=64, n_layers=1, emb_dim=16,
                      num_groups=4, n_heads=2, attention_dim=16,
                      ffn_type="swiglu_conv1d", ffn_hidden_dim=32)
    model = TFLocoformerMSS(cfg)
    x = (0.3 * rng.standard_normal(12000)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), x[None])
    full = np.asarray(model.apply(params, x[None])["vocals"])[0]

    def apply_fn(mixture):
        return model.apply(params, mixture)

    eng = SeparationEngine(apply_fn, chunk_samples=4096, overlap=1024, batch_size=2)
    chunked = eng(x)["vocals"]
    assert chunked.shape == full.shape
    # energy-level agreement (attention context differs across chunks, so
    # this is a sanity check, not bit parity)
    corr = np.corrcoef(chunked, full)[0, 1]
    assert corr > 0.9, corr


def test_metrics_basics(rng):
    t = rng.standard_normal(4000).astype(np.float32)
    e = t + 0.01 * rng.standard_normal(4000).astype(np.float32)
    si = M.compute_si_sdr(e, t)
    assert 35 < si < 50
    assert M.compute_sar(e, t) == si and M.compute_sir(e, t) == si
    assert M.compute_sdr(t, t) > 100


def test_evaluate_source_separation(rng):
    tgt = {k: rng.standard_normal(2000).astype(np.float32) for k in ("vocals", "drums")}
    pred = {k: v + 0.1 * rng.standard_normal(2000).astype(np.float32)
            for k, v in tgt.items()}
    res = M.evaluate_source_separation(pred, tgt)
    assert set(res) == {"vocals", "drums", "average"}
    avg = np.mean([res["vocals"]["si_sdr"], res["drums"]["si_sdr"]])
    np.testing.assert_allclose(res["average"]["si_sdr"], avg)
    M.print_metrics(res)  # smoke


def test_separate_audio_end_to_end(tmp_path, rng):
    from mss_tf_locoformer_tpu.data import audio_io
    from mss_tf_locoformer_tpu.infer.separate import separate_audio

    cfg = ModelConfig(n_fft=256, hop_length=64, n_layers=1, emb_dim=16,
                      num_groups=4, n_heads=2, attention_dim=16,
                      ffn_type="swiglu_conv1d", ffn_hidden_dim=32)
    model = TFLocoformerMSS(cfg)
    sr = 8000
    x = (0.3 * rng.standard_normal((sr * 2, 2))).astype(np.float32)
    wav = tmp_path / "song.wav"
    audio_io.write(str(wav), x, sr)
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 4000), np.float32))

    stems = separate_audio(str(wav), str(tmp_path / "out"), model, params,
                           sample_rate=sr, chunk_seconds=0.5,
                           overlap_seconds=0.1, batch_size=2)
    assert set(stems) == {"vocals", "drums", "bass", "other"}
    for name in stems:
        out = tmp_path / "out" / f"song_{name}.wav"
        assert out.exists()
        data, out_sr = audio_io.read(str(out))
        assert out_sr == sr and data.shape == (sr * 2, 2)


class TestSTOI:
    """Behavioral properties (no pystoi in the image for exact parity):
    identity ~ 1, monotonic in SNR, noise-only low."""

    def _speechlike(self, rng, n=30000):
        # broadband amplitude-modulated noise: energy in every 1/3-octave
        # band (pure tones leave most bands noise-only, which STOI — like
        # the canonical implementation — scores near zero)
        t = np.arange(n) / 10000.0
        env = 0.5 * (1 + np.sin(2 * np.pi * 4 * t))
        return (env * rng.standard_normal(n)).astype(np.float32)

    def test_identity_is_one(self, rng):
        from mss_tf_locoformer_tpu.eval.stoi import compute_stoi
        x = self._speechlike(rng)
        assert compute_stoi(x, x, 10000) > 0.99

    def test_monotonic_in_snr(self, rng):
        from mss_tf_locoformer_tpu.eval.stoi import compute_stoi
        x = self._speechlike(rng)
        noise = rng.standard_normal(len(x)).astype(np.float32)
        scores = [compute_stoi(x, x + g * noise, 10000) for g in (0.05, 0.3, 1.5)]
        assert scores[0] > scores[1] > scores[2]
        assert scores[0] > 0.85 and scores[2] < 0.65

    def test_resampled_input(self, rng):
        from mss_tf_locoformer_tpu.eval.stoi import compute_stoi
        x = self._speechlike(rng, n=48000)
        s = compute_stoi(x, x + 0.1 * rng.standard_normal(len(x)).astype(np.float32),
                         16000)
        assert 0.0 < s <= 1.0
