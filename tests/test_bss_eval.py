"""BSS Eval v3 decomposition metrics (eval/bss_eval.py)."""

import numpy as np
import pytest

from mss_tf_locoformer_tpu.eval.bss_eval import bss_eval_sources, bss_eval_stems
from mss_tf_locoformer_tpu.eval.metrics import compute_sdr


@pytest.fixture
def sources(rng):
    return rng.standard_normal((3, 8000)).astype(np.float64)


def test_perfect_separation(sources):
    r = bss_eval_sources(sources, sources, filter_len=64)
    assert (r["sdr"] > 60).all()
    assert (r["sir"] > 60).all()


def test_interference_measured_as_sir(sources):
    """est0 = s0 + 0.1*s1: SIR ~ 20 dB, SAR stays high (no artifacts)."""
    est = sources.copy()
    est[0] = sources[0] + 0.1 * sources[1]
    r = bss_eval_sources(est, sources, filter_len=64)
    assert 17 < r["sir"][0] < 23, r["sir"]
    assert r["sar"][0] > 40, r["sar"]  # interference is NOT artifact


def test_artifact_measured_as_sar(sources, rng):
    """est0 = s0 + noise (independent): low SAR, high SIR."""
    est = sources.copy()
    est[0] = sources[0] + 0.1 * rng.standard_normal(8000)
    r = bss_eval_sources(est, sources, filter_len=64)
    assert 15 < r["sar"][0] < 25, r["sar"]
    assert r["sir"][0] > 30, r["sir"]


def test_filtered_target_invariance(sources):
    """A short-FIR-filtered target scores high BSS SDR (the decisive
    difference from naive SDR, which collapses)."""
    h = np.array([0.7, 0.2, -0.1])
    est = sources.copy()
    est[0] = np.convolve(sources[0], h)[:8000]
    r = bss_eval_sources(est, sources, filter_len=64)
    assert r["sdr"][0] > 40, r["sdr"]
    naive = compute_sdr(est[0], sources[0])
    assert naive < 15  # naive SDR punishes the allowed filtering


def test_stem_dict_front_end(sources):
    names = ("vocals", "drums", "bass")
    preds = {n: sources[i] + 0.05 * sources[(i + 1) % 3]
             for i, n in enumerate(names)}
    targets = {n: sources[i] for i, n in enumerate(names)}
    out = bss_eval_stems(preds, targets, filter_len=64)
    assert set(out) == {"vocals", "drums", "bass", "average"}
    for n in names:
        assert 20 < out[n]["sir"] < 32
    assert out["average"]["sdr"] == pytest.approx(
        np.mean([out[n]["sdr"] for n in names]))
