"""North-star pipeline assertion (BASELINE.json ``north_star``).

Round-3 verdict item 3: every prior parity test checks a single short
forward (``tests/test_full_scale.py:29-60`` — one 3 s batch).  The
north-star claim is stronger: a *converted reference checkpoint*, run
through the REAL inference pipeline (chunked-OLA ``SeparationEngine``),
must produce stems bit-comparable to the reference's own full-track torch
forward (``inference/separate.py:147-148`` — the reference always runs ONE
forward over the whole track, no chunking exists in that repo), with the
quality metric (SI-SDR vs target, through our real ``eval.metrics``)
within 0.1 dB.  The OLA seam arithmetic, triangular-window envelope
normalization, chunk batching, and tail padding are exactly what a short
single forward cannot cover.

Two geometries run the same chain (``_run_chain``):

* **speech-scale** (n_fft 256 / hop 64 / 8 kHz, 35 s track, 2 layers) —
  always-run slow lane; ~1 TFLOP per side so the 1-core torch oracle
  finishes in seconds.
* **flagship base config** (n_fft 2048 / hop 512 / 44.1 kHz, 30 s) —
  gated behind ``NORTH_STAR=1`` (or the TPU lane): the torch full-track
  forward alone is ~54 TFLOP, ~15 min on this host's single CPU core.
  Measured results are recorded in PERFORMANCE.md.

Three legs per geometry:

1. **Full-track mode**: engine with ``chunk_samples == len(track)`` (the
   reference's own inference strategy, through our engine path) vs the
   torch full-track forward — per-stem SI-SDR(ours, torch) >= 40 dB AND
   |SI-SDR-vs-target(ours) − SI-SDR-vs-target(torch)| <= 0.1 dB.
2. **Chunked mode**: the production chunked-OLA engine vs an
   independently-written numpy overlap-add over torch per-chunk forwards
   (same documented window/envelope semantics, shared no code) — per-stem
   agreement >= 40 dB.  Catches seam indexing, window normalization, and
   batch-padding bugs with a shared-nothing oracle.
3. **Chunked-vs-full quality delta** is *measured and printed*, not
   asserted: with random weights the time-axis attention context genuinely
   differs per chunk, so the delta reflects model behavior, not pipeline
   error (PERFORMANCE.md records the measured values).
"""

import math
import os

import numpy as np
import pytest
import torch

from mss_tf_locoformer_tpu.core.config import ModelConfig
from mss_tf_locoformer_tpu.eval.metrics import compute_si_sdr
from mss_tf_locoformer_tpu.infer.overlap_add import SeparationEngine
from mss_tf_locoformer_tpu.models.mss_tflocoformer import TFLocoformerMSS

from reference_oracle import reference_available, reference_mss_module

STEMS = ("vocals", "drums", "bass", "other")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(),
                       reason="reference checkout not present"),
]


def _make_track(sr: int, seconds: float, rng) -> tuple:
    """Deterministic 4-stem synthetic track: AM-vibrato sine (vocals),
    gated high-passed noise (drums), slow low sine (bass), smoothed
    noise bed (other)."""
    t = int(sr * seconds)
    ts = np.arange(t) / sr
    am = 0.5 * (1.2 + np.sin(2 * np.pi * 0.7 * ts))
    vocals = 0.22 * am * np.sin(
        2 * np.pi * 261.6 * ts + 0.15 * np.sin(2 * np.pi * 2.3 * ts))
    n = rng.standard_normal(t + 8)
    drums = 0.2 * (n[:-8] - n[8:]) * (np.sin(2 * np.pi * 2.0 * ts) > 0.3)
    bass = (0.25 * np.sin(2 * np.pi * 55.0 * ts)
            * (1.0 + 0.3 * np.sin(2 * np.pi * 0.25 * ts)))
    other = 0.15 * np.convolve(rng.standard_normal(t),
                               np.ones(16) / 16.0, mode="same")
    stems = {k: v.astype(np.float32)
             for k, v in zip(STEMS, (vocals, drums, bass, other))}
    mixture = np.sum(list(stems.values()), axis=0).astype(np.float32)
    return mixture, stems


def _torch_full_track(ref, mixture: np.ndarray) -> dict:
    with torch.no_grad():
        out = ref(torch.from_numpy(mixture[None]))
    return {k: v.numpy()[0] for k, v in out.items()}


def _torch_ola_oracle(ref, mixture: np.ndarray, chunk: int,
                      overlap: int) -> dict:
    """Independent overlap-add: torch per-chunk forwards recombined by the
    engine's *documented* semantics (triangular ramps of ``overlap``
    samples, fp64 accumulation, envelope division, tail crop) — written
    here from the docstring, sharing no code with ``infer/overlap_add.py``."""
    hop = chunk - overlap
    t = mixture.shape[-1]
    n_chunks = 1 + math.ceil((t - chunk) / hop)
    total = (n_chunks - 1) * hop + chunk
    padded = np.pad(mixture, (0, total - t))
    starts = [i * hop for i in range(n_chunks)]
    batch = np.stack([padded[s:s + chunk] for s in starts]).astype(np.float32)
    with torch.no_grad():
        outs = {k: v.numpy() for k, v in ref(torch.from_numpy(batch)).items()}
    w = np.ones(chunk, dtype=np.float64)
    ramp = (np.arange(overlap, dtype=np.float64) + 1.0) / (overlap + 1.0)
    w[:overlap] = ramp
    w[-overlap:] = ramp[::-1]
    env = np.zeros(total, dtype=np.float64)
    for s in starts:
        env[s:s + chunk] += w
    result = {}
    for k, chunks in outs.items():
        acc = np.zeros(total, dtype=np.float64)
        for i, s in enumerate(starts):
            acc[s:s + chunk] += chunks[i].astype(np.float64) * w
        result[k] = (acc / np.maximum(env, 1e-8)).astype(np.float32)[:t]
    return result


def _run_chain(kw: dict, ffn_hidden: int, sr: int, seconds: float,
               chunk_s: float, overlap_s: float, rng,
               agree_db: float = 40.0, metric_tol_db: float = 0.1):
    from mss_tf_locoformer_tpu.convert.torch_ckpt import convert_state_dict

    ref_mod = reference_mss_module()
    torch.manual_seed(0)
    ref = ref_mod.TFLocoformerMSS(
        **kw, ffn_type=["swiglu_conv1d", "swiglu_conv1d"],
        ffn_hidden_dim=[ffn_hidden, ffn_hidden])
    ref.eval()

    cfg = ModelConfig(**kw, ffn_type=("swiglu_conv1d", "swiglu_conv1d"),
                      ffn_hidden_dim=(ffn_hidden, ffn_hidden))
    model = TFLocoformerMSS(cfg)
    params = convert_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})

    mixture, targets = _make_track(sr, seconds, rng)
    t = mixture.shape[-1]
    want_full = _torch_full_track(ref, mixture)

    def apply_fn(mix):
        return model.apply(params, mix)

    # --- leg 1: full-track engine mode vs torch full-track forward
    engine_full = SeparationEngine(apply_fn, chunk_samples=t, batch_size=1)
    ours_full = engine_full(mixture)
    deltas = {}
    for k in STEMS:
        agree = compute_si_sdr(ours_full[k], want_full[k])
        assert agree >= agree_db, (
            f"full-track {k}: SI-SDR(ours, torch) = {agree:.1f} dB")
        ours_q = compute_si_sdr(ours_full[k], targets[k])
        ref_q = compute_si_sdr(want_full[k], targets[k])
        deltas[k] = abs(ours_q - ref_q)
        assert deltas[k] <= metric_tol_db, (
            f"full-track {k}: SI-SDR vs target {ours_q:.3f} (ours) vs "
            f"{ref_q:.3f} (torch) — delta {deltas[k]:.4f} dB")

    # --- leg 2: production chunked-OLA engine vs independent torch OLA
    chunk, overlap = int(chunk_s * sr), int(overlap_s * sr)
    engine = SeparationEngine(apply_fn, chunk_samples=chunk,
                              overlap=overlap, batch_size=3)
    ours_chunked = engine(mixture)
    oracle = _torch_ola_oracle(ref, mixture, chunk, overlap)
    for k in STEMS:
        agree = compute_si_sdr(ours_chunked[k], oracle[k])
        assert agree >= agree_db, (
            f"chunked {k}: SI-SDR(ours, torch-OLA oracle) = {agree:.1f} dB")

    # --- leg 3: measured (not asserted) chunked-vs-full quality delta
    q_delta = {k: compute_si_sdr(ours_chunked[k], targets[k])
               - compute_si_sdr(ours_full[k], targets[k]) for k in STEMS}
    print(f"north-star metric deltas (full-track, dB): {deltas}")
    print(f"chunked-vs-full SI-SDR-vs-target delta (dB): {q_delta}")
    return deltas, q_delta


def test_north_star_speech_scale(rng):
    # 16 s / 2.5 s chunks -> 7 overlap seams; a 35 s variant measured the
    # same deltas (metric delta <= 1.3e-5 dB) but cost 24 min of 1-core
    # CPU — the time-axis attention is O(L^2) in track length and the
    # seam/window/batching coverage is identical.
    kw = dict(n_fft=256, hop_length=64, n_sources=4, n_layers=2,
              emb_dim=32, num_groups=4, n_heads=2, attention_dim=32)
    _run_chain(kw, ffn_hidden=64, sr=8000, seconds=16.0,
               chunk_s=2.5, overlap_s=0.625, rng=rng)


@pytest.mark.skipif(
    os.environ.get("NORTH_STAR") != "1"
    and os.environ.get("TESTS_ON_TPU") != "1",
    reason="~54 TFLOP torch full-track oracle (~15 min on 1 CPU core); "
           "set NORTH_STAR=1 (results recorded in PERFORMANCE.md)")
def test_north_star_base_config(rng):
    kw = dict(n_fft=2048, hop_length=512, n_sources=4, n_layers=4,
              emb_dim=96, num_groups=4, n_heads=4, attention_dim=96)
    _run_chain(kw, ffn_hidden=384, sr=44100, seconds=30.0,
               chunk_s=8.0, overlap_s=2.0, rng=rng)
