"""PIT / speech-criterion losses (reference speech recipes train via ESPnet's
``wrapper: pit`` + ``criterion: si_snr`` and ``wrapper: fixed_order`` +
``criterion: mr_l1_tfd``)."""

import itertools

import numpy as np
import pytest

from mss_tf_locoformer_tpu.losses import (fixed_order_loss, mr_l1_tfd_loss,
                                          pit_loss, pit_si_snr_loss)
from mss_tf_locoformer_tpu.losses.mss_loss import si_sdr


def _sources(rng, b=2, s=3, t=800):
    return rng.standard_normal((b, s, t), dtype=np.float32)


def test_pit_recovers_permutation(rng):
    src = _sources(rng)
    perm = [2, 0, 1]
    est = src[:, perm] + 0.01 * rng.standard_normal(src.shape, dtype=np.float32)
    loss, best = pit_loss(est, src)
    # est[i] matches src[perm[i]]; the winning permutation maps row i -> perm[i]
    perms = list(itertools.permutations(range(3)))
    assert all(perms[int(i)] == tuple(perm) for i in best)
    # near-perfect match -> strongly negative (-SI-SNR) loss
    assert float(loss) < -30.0


def test_pit_beats_fixed_order_on_permuted(rng):
    src = _sources(rng)
    est = src[:, [1, 0, 2]]
    assert float(pit_si_snr_loss(est, src)) < float(fixed_order_loss(est, src))


def test_pit_equals_fixed_order_on_identity(rng):
    src = _sources(rng)
    est = src + 0.1 * rng.standard_normal(src.shape, dtype=np.float32)
    # identity is (almost surely) the best permutation for a small perturbation
    np.testing.assert_allclose(float(pit_si_snr_loss(est, src)),
                               float(fixed_order_loss(est, src)), atol=1e-4)


def test_pit_matches_bruteforce(rng):
    src = _sources(rng, b=3, s=2, t=400)
    est = rng.standard_normal(src.shape, dtype=np.float32)
    loss, _ = pit_loss(est, src)
    # brute force per item
    per_item = []
    for b in range(3):
        best = min(
            np.mean([-np.asarray(si_sdr(est[b:b + 1, i], src[b:b + 1, j]))[0]
                     for i, j in enumerate(p)])
            for p in itertools.permutations(range(2)))
        per_item.append(best)
    np.testing.assert_allclose(float(loss), np.mean(per_item), rtol=1e-5)


def test_pit_shape_mismatch_raises(rng):
    with pytest.raises(ValueError):
        pit_loss(np.zeros((1, 2, 10), np.float32), np.zeros((1, 3, 10), np.float32))


def test_mr_l1_tfd_zero_on_identical(rng):
    x = rng.standard_normal((2, 4000), dtype=np.float32)
    assert float(mr_l1_tfd_loss(x, x)) == pytest.approx(0.0, abs=1e-6)
    assert float(mr_l1_tfd_loss(x + 0.1, x)) > 0.0


def test_pit_is_differentiable(rng):
    import jax
    src = _sources(rng, b=1, s=2, t=500)
    est = src[:, [1, 0]] + 0.05 * rng.standard_normal(src.shape, dtype=np.float32)
    g = jax.grad(lambda e: pit_si_snr_loss(e, src))(est)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(np.abs(np.asarray(g)).max()) > 0.0
