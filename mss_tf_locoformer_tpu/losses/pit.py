"""Permutation-invariant training (PIT) losses for the speech separators.

The reference's speech recipes train through ESPnet with a PIT-wrapped SI-SNR
criterion (``egs2/wsj0_2mix/enh1/conf/tuning/train_enh_tflocoformer.yaml:84-92``:
``wrapper: pit``, ``criterion: si_snr``) and, for DNS, a fixed-order
multi-resolution time-frequency L1 (``egs2/dns_ins20/enh1/conf/tuning/
train_enh_tflocoformer.yaml:84-95``: ``wrapper: fixed_order``,
``criterion: mr_l1_tfd``).  This module provides both, TPU-style: the
permutation search is a static enumeration (num_spk <= 4 in every recipe, so
at most 24 permutations), evaluated as one batched pairwise-loss matrix and a
static gather — no data-dependent control flow, fully jit/pjit friendly.
"""

from __future__ import annotations

import itertools
from typing import Callable, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .mss_loss import si_sdr
from ..ops.stft import stft

__all__ = ["pairwise_si_snr_loss", "pit_loss", "pit_si_snr_loss",
           "mr_l1_tfd_loss", "fixed_order_loss"]

#: loss_fn(est [B, T...], ref [B, T...]) -> [B] per-item loss
PairLossFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _neg_si_snr(est: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    return -si_sdr(est, ref)


def _pairwise_matrix(loss_fn: PairLossFn, estimates: jnp.ndarray,
                     targets: jnp.ndarray) -> jnp.ndarray:
    """``[B, S_est, S_ref]`` matrix of per-item losses for every (est, ref) pair.

    Built with broadcasting rather than a double vmap so XLA sees one fused
    elementwise program over ``[B, S, S, T]`` (S <= 4 in practice).
    """
    b, s = estimates.shape[0], estimates.shape[1]
    est = estimates[:, :, None]                       # [B, S, 1, ...]
    ref = targets[:, None, :]                         # [B, 1, S, ...]
    est = jnp.broadcast_to(est, (b, s, s) + estimates.shape[2:]).reshape(
        (b * s * s,) + estimates.shape[2:])
    ref = jnp.broadcast_to(ref, (b, s, s) + targets.shape[2:]).reshape(
        (b * s * s,) + targets.shape[2:])
    return loss_fn(est, ref).reshape(b, s, s)


def pairwise_si_snr_loss(estimates: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """``[B, S, S]`` negative SI-SNR for every (estimate, reference) pair."""
    return _pairwise_matrix(_neg_si_snr, estimates, targets)


def pit_loss(
    estimates: jnp.ndarray,
    targets: jnp.ndarray,
    loss_fn: PairLossFn = _neg_si_snr,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PIT loss over ``[B, S, ...]`` estimates/targets.

    Returns ``(loss, perm)``: the scalar mean-over-batch of the best
    permutation's mean pairwise loss, and the ``[B]`` int32 index of the
    winning permutation (into ``itertools.permutations(range(S))`` order) —
    the same contract as ESPnet's PIT solver, which the reference relies on
    via ``wrapper: pit``.
    """
    s = estimates.shape[1]
    if targets.shape[1] != s:
        raise ValueError(f"estimates have {s} sources but targets have {targets.shape[1]}")
    mat = _pairwise_matrix(loss_fn, estimates, targets)          # [B, S, S]
    perms = np.array(list(itertools.permutations(range(s))))     # [P, S]
    rows = np.arange(s)
    # per-permutation mean loss: gather mat[:, rows, perm] and average over S
    per_perm = jnp.stack(
        [jnp.mean(mat[:, rows, p], axis=-1) for p in perms], axis=-1)  # [B, P]
    best = jnp.argmin(per_perm, axis=-1)                          # [B]
    loss = jnp.mean(jnp.min(per_perm, axis=-1))
    return loss, best.astype(jnp.int32)


def pit_si_snr_loss(estimates: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Scalar PIT SI-SNR loss (the wsj0-2mix / whamr / librimix criterion)."""
    loss, _ = pit_loss(estimates, targets, _neg_si_snr)
    return loss


def mr_l1_tfd_loss(
    estimate: jnp.ndarray,
    target: jnp.ndarray,
    fft_sizes: Sequence[int] = (256, 512, 768, 1024),
    hop_factor: float = 0.5,
    time_domain_weight: float = 0.5,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Multi-resolution time-frequency-domain L1 (ESPnet's ``mr_l1_tfd``).

    Mean L1 over complex STFT magnitudes at several resolutions plus a
    weighted time-domain L1, matching the DNS recipe's criterion family
    (``egs2/dns_ins20/enh1/conf/tuning/train_enh_tflocoformer.yaml:88-95``).
    """
    est = estimate.astype(jnp.float32)
    tgt = target.astype(jnp.float32)
    total = 0.0
    for n_fft in fft_sizes:
        hop = max(1, int(n_fft * hop_factor))
        e = jnp.abs(stft(est, n_fft, hop))
        t = jnp.abs(stft(tgt, n_fft, hop))
        total = total + jnp.mean(jnp.abs(e - t))
    total = total / len(fft_sizes)
    return total + time_domain_weight * jnp.mean(jnp.abs(est - tgt))


def fixed_order_loss(
    estimates: jnp.ndarray,
    targets: jnp.ndarray,
    loss_fn: PairLossFn = _neg_si_snr,
) -> jnp.ndarray:
    """Fixed-order (no permutation search) mean loss over sources —
    ESPnet's ``wrapper: fixed_order`` used by the DNS recipe."""
    b, s = estimates.shape[0], estimates.shape[1]
    est = estimates.reshape((b * s,) + estimates.shape[2:])
    ref = targets.reshape((b * s,) + targets.shape[2:])
    return jnp.mean(loss_fn(est, ref))
