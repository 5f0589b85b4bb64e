"""Separation metrics (numpy, host-side).

Mirrors ``evaluation/metrics.py`` of the reference: SI-SDR / SDR / SAR / SIR
per stem plus averages.  Note the reference's SAR and SIR are *both*
projection-residual ratios against the single target — numerically equal to
SI-SDR (no bss_eval multi-source decomposition; ``evaluation/metrics.py:
14-168``).  That behavior is preserved (parity), with real museval-style
decomposition left as a documented extension.

Divergence fixed consciously (SURVEY.md §2.5): the reference's evaluate CLI
mono-izes the mixture but not the targets, corrupting its metrics on stereo
targets; our evaluator mono-izes both, matching the training-side convention
(``training/train.py:102-107``).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

__all__ = ["compute_si_sdr", "compute_sdr", "compute_sar", "compute_sir",
           "evaluate_source_separation", "print_metrics"]


def _flat(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float64).reshape(-1)


def compute_si_sdr(estimate, target, eps: float = 1e-8) -> float:
    e, t = _flat(estimate), _flat(target)
    e = e - e.mean()
    t = t - t.mean()
    scale = np.dot(e, t) / (np.dot(t, t) + eps)
    s_target = scale * t
    noise = e - s_target
    return float(10.0 * np.log10((np.dot(s_target, s_target) + eps)
                                 / (np.dot(noise, noise) + eps)))


def compute_sdr(estimate, target, eps: float = 1e-8) -> float:
    e, t = _flat(estimate), _flat(target)
    noise = e - t
    return float(10.0 * np.log10((np.dot(t, t) + eps) / (np.dot(noise, noise) + eps)))


def compute_sar(estimate, target, eps: float = 1e-8) -> float:
    """Artifact ratio vs the single-target projection (reference semantics —
    equals SI-SDR; not a bss_eval decomposition)."""
    return compute_si_sdr(estimate, target, eps)


def compute_sir(estimate, target, eps: float = 1e-8) -> float:
    """Interference ratio vs the single-target projection (reference
    semantics — equals SI-SDR; not a bss_eval decomposition)."""
    return compute_si_sdr(estimate, target, eps)


_METRIC_FNS = {"si_sdr": compute_si_sdr, "sdr": compute_sdr,
               "sar": compute_sar, "sir": compute_sir}


def evaluate_source_separation(
    predictions: Mapping[str, np.ndarray],
    targets: Mapping[str, np.ndarray],
    metrics=("si_sdr", "sdr", "sar", "sir"),
) -> Dict[str, Dict[str, float]]:
    """Per-stem metric dicts + an ``average`` entry (reference
    ``evaluate_source_separation``, ``evaluation/metrics.py:171-220``)."""
    out: Dict[str, Dict[str, float]] = {}
    for name, pred in predictions.items():
        if name not in targets:
            continue
        out[name] = {m: _METRIC_FNS[m](pred, targets[name]) for m in metrics}
    if out:
        out["average"] = {m: float(np.mean([v[m] for k, v in out.items()
                                            if k != "average"]))
                          for m in metrics}
    return out


def print_metrics(results: Mapping[str, Mapping[str, float]]) -> None:
    metrics = None
    for stem, vals in results.items():
        if metrics is None:
            metrics = list(vals)
            header = "stem".ljust(10) + "".join(m.rjust(10) for m in metrics)
            print(header)
            print("-" * len(header))
        print(stem.ljust(10) + "".join(f"{vals[m]:10.2f}" for m in metrics))
