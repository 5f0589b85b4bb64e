"""BSS Eval source-separation metrics (true multi-source decomposition).

The reference's SAR/SIR are single-target projection ratios (equal to
SI-SDR; ``evaluation/metrics.py:14-168``) — preserved in ``eval/metrics.py``
for parity.  This module adds the real thing as the documented extension
(SURVEY.md §2.5): BSS Eval v3 semantics (Vincent et al., "Performance
measurement in blind audio source separation", IEEE TASLP 2006), where each
estimate is decomposed against *time-invariant 512-tap filtered versions of
all references*:

    s_target = P_{ref_j} e        (projection onto lags of the true source)
    e_interf = P_{all refs} e - s_target
    e_artif  = e - P_{all refs} e

    SDR = 10 log10 |s_target|^2 / |e_interf + e_artif|^2
    SIR = 10 log10 |s_target|^2 / |e_interf|^2
    SAR = 10 log10 |s_target + e_interf|^2 / |e_artif|^2

Projections solve one block-Toeplitz least-squares system per estimate via
FFT cross-correlations (numpy host-side; a 4-stem, 512-tap system is a
2048x2048 solve).  Stems keep their fixed MSS order (no permutation search —
MSS stems are labeled; speech PIT handles permutations at the loss level).

Convention note: decomposition energies are taken over the FULL filtered
support ``t + flen - 1`` (references zero-padded, estimate zero-extended) —
the mir_eval / BSS Eval v3 convention — so numbers are comparable to
published museval/mir_eval results.  ``tests/test_eval_pinning.py`` asserts
agreement with an explicit lagged-design-matrix least-squares oracle.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence, Tuple

import numpy as np

__all__ = ["bss_eval_sources", "bss_eval_stems"]


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _correlations(refs: np.ndarray, est: np.ndarray, flen: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """G [S*L, S*L] Gram of lagged references; D [S*L] ref-estimate corr."""
    s, t = refs.shape
    n_fft = _next_pow2(t + flen - 1)
    rf = np.fft.rfft(refs, n_fft, axis=1)           # [S, F]
    ef = np.fft.rfft(est, n_fft)

    g = np.zeros((s * flen, s * flen))
    for i in range(s):
        for j in range(i, s):
            # r_ij[tau] = sum_t refs_i[t] refs_j[t + tau]
            r = np.fft.irfft(np.conj(rf[i]) * rf[j], n_fft)
            # block[a, b] = corr(shift_a(s_i), shift_b(s_j)) = r_ij[a - b]
            idx = np.arange(flen)
            lag = idx[:, None] - idx[None, :]
            block = r[lag % n_fft]
            g[i * flen:(i + 1) * flen, j * flen:(j + 1) * flen] = block
            if j > i:
                g[j * flen:(j + 1) * flen, i * flen:(i + 1) * flen] = block.T

    d = np.zeros(s * flen)
    for i in range(s):
        c = np.fft.irfft(np.conj(rf[i]) * ef, n_fft)
        d[i * flen:(i + 1) * flen] = c[:flen]
    return g, d


def _project(refs: np.ndarray, coefs: np.ndarray, flen: int, t_out: int
             ) -> np.ndarray:
    """Apply per-source FIR filters (coefs [S, L]) and sum."""
    s, t = refs.shape
    n_fft = _next_pow2(t + flen - 1)
    rf = np.fft.rfft(refs, n_fft, axis=1)
    cf = np.fft.rfft(coefs, n_fft, axis=1)
    y = np.fft.irfft((rf * cf).sum(axis=0), n_fft)
    return y[:t_out]


def bss_eval_sources(estimates: np.ndarray, references: np.ndarray,
                     filter_len: int = 512, eps: float = 1e-12
                     ) -> Dict[str, np.ndarray]:
    """estimates/references ``[S, T]`` (mono, fixed stem order) ->
    dict of per-source arrays ``{"sdr", "sir", "sar"}`` (BSS Eval v3)."""
    est = np.asarray(estimates, np.float64)
    ref = np.asarray(references, np.float64)
    assert est.shape == ref.shape and est.ndim == 2, (est.shape, ref.shape)
    s, t = ref.shape
    flen = int(filter_len)

    sdr = np.zeros(s)
    sir = np.zeros(s)
    sar = np.zeros(s)
    t_full = t + flen - 1  # full filtered support (mir_eval convention)
    for i in range(s):
        g, d = _correlations(ref, est[i], flen)
        # regularized solve (silent stems make G singular)
        reg = eps * np.trace(g) / max(g.shape[0], 1) + eps
        coefs_all = np.linalg.solve(
            g + reg * np.eye(g.shape[0]), d).reshape(s, flen)
        p_all = _project(ref, coefs_all, flen, t_full)

        gi = g[i * flen:(i + 1) * flen, i * flen:(i + 1) * flen]
        di = d[i * flen:(i + 1) * flen]
        regi = eps * np.trace(gi) / flen + eps
        coef_i = np.linalg.solve(gi + regi * np.eye(flen), di)
        s_target = _project(ref[i:i + 1], coef_i[None], flen, t_full)

        est_full = np.concatenate([est[i], np.zeros(flen - 1)])
        e_interf = p_all - s_target
        e_artif = est_full - p_all

        def db(num, den):
            return 10.0 * np.log10((num + eps) / (den + eps))

        sdr[i] = db(np.sum(s_target ** 2),
                    np.sum((e_interf + e_artif) ** 2))
        sir[i] = db(np.sum(s_target ** 2), np.sum(e_interf ** 2))
        sar[i] = db(np.sum((s_target + e_interf) ** 2),
                    np.sum(e_artif ** 2))
    return {"sdr": sdr, "sir": sir, "sar": sar}


def bss_eval_stems(predictions: Mapping[str, np.ndarray],
                   targets: Mapping[str, np.ndarray],
                   stems: Optional[Sequence[str]] = None,
                   filter_len: int = 512) -> Dict[str, Dict[str, float]]:
    """Stem-dict front-end matching ``evaluate_source_separation``'s output
    schema (per-stem dicts + ``average``)."""
    names = [k for k in (stems or predictions) if k in targets]
    est = np.stack([np.asarray(predictions[k], np.float64).reshape(-1)
                    for k in names])
    ref = np.stack([np.asarray(targets[k], np.float64).reshape(-1)
                    for k in names])
    r = bss_eval_sources(est, ref, filter_len)
    out = {name: {"sdr": float(r["sdr"][i]), "sir": float(r["sir"][i]),
                  "sar": float(r["sar"][i])}
           for i, name in enumerate(names)}
    out["average"] = {m: float(np.mean([out[n][m] for n in names]))
                      for m in ("sdr", "sir", "sar")}
    return out
