"""PIT learned-separation proof for the speech family.

The reference's speech recipes have MEASURED separation quality
(``egs2/wsj0_2mix/.../RESULTS.md:22-26``: SI-SNR 23.64 on WSJ0-2mix); the
native speech trainer previously only proved loss-decreases.  These tests
are the PIT analogue of ``test_overfit_learns_separation``: train on a
fixed synthetic 2-speaker corpus until the PERMUTATION-RESOLVED SI-SNR
improvement over the mixture baseline is >= 10 dB per speaker — evidence
that PIT actually resolves the output permutation and the stack separates
two sources, not merely that the loss moves.
"""

import numpy as np
import pytest

from mss_tf_locoformer_tpu.core.config import (OptimizerConfig,
                                               SeparatorConfig, SpeechConfig,
                                               SpeechDatasetConfig,
                                               SpeechLossConfig, STFTConfig,
                                               TrainingConfig)


def _si_snr(est: np.ndarray, ref: np.ndarray, eps: float = 1e-8) -> float:
    est = est - est.mean()
    ref = ref - ref.mean()
    s = (est @ ref) / (ref @ ref + eps) * ref
    return float(10 * np.log10(((s ** 2).sum() + eps) /
                               (((est - s) ** 2).sum() + eps)))


def _resolved_si_snr(est: np.ndarray, refs: np.ndarray) -> np.ndarray:
    """Best-permutation per-speaker SI-SNR for one utterance.

    est/refs ``[2, T]``; returns ``[2]`` in the REFERENCE speaker order."""
    direct = np.array([_si_snr(est[0], refs[0]), _si_snr(est[1], refs[1])])
    swapped = np.array([_si_snr(est[1], refs[0]), _si_snr(est[0], refs[1])])
    return direct if direct.mean() >= swapped.mean() else swapped


def _two_speaker_batch(t: int = 8000, sr: int = 8000):
    """Two mixtures of spectrally-distinct 'speakers': an AM harmonic tone
    (speaker 1) and high-passed noise (speaker 2) — separable by a small
    model in a few hundred steps."""
    ts = np.arange(t) / sr
    utts = []
    for f0, seed in ((220.0, 1), (315.0, 2)):
        r = np.random.default_rng(seed)
        am = 0.6 * (1.0 + np.sin(2 * np.pi * 2.5 * ts + seed))
        s1 = (0.25 * am * (np.sin(2 * np.pi * f0 * ts) +
                           0.5 * np.sin(2 * np.pi * 2 * f0 * ts))
              ).astype(np.float32)
        n = r.standard_normal(t + 8).astype(np.float32)
        s2 = (0.25 * (n[:-8] - n[8:])).astype(np.float32)
        utts.append((s1, s2))
    sources = np.stack([np.stack(u) for u in utts])     # [B, 2, T]
    mixture = sources.sum(axis=1)                       # [B, T]
    return mixture, sources


def _speech_cfg(criterion: str, wrapper: str) -> SpeechConfig:
    return SpeechConfig(
        dataset=SpeechDatasetConfig(num_spk=2, segment_length=8000),
        separator=SeparatorConfig(num_spk=2, n_layers=2, emb_dim=32,
                                  num_groups=4, n_heads=2, attention_dim=32,
                                  ffn_type="swiglu_conv1d", ffn_hidden_dim=64,
                                  dropout=0.0),
        stft=STFTConfig(n_fft=256, hop_length=64),
        loss=SpeechLossConfig(criterion=criterion, wrapper=wrapper),
        training=TrainingConfig(batch_size=2, num_workers=0, use_amp=False,
                                optimizer=OptimizerConfig(lr=1e-3)),
        seed=0,
    )


def _train_until_separated(cfg: SpeechConfig, threshold_db: float,
                           max_steps: int = 400):
    import jax
    import jax.numpy as jnp

    from mss_tf_locoformer_tpu.models.tflocoformer import TFLocoformerSeparator
    from mss_tf_locoformer_tpu.ops.stft import istft, stft
    from mss_tf_locoformer_tpu.train.speech import make_speech_step
    from mss_tf_locoformer_tpu.train.state import init_state, make_optimizer

    mixture, sources = _two_speaker_batch()
    module = TFLocoformerSeparator(**cfg.separator.module_kwargs())
    n_fft, hop = cfg.stft.n_fft, cfg.stft.hop_length
    spec0 = jnp.swapaxes(stft(jnp.asarray(mixture[:1]), n_fft, hop), -1, -2)
    params = module.init(jax.random.PRNGKey(0), spec0)
    tx = make_optimizer(cfg.training)
    state = init_state(params, tx)
    step, _ = make_speech_step(module, cfg, tx)

    def separate(params):
        spec = jnp.swapaxes(stft(jnp.asarray(mixture), n_fft, hop), -1, -2)
        out = module.apply(params, spec)
        return np.asarray(istft(jnp.swapaxes(out, -1, -2), n_fft, hop,
                                length=mixture.shape[-1]))

    # mixture-as-estimate baseline, per utterance per speaker
    baseline = np.stack([
        _resolved_si_snr(np.stack([mixture[b], mixture[b]]), sources[b])
        for b in range(mixture.shape[0])])

    rng = jax.random.PRNGKey(1)
    improvement = np.full_like(baseline, -np.inf)
    for it in range(1, max_steps + 1):
        rng, sub = jax.random.split(rng)
        state, _ = step(state, mixture, sources, 1e-3, sub)
        if it % 50 == 0:
            est = separate(state.params)
            resolved = np.stack([_resolved_si_snr(est[b], sources[b])
                                 for b in range(mixture.shape[0])])
            improvement = resolved - baseline
            if (improvement >= threshold_db).all():
                break
    return improvement, it


@pytest.mark.slow
def test_pit_overfit_learns_separation():
    """PIT/SI-SNR (the wsj0-2mix recipe criterion,
    ``egs2/wsj0_2mix/enh1/conf/tuning/train_enh_tflocoformer.yaml:84-92``)."""
    improvement, steps = _train_until_separated(
        _speech_cfg("si_snr", "pit"), threshold_db=10.0)
    assert (improvement >= 10.0).all(), (
        f"permutation-resolved SI-SNR improvement {improvement} dB "
        f"after {steps} steps (need >= 10 dB per speaker per utterance)")


@pytest.mark.slow
def test_mr_l1_tfd_overfit_learns_separation():
    """fixed_order/mr_l1_tfd (the DNS recipe criterion,
    ``egs2/dns_ins20/enh1/conf/tuning/train_enh_tflocoformer.yaml:84-95``).
    The quality bar is the same permutation-resolved SI-SNR improvement —
    the criterion trains in the TF domain but must still separate."""
    improvement, steps = _train_until_separated(
        _speech_cfg("mr_l1_tfd", "fixed_order"), threshold_db=10.0,
        max_steps=800)
    assert (improvement >= 10.0).all(), (
        f"SI-SNR improvement {improvement} dB after {steps} steps")
