"""Fused Pallas STFT/iSTFT kernels vs the jnp reference (``ops/stft.py``),
which is itself torch-parity tested in ``tests/test_stft.py``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mss_tf_locoformer_tpu.ops import stft as S
from mss_tf_locoformer_tpu.ops.pallas import stft_kernel as K


CONFIGS = [(2048, 512), (1024, 256), (2048, 1024), (4096, 1024)]

_TPU = jax.default_backend() == "tpu"


def _ctx():
    """Interpret mode on CPU; REAL kernels on the TPU backend (interpret
    mode there still round-trips the remote compiler and is flaky)."""
    import contextlib
    return contextlib.nullcontext() if _TPU else pltpu.force_tpu_interpret_mode()


@pytest.mark.parametrize("n_fft,hop", CONFIGS)
def test_supports_shipped_configs(n_fft, hop):
    assert K.supports(n_fft, hop, 132300)


def test_unsupported_fallback_cases():
    assert not K.supports(128, 64, 8000)    # hop < 128 (speech transform)
    assert not K.supports(1000, 250, 8000)  # non-128-multiple hop


def _fetch_complex(x):
    """Complex D2H is unimplemented over remote-device tunnels: fetch the
    real and imaginary parts separately and recombine on host."""
    return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))


@pytest.mark.parametrize("n_fft,hop", CONFIGS)
def test_stft_matches_jnp(rng, n_fft, hop):
    audio = rng.standard_normal((2, 3 * n_fft + 517), dtype=np.float32)
    want = _fetch_complex(S.stft(jnp.asarray(audio), n_fft, hop))
    with _ctx():
        got = _fetch_complex(K.stft_pallas(jnp.asarray(audio), n_fft, hop))
    assert got.shape == want.shape
    scale = np.abs(want).max()
    # real chip: the kernel's DFT runs as single-pass bf16 MXU matmuls
    # (~2e-3 relative, -54 dB — the documented design point) while the jnp
    # oracle uses an fp32 FFT; interpret mode computes both exactly
    atol = (3e-3 if _TPU else 2e-4) * scale
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


@pytest.mark.parametrize("n_fft,hop", [(2048, 512), (1024, 256)])
def test_istft_matches_jnp(rng, n_fft, hop):
    t = 2 * n_fft + 333
    audio = rng.standard_normal((2, t), dtype=np.float32)
    spec = S.stft(jnp.asarray(audio), n_fft, hop)
    want = np.asarray(S.istft(spec, n_fft, hop, length=t))
    with _ctx():
        got = np.asarray(K.istft_pallas(spec, n_fft, hop, t))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
    # round-trip reconstructs the waveform
    np.testing.assert_allclose(got, audio, atol=5e-3)


def test_stft_grad_matches_jnp(rng):
    n_fft, hop = 1024, 256
    audio = rng.standard_normal((1, 3000), dtype=np.float32)

    def loss_ref(a):
        return jnp.sum(jnp.abs(S.stft(a, n_fft, hop)) ** 2)

    def loss_pal(a):
        return jnp.sum(jnp.abs(K.stft_pallas(a, n_fft, hop)) ** 2)

    g_ref = np.asarray(jax.grad(loss_ref)(jnp.asarray(audio)))
    with _ctx():
        g_pal = np.asarray(jax.grad(loss_pal)(jnp.asarray(audio)))
    atol = (3e-3 * max(np.abs(g_ref).max(), 1.0)) if _TPU else 1e-2
    np.testing.assert_allclose(g_pal, g_ref, atol=atol, rtol=1e-3)


def test_istft_grad_matches_jnp(rng):
    n_fft, hop = 1024, 256
    t = 2500
    audio = rng.standard_normal((1, t), dtype=np.float32)
    spec = S.stft(jnp.asarray(audio), n_fft, hop)

    def loss_ref(s):
        return jnp.sum(S.istft(s, n_fft, hop, length=t) ** 2)

    def loss_pal(s):
        return jnp.sum(K.istft_pallas(s, n_fft, hop, t) ** 2)

    g_ref = jax.grad(loss_ref)(spec)
    with _ctx():
        g_pal = jax.grad(loss_pal)(spec)
    # complex D2H is unimplemented over remote-device tunnels: split on device
    for part in (jnp.real, jnp.imag):
        np.testing.assert_allclose(np.asarray(part(g_pal)),
                                   np.asarray(part(g_ref)),
                                   atol=1e-2, rtol=1e-3)


def test_model_with_fused_stft_matches(rng):
    """Full MSS forward with fused_stft=True == fused_stft=False (interpret)."""
    from mss_tf_locoformer_tpu.core.config import ModelConfig
    from mss_tf_locoformer_tpu.models.mss_tflocoformer import TFLocoformerMSS

    kw = dict(n_fft=1024, hop_length=256, n_layers=1, emb_dim=16,
              num_groups=4, n_heads=2, attention_dim=16,
              ffn_type="swiglu_conv1d", ffn_hidden_dim=32, dropout=0.0)
    mixture = rng.standard_normal((1, 4000), dtype=np.float32) * 0.3
    ref_model = TFLocoformerMSS(ModelConfig(**kw, fused_stft=False))
    params = ref_model.init(jax.random.PRNGKey(0), mixture)
    want = ref_model.apply(params, mixture)
    fused_model = TFLocoformerMSS(ModelConfig(**kw, fused_stft=True))
    with _ctx():
        got = fused_model.apply(params, mixture)
    for k in want:
        w = np.asarray(want[k])
        atol = (5e-3 * max(np.abs(w).max(), 1.0)) if _TPU else 5e-4
        np.testing.assert_allclose(np.asarray(got[k]), w,
                                   atol=atol, rtol=1e-3)


# (the fully fused irDFT+OLA kernel and its interpret-mode parity tests were
# removed in round 3 — the backend's Mosaic compiler aborts on the kernel;
# see the note in ops/pallas/stft_kernel.py and PERFORMANCE.md)
