"""Parity tests: ops.stft vs torch.stft/istft (the reference's transform,
``models/mss_tflocoformer.py:36-75``)."""

import numpy as np
import pytest
import torch

from mss_tf_locoformer_tpu.ops import stft as S

# (n_fft, hop) pairs from every shipped reference config plus odd combos.
CONFIGS = [(2048, 1024), (2048, 512), (1024, 256), (4096, 1024), (512, 128),
           (400, 160), (256, 64)]


def _torch_stft(x, n_fft, hop):
    w = torch.hann_window(n_fft)
    return torch.stft(torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
                      win_length=n_fft, window=w, return_complex=True)


@pytest.mark.parametrize("n_fft,hop", CONFIGS)
def test_stft_matches_torch(rng, n_fft, hop):
    x = rng.standard_normal((2, 3 * n_fft + 77), dtype=np.float32)
    ref = _torch_stft(x, n_fft, hop).numpy()
    out = np.asarray(S.stft(x, n_fft, hop))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4 * np.abs(ref).max(), rtol=0)


@pytest.mark.parametrize("n_fft,hop", CONFIGS)
def test_istft_matches_torch(rng, n_fft, hop):
    x = rng.standard_normal((2, 3 * n_fft + 77), dtype=np.float32)
    spec = _torch_stft(x, n_fft, hop)
    w = torch.hann_window(n_fft)
    length = x.shape[-1]
    ref = torch.istft(spec, n_fft=n_fft, hop_length=hop, win_length=n_fft,
                      window=w, length=length).numpy()
    out = np.asarray(S.istft(spec.numpy(), n_fft, hop, length=length))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5 * max(1.0, np.abs(ref).max()), rtol=0)


@pytest.mark.parametrize("n_fft,hop", [(2048, 512), (1024, 256)])
def test_roundtrip_reconstruction(rng, n_fft, hop):
    x = rng.standard_normal((1, 44100), dtype=np.float32)
    spec = S.stft(x, n_fft, hop)
    y = np.asarray(S.istft(spec, n_fft, hop, length=x.shape[-1]))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_istft_length_pads_zero(rng):
    x = rng.standard_normal((1, 4096), dtype=np.float32)
    spec = S.stft(x, 1024, 256)
    y = np.asarray(S.istft(spec, 1024, 256, length=5000))
    assert y.shape[-1] == 5000


def test_win_length_shorter_than_nfft(rng):
    x = rng.standard_normal((1, 8000), dtype=np.float32)
    n_fft, hop, win = 512, 128, 400
    w = torch.hann_window(win)
    ref = torch.stft(torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
                     win_length=win, window=w, return_complex=True).numpy()
    out = np.asarray(S.stft(x, n_fft, hop, win_length=win))
    np.testing.assert_allclose(out, ref, atol=2e-4 * np.abs(ref).max(), rtol=0)


def test_n_frames_helper():
    assert S.n_frames_for(44100, 2048, 512) == 1 + 44100 // 512
