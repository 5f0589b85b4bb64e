"""Native MP3-like codec simulation (``data/codec.py``) — the
encoder-less stand-in for the reference's audiomentations Mp3Compression
augmentation (``data/mss_dataset.py:532-544``)."""

import numpy as np
import pytest

from mss_tf_locoformer_tpu.data.codec import (imdct, mdct,
                                              mp3_like_compression)

SR = 44100


@pytest.fixture
def material(rng):
    t = SR
    tone = 0.3 * np.sin(2 * np.pi * 440 * np.arange(t) / SR)
    return (tone + 0.1 * rng.standard_normal(t)).astype(np.float32)


def test_mdct_tdac_perfect_reconstruction(material):
    y = imdct(mdct(material), material.shape[-1])
    np.testing.assert_allclose(y, material, atol=1e-6)


def test_compression_adds_bounded_artifacts(material):
    def snr(a, b):
        return 10 * np.log10(np.sum(a ** 2) / (np.sum((a - b) ** 2) + 1e-20))

    prev = -np.inf
    for br in (96, 128, 192):
        z = mp3_like_compression(material, SR, br,
                                 rng=np.random.default_rng(1))
        assert z.shape == material.shape and z.dtype == np.float32
        s = snr(material, z)
        assert 8.0 < s < 40.0, (br, s)   # artifacts present but bounded
        assert s > prev - 0.5, (br, s, prev)  # more bitrate, fewer artifacts
        prev = s


def test_compression_bandwidth_truncation(material):
    z = mp3_like_compression(material, SR, 96.0)
    spec = np.abs(np.fft.rfft(z))
    f = np.fft.rfftfreq(material.shape[-1], 1 / SR)
    frac = np.sum(spec[f > 16000.0] ** 2) / np.sum(spec ** 2)
    assert frac < 1e-4, frac  # 96 kbps lowpass ~15 kHz


def test_compression_stereo_and_determinism(material):
    x = np.stack([material, -material])
    a = mp3_like_compression(x, SR, 128.0, rng=np.random.default_rng(3))
    b = mp3_like_compression(x, SR, 128.0, rng=np.random.default_rng(3))
    assert a.shape == x.shape
    np.testing.assert_array_equal(a, b)


def test_musdb_hook_uses_simulation_without_audiomentations(rng):
    """The dataset's compressor hook falls back to the simulation and is
    reproducible from the dataset RNG (like the noise augmentation)."""
    import random

    from mss_tf_locoformer_tpu.data.musdb import _mp3_compressor

    try:
        import audiomentations  # noqa: F401
        pytest.skip("real encoder present; fallback not in play")
    except ImportError:
        pass

    cfg = {"mp3_bitrate": (96, 192)}
    x = (0.2 * rng.standard_normal(SR // 2)).astype(np.float32)
    outs = []
    for _ in range(2):
        comp = _mp3_compressor(cfg, random.Random(7))
        outs.append(comp(samples=x, sample_rate=SR))
    np.testing.assert_array_equal(outs[0], outs[1])
    assert outs[0].shape == x.shape
    assert not np.array_equal(outs[0], x)
