"""SpeechMixtureDataset: wsj0-2mix-style parallel-directory corpora."""

import numpy as np
import pytest

from mss_tf_locoformer_tpu.data.loader import DataLoader
from mss_tf_locoformer_tpu.data.speech import SpeechMixtureDataset
from mss_tf_locoformer_tpu.utils.audio import save_audio


@pytest.fixture
def corpus(tmp_path, rng):
    for d in ("mix", "s1", "s2"):
        (tmp_path / d).mkdir()
    for utt, frames in [("u1.wav", 12000), ("u2.wav", 9000)]:
        s1 = 0.1 * rng.standard_normal(frames).astype(np.float32)
        s2 = 0.1 * rng.standard_normal(frames).astype(np.float32)
        save_audio(str(tmp_path / "s1" / utt), s1, 8000, normalize=False)
        save_audio(str(tmp_path / "s2" / utt), s2, 8000, normalize=False)
        save_audio(str(tmp_path / "mix" / utt), s1 + s2, 8000, normalize=False)
    return tmp_path


def test_full_utterances(corpus):
    ds = SpeechMixtureDataset(str(corpus), num_spk=2, sample_rate=8000,
                              segment_length=None)
    assert len(ds) == 2
    item = ds[0]
    assert item["mixture"].shape == (1, 12000)
    assert item["sources"].shape == (2, 1, 12000)
    # mixture == sum of sources (16-bit wav quantization tolerance)
    np.testing.assert_allclose(item["mixture"], item["sources"].sum(0), atol=2e-4)


def test_segment_crop_and_loader(corpus):
    ds = SpeechMixtureDataset(str(corpus), num_spk=2, sample_rate=8000,
                              segment_length=4000, random_crop=True, seed=1)
    item = ds[1]
    assert item["mixture"].shape == (1, 4000)
    assert item["sources"].shape == (2, 1, 4000)
    # sources stay aligned with the mixture under random cropping
    np.testing.assert_allclose(item["mixture"], item["sources"].sum(0), atol=2e-4)
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batch = next(iter(loader))
    assert batch["mixture"].shape == (2, 1, 4000)
    assert batch["sources"].shape == (2, 2, 1, 4000)


def test_missing_speaker_file_raises(corpus):
    (corpus / "s2" / "u2.wav").unlink()
    with pytest.raises(FileNotFoundError):
        SpeechMixtureDataset(str(corpus), num_spk=2)


def test_wrong_spk_dirs_raises(corpus):
    with pytest.raises(ValueError):
        SpeechMixtureDataset(str(corpus), num_spk=3, spk_dirs=["s1", "s2"])
