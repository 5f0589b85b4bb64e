"""Data pipeline tests: native/numpy audio IO parity, MUSDB dataset
semantics, loader, collate."""

import numpy as np
import pytest

from mss_tf_locoformer_tpu.data import audio_io
from mss_tf_locoformer_tpu.data.loader import DataLoader, prefetch_to_device
from mss_tf_locoformer_tpu.data.musdb import (MUSDBDataset, SimpleAudioDataset,
                                              collate_fn)

SR = 8000  # small files for speed; semantics identical to 44.1k
STEMS = ("vocals", "drums", "bass", "other")


@pytest.fixture
def musdb_root(tmp_path, rng):
    for subset, tracks in (("train", 3), ("test", 2)):
        for t in range(tracks):
            d = tmp_path / subset / f"track{t}"
            d.mkdir(parents=True)
            n = SR * 4 + t * 317
            stems = {}
            for s in STEMS:
                x = (0.1 * rng.standard_normal((n, 2))).astype(np.float32)
                stems[s] = x
                audio_io.write(str(d / f"{s}.wav"), x, SR, bits=16)
            audio_io.write(str(d / "mixture.wav"), sum(stems.values()), SR, bits=16)
    return tmp_path


def test_wav_roundtrip_16(tmp_path, rng):
    x = (0.5 * rng.standard_normal((1000, 2))).astype(np.float32)
    p = str(tmp_path / "a.wav")
    audio_io.write(p, x, 44100, bits=16)
    meta = audio_io.info(p)
    assert (meta.frames, meta.sample_rate, meta.channels, meta.bits) == (1000, 44100, 2, 16)
    y, sr = audio_io.read(p)
    assert sr == 44100
    # write scales by 32767, read divides by 32768 (soundfile-compatible):
    # error <= 0.5/32768 rounding + |x|/32768 scale asymmetry
    np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1.0 / 16384)


def test_wav_roundtrip_float32(tmp_path, rng):
    x = (0.5 * rng.standard_normal((777, 1))).astype(np.float32)
    p = str(tmp_path / "f.wav")
    audio_io.write(p, x, 22050, bits=32)
    y, sr = audio_io.read(p)
    np.testing.assert_array_equal(y, x)


def test_partial_read_and_eof_zero_pad(tmp_path, rng):
    x = (0.5 * rng.standard_normal((500, 2))).astype(np.float32)
    p = str(tmp_path / "p.wav")
    audio_io.write(p, x, 44100, bits=32)
    seg, _ = audio_io.read(p, start=100, frames=200)
    np.testing.assert_array_equal(seg, x[100:300])
    tail, _ = audio_io.read(p, start=400, frames=200)
    np.testing.assert_array_equal(tail[:100], x[400:])
    assert np.all(tail[100:] == 0)


def test_native_and_numpy_agree(tmp_path, rng):
    if not audio_io.native_available():
        pytest.skip("native lib unavailable")
    x = (0.5 * rng.standard_normal((300, 2))).astype(np.float32)
    p = str(tmp_path / "n.wav")
    audio_io.write(p, x, 16000, bits=16)
    nat, _ = audio_io.read(p, start=50, frames=100)
    npy = audio_io._np_read(p, 50, 100)
    np.testing.assert_allclose(nat, npy, atol=1e-7)
    assert audio_io.info(p) == audio_io._np_info(p)


def test_dataset_chunks(musdb_root):
    ds = MUSDBDataset(str(musdb_root), subset="train", sample_rate=SR,
                      segment_length=SR, sources=list(STEMS), verbose=False, seed=0)
    sample = ds[0]
    assert set(STEMS) | {"mixture"} <= set(sample)
    for k in STEMS + ("mixture",):
        assert sample[k].shape == (2, SR)
    # mixture rebuilt from stems by default
    np.testing.assert_allclose(sample["mixture"],
                               sum(sample[s] for s in STEMS), atol=1e-6)


def test_dataset_full_track(musdb_root):
    ds = MUSDBDataset(str(musdb_root), subset="test", sample_rate=SR,
                      segment_length=None, sources=list(STEMS), verbose=False)
    s0 = ds[0]
    assert s0["mixture"].shape[0] == 2
    assert s0["mixture"].shape[-1] >= SR * 4


def test_metadata_cache_reused(musdb_root):
    ds1 = MUSDBDataset(str(musdb_root), subset="train", sample_rate=SR,
                       segment_length=SR, sources=list(STEMS), verbose=False)
    assert (musdb_root / ".cache" / "train_metadata.pkl").exists()
    ds2 = MUSDBDataset(str(musdb_root), subset="train", sample_rate=SR,
                       segment_length=SR, sources=list(STEMS), verbose=False)
    assert [t.name for t in ds1.track_infos] == [t.name for t in ds2.track_infos]


def test_precomputed_chunk_index(musdb_root):
    ds = MUSDBDataset(str(musdb_root), subset="train", sample_rate=SR,
                      segment_length=SR, sources=list(STEMS), verbose=False,
                      precompute_chunks=True)
    assert len(ds) >= len(ds.track_infos)
    sample = ds[1]
    assert sample["mixture"].shape == (2, SR)


def test_missing_stem_is_zeros(musdb_root):
    (musdb_root / "train" / "track0" / "drums.wav").unlink()
    # invalidate caches (config unchanged but file set changed)
    import shutil
    shutil.rmtree(musdb_root / ".cache", ignore_errors=True)
    ds = MUSDBDataset(str(musdb_root), subset="train", sample_rate=SR,
                      segment_length=SR, sources=list(STEMS), verbose=False,
                      random_chunks=False)
    sample = ds[0]
    assert np.all(sample["drums"] == 0)


def test_augmentations_bounded(musdb_root):
    ds = MUSDBDataset(str(musdb_root), subset="train", sample_rate=SR,
                      segment_length=SR, sources=list(STEMS), verbose=False,
                      augmentation=True, seed=3)
    for i in range(4):
        s = ds[i]
        for k in STEMS:
            assert np.max(np.abs(s[k])) <= 1.0 + 1e-6


def test_collate_pads():
    a = {"mixture": np.ones((2, 10), np.float32), "name": "a"}
    b = {"mixture": np.ones((2, 7), np.float32), "name": "b"}
    out = collate_fn([a, b])
    assert out["mixture"].shape == (2, 2, 10)
    assert np.all(out["mixture"][1, :, 7:] == 0)
    assert out["name"] == ["a", "b"]


def test_dataloader_threaded(musdb_root):
    ds = MUSDBDataset(str(musdb_root), subset="train", sample_rate=SR,
                      segment_length=SR, sources=list(STEMS), verbose=False,
                      random_chunks=False)
    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=3)
    batches = list(dl)
    assert len(batches) == len(dl)
    assert batches[0]["mixture"].shape[0] == 2


def test_prefetch_to_device(musdb_root):
    ds = MUSDBDataset(str(musdb_root), subset="train", sample_rate=SR,
                      segment_length=SR, sources=list(STEMS), verbose=False,
                      random_chunks=False)
    dl = DataLoader(ds, batch_size=1)
    seen = 0
    for batch in prefetch_to_device(dl, size=2):
        assert hasattr(batch["mixture"], "devices")
        seen += 1
    assert seen == len(dl)


def test_simple_audio_dataset(musdb_root):
    ds = SimpleAudioDataset(str(musdb_root / "test"), sample_rate=SR)
    assert len(ds) == 2 * 5
    item = ds[0]
    assert item["audio"].ndim == 2


def test_native_scan_matches_python_fallback(musdb_root, rng, monkeypatch):
    """Chunk index from the native single-pass loudness scanner equals the
    per-chunk-read fallback, including quiet-chunk rejection."""
    # make one track with a silent middle in all stems
    d = musdb_root / "train" / "track0"
    n = SR * 4
    for s in STEMS:
        x = (0.1 * rng.standard_normal((n, 2))).astype(np.float32)
        x[SR:3 * SR] = 0.0
        audio_io.write(str(d / f"{s}.wav"), x, SR, bits=16)
    audio_io.write(str(d / "mixture.wav"),
                   np.zeros((n, 2), np.float32), SR, bits=16)

    kw = dict(subset="train", sample_rate=SR, segment_length=SR,
              sources=list(STEMS), verbose=False, precompute_chunks=True,
              min_loudness=1e-3, metadata_cache=False)
    ds_fast = MUSDBDataset(str(musdb_root), **kw)
    idx_fast = list(ds_fast._chunk_index)

    monkeypatch.setattr(audio_io, "scan_mean_abs", lambda *a, **k: None)
    ds_slow = MUSDBDataset(str(musdb_root), **kw)
    assert idx_fast == list(ds_slow._chunk_index)
    # the silent stretch must actually reject some offsets
    n_total = sum(1 + (SR * 4 + t * 317 - SR) // (SR // 2) for t in range(3))
    assert len(idx_fast) < n_total


def test_loader_backpressure():
    """A stalled consumer must not cause workers to buffer the whole epoch:
    in-flight batches are capped at num_workers * prefetch_factor."""
    import time

    calls = []

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            calls.append(i)
            return {"x": np.zeros(4, np.float32)}

    dl = DataLoader(DS(), batch_size=1, num_workers=2, prefetch_factor=2)
    it = iter(dl)
    next(it)
    time.sleep(0.5)  # consumer stalls; workers must block on the cap
    assert len(calls) <= 1 + 2 * 2, f"loaded {len(calls)} items while stalled"
    assert len(list(it)) == 63  # drains fully once the consumer resumes


def test_loader_abandoned_epoch_unblocks_workers():
    """Closing the iterator mid-epoch must not leave workers blocked."""
    import threading

    class DS:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"x": np.zeros(2, np.float32)}

    before = threading.active_count()
    dl = DataLoader(DS(), batch_size=1, num_workers=2, prefetch_factor=1)
    it = iter(dl)
    next(it)
    it.close()  # abandon the epoch
    import time
    time.sleep(0.5)
    assert threading.active_count() <= before + 1
