"""Native FLAC decoder vs the pure-Python encoder fixture.

Reference parity target: soundfile-based FLAC reads in
``data/mss_dataset.py:430-460`` (partial reads included).
"""

import numpy as np
import pytest

from mss_tf_locoformer_tpu.data import audio_io

from flac_writer import write_flac

pytestmark = pytest.mark.skipif(
    not audio_io.native_available() or
    not hasattr(audio_io._load_native(), "flac_info"),
    reason="native FLAC decoder unavailable")

SR = 44100


def _rand_pcm(rng, frames, ch, bits=16):
    lim = 1 << (bits - 1)
    return rng.integers(-lim, lim, size=(frames, ch), dtype=np.int64)


def _expected(data, bits):
    return data.astype(np.float64) / (1 << (bits - 1))


def test_verbatim_stereo_roundtrip(tmp_path, rng):
    data = _rand_pcm(rng, 1000, 2)
    p = str(tmp_path / "a.flac")
    write_flac(p, data, SR, block_size=256)
    meta = audio_io.info(p)
    assert (meta.frames, meta.sample_rate, meta.channels) == (1000, SR, 2)
    out, sr = audio_io.read(p)
    assert sr == SR and out.shape == (1000, 2)
    np.testing.assert_allclose(out, _expected(data, 16), atol=1e-7)


def test_partial_reads_cross_frames(tmp_path, rng):
    data = _rand_pcm(rng, 2000, 2)
    p = str(tmp_path / "a.flac")
    write_flac(p, data, SR, block_size=192)
    full, _ = audio_io.read(p)
    for start, n in ((0, 100), (150, 400), (191, 2), (192, 192), (1900, 300)):
        seg, _ = audio_io.read(p, start=start, frames=n)
        assert seg.shape == (n, 2)
        avail = min(n, 2000 - start)
        np.testing.assert_array_equal(seg[:avail], full[start:start + avail])
        assert not seg[avail:].any()  # zero-padded past EOF


@pytest.mark.parametrize("assignment", [8, 9, 10])
def test_stereo_decorrelation_modes(tmp_path, rng, assignment):
    data = _rand_pcm(rng, 700, 2)
    p = str(tmp_path / f"dec{assignment}.flac")
    write_flac(p, data, SR, block_size=256, assignment=assignment)
    out, _ = audio_io.read(p)
    np.testing.assert_allclose(out, _expected(data, 16), atol=1e-7)


def test_constant_and_fixed_subframes(tmp_path, rng):
    n = 512
    smooth = np.cumsum(rng.integers(-50, 50, size=n)).astype(np.int64)
    data = np.stack([np.full(n, -123, dtype=np.int64), smooth], axis=1)
    p = str(tmp_path / "f.flac")
    write_flac(p, data, SR, block_size=256, modes=["constant", "fixed2"])
    out, _ = audio_io.read(p)
    np.testing.assert_allclose(out, _expected(data, 16), atol=1e-7)


def test_fixed_orders_and_escape_partition(tmp_path, rng):
    n = 384
    ramp = (np.arange(n) * 7 - 900).astype(np.int64)
    noisy = rng.integers(-3000, 3000, size=n, dtype=np.int64)
    data = np.stack([ramp, noisy], axis=1)
    p = str(tmp_path / "e.flac")
    write_flac(p, data, SR, block_size=192, modes=["fixed1", "fixed0escape"])
    out, _ = audio_io.read(p)
    np.testing.assert_allclose(out, _expected(data, 16), atol=1e-7)


def test_lpc_subframe(tmp_path, rng):
    n = 600
    x = np.cumsum(rng.integers(-20, 20, size=(n, 1)), axis=0).astype(np.int64)
    p = str(tmp_path / "l.flac")
    write_flac(p, x, SR, block_size=256, modes="lpc")
    out, _ = audio_io.read(p)
    np.testing.assert_allclose(out, _expected(x, 16), atol=1e-7)


@pytest.mark.parametrize("bits", [8, 24])
def test_bit_depths(tmp_path, rng, bits):
    data = _rand_pcm(rng, 500, 1, bits=bits)
    p = str(tmp_path / f"b{bits}.flac")
    write_flac(p, data, SR, bits=bits, block_size=256)
    meta = audio_io.info(p)
    assert meta.bits == bits
    out, _ = audio_io.read(p)
    np.testing.assert_allclose(out[:, 0], _expected(data[:, 0], bits), atol=1e-9)


def test_short_last_frame(tmp_path, rng):
    data = _rand_pcm(rng, 300, 1)  # 256 + 44
    p = str(tmp_path / "s.flac")
    write_flac(p, data, SR, block_size=256)
    out, _ = audio_io.read(p)
    assert out.shape[0] == 300
    np.testing.assert_allclose(out[:, 0], _expected(data[:, 0], 16), atol=1e-7)


def test_musdb_dataset_on_flac_tree(tmp_path, rng):
    """End-to-end: a FLAC MUSDB tree scans and serves chunks (reference
    behavior via soundfile, data/mss_dataset.py:430-460)."""
    from mss_tf_locoformer_tpu.data.musdb import MUSDBDataset
    stems = ("vocals", "drums", "bass", "other")
    n = SR // 10
    for t in range(2):
        d = tmp_path / "train" / f"track{t}"
        d.mkdir(parents=True)
        for s in stems:
            data = _rand_pcm(rng, n, 2) // 4
            write_flac(str(d / f"{s}.flac"), data, SR, block_size=1024)
        write_flac(str(d / "mixture.flac"), _rand_pcm(rng, n, 2) // 4, SR,
                   block_size=1024)
    ds = MUSDBDataset(str(tmp_path), subset="train", sample_rate=SR,
                      segment_length=n // 2, sources=list(stems),
                      metadata_cache=False, verbose=False, seed=0)
    item = ds[0]
    assert item["mixture"].shape == (2, n // 2)
    for s in stems:
        assert item[s].shape == (2, n // 2)
        assert np.isfinite(item[s]).all()


def test_flac_without_native_engine_errors(monkeypatch, tmp_path, rng):
    data = _rand_pcm(rng, 100, 1)
    p = str(tmp_path / "x.flac")
    write_flac(p, data, SR)
    monkeypatch.setattr(audio_io, "_load_native", lambda: None)
    with pytest.raises(ValueError, match="FLAC"):
        audio_io.read(p)


def test_malformed_residual_partition_rejected(tmp_path, rng):
    """A frame whose Rice partition size is SMALLER than the predictor order
    must be rejected cleanly: count = psize - order would underflow uint32
    and write ~4e9 residuals off the end of the sample buffer (heap
    corruption) without the bounds guard in flac_decoder.cpp read_residual."""
    from flac_writer import BitWriter, _crc8, _crc16, _utf8_number

    block, bits = 256, 16
    samples = rng.integers(-1000, 1000, size=block).tolist()

    stream = bytearray(b"fLaC")
    si = bytearray()
    si += block.to_bytes(2, "big") * 2
    si += (0).to_bytes(3, "big") * 2
    si += (((SR << 44) | (0 << 41) | ((bits - 1) << 36) | block)
           .to_bytes(8, "big"))
    si += bytes(16)
    stream += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    hdr = BitWriter()
    hdr.write(0x3FFE, 14)
    hdr.write(0, 2)          # reserved + fixed-blocksize strategy
    hdr.write(7, 4)          # blocksize: 16-bit at end
    hdr.write(0, 4)          # sample rate from STREAMINFO
    hdr.write(0, 4)          # 1 channel
    hdr.write(4, 3)          # 16-bit
    hdr.write(0, 1)
    for b in _utf8_number(0):
        hdr.write(b, 8)
    hdr.write(block - 1, 16)
    hdr.align()
    header_bytes = hdr.getvalue()
    header_bytes += bytes([_crc8(header_bytes)])

    body = BitWriter()
    body.write(0, 1)         # subframe padding bit
    body.write(8 + 2, 6)     # FIXED, order 2
    body.write(0, 1)         # no wasted bits
    body.write_signed(samples[0], bits)
    body.write_signed(samples[1], bits)
    body.write(0, 2)         # residual method 0
    body.write(8, 4)         # partition order 8 -> psize = 1 < order 2 (BAD)
    for _ in range(256):     # plausible-looking partitions so a vulnerable
        body.write(0, 4)     # decoder keeps consuming
        body.write(1, 1)     # one unary-coded zero residual
    body.align()
    payload = header_bytes + body.getvalue()
    stream += payload + _crc16(payload).to_bytes(2, "big")

    p = tmp_path / "evil.flac"
    p.write_bytes(bytes(stream))
    with pytest.raises(ValueError):
        audio_io.read(str(p))


def test_bitflipped_flac_never_crashes(tmp_path, rng):
    """Byte-corruption fuzz over the frame region: every mutation must decode
    to a well-shaped array or raise ValueError — never crash the process."""
    data = _rand_pcm(rng, 600, 2) // 8
    good = tmp_path / "good.flac"
    write_flac(str(good), data, SR, block_size=256, modes="fixed2")
    raw = bytearray(good.read_bytes())
    start = 4 + 4 + 34                      # past fLaC + STREAMINFO
    bad = tmp_path / "bad.flac"
    for pos in range(start, min(len(raw), start + 300)):
        mutated = bytearray(raw)
        mutated[pos] ^= 0xFF
        bad.write_bytes(bytes(mutated))
        try:
            out, _ = audio_io.read(str(bad))
            assert out.ndim == 2 and out.shape[1] == 2
        except ValueError:
            pass
