"""Audio I/O: native C++ engine (ctypes) with a pure-numpy fallback.

Replaces the reference's soundfile/torchaudio dependency (``data/
mss_dataset.py:430-460``, ``utils/audio.py``).  The native path
(``native/audio_io.cpp``) does sample-accurate segment reads without holding
the GIL, so host loader threads overlap with TPU compute; the numpy fallback
parses RIFF directly and supports the same formats (PCM 16/24/32,
float32/64).  Resampling (rare — MUSDB18-HQ is uniformly 44.1 kHz) uses
scipy's polyphase resampler, matching ``torchaudio.functional.resample``
semantics (windowed-sinc).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

__all__ = ["AudioInfo", "info", "read", "write", "resample", "native_available"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libaudio_io.so"))
    srcs = [os.path.abspath(os.path.join(_NATIVE_DIR, f))
            for f in ("audio_io.cpp", "flac_decoder.cpp")]
    srcs = [s for s in srcs if os.path.exists(s)]
    stale = (not os.path.exists(so) or
             (srcs and os.path.getmtime(so) < max(map(os.path.getmtime, srcs))))
    if stale and srcs:
        try:
            subprocess.run(["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                            "-o", so] + srcs,
                           check=True, capture_output=True, timeout=240)
        except Exception:
            if not os.path.exists(so):
                return None
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.wav_info.restype = ctypes.c_int
        lib.wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                                 ctypes.POINTER(ctypes.c_int32),
                                 ctypes.POINTER(ctypes.c_int32),
                                 ctypes.POINTER(ctypes.c_int32),
                                 ctypes.POINTER(ctypes.c_int32)]
        lib.wav_read.restype = ctypes.c_int64
        lib.wav_read.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                                 ctypes.POINTER(ctypes.c_float)]
        lib.wav_write.restype = ctypes.c_int
        lib.wav_write.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                                  ctypes.c_int32]
        lib.wav_scan_meanabs.restype = ctypes.c_int64
        lib.wav_scan_meanabs.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                         ctypes.c_int64,
                                         ctypes.POINTER(ctypes.c_double),
                                         ctypes.c_int64]
        try:
            lib.flac_info.restype = ctypes.c_int
            lib.flac_info.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_int64),
                                      ctypes.POINTER(ctypes.c_int32),
                                      ctypes.POINTER(ctypes.c_int32),
                                      ctypes.POINTER(ctypes.c_int32)]
            lib.flac_read.restype = ctypes.c_int64
            lib.flac_read.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                      ctypes.c_int64,
                                      ctypes.POINTER(ctypes.c_float)]
        except AttributeError:
            pass  # stale .so without the FLAC symbols
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load_native() is not None


@dataclass(frozen=True)
class AudioInfo:
    frames: int
    sample_rate: int
    channels: int
    bits: int
    fmt: int  # 1 = PCM, 3 = IEEE float


# ---------------------------------------------------------------- numpy path

def _np_header(path: str):
    with open(path, "rb") as f:
        riff = f.read(12)
        if len(riff) < 12 or riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
            raise ValueError(f"Not a RIFF/WAVE file: {path}")
        fmt = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            tag = hdr[:4]
            sz = int.from_bytes(hdr[4:8], "little")
            if tag == b"fmt ":
                raw = f.read(sz + (sz & 1))
                code = int.from_bytes(raw[0:2], "little")
                if code == 0xFFFE and sz >= 40:
                    code = int.from_bytes(raw[24:26], "little")
                fmt = dict(
                    format=code,
                    channels=int.from_bytes(raw[2:4], "little"),
                    sample_rate=int.from_bytes(raw[4:8], "little"),
                    bits=int.from_bytes(raw[14:16], "little"),
                )
            elif tag == b"data":
                if fmt is None:
                    raise ValueError(f"data chunk before fmt in {path}")
                return fmt, f.tell(), sz
            else:
                f.seek(sz + (sz & 1), 1)
    raise ValueError(f"No data chunk in {path}")


def _np_info(path: str) -> AudioInfo:
    fmt, _, data_bytes = _np_header(path)
    frame_bytes = fmt["bits"] // 8 * fmt["channels"]
    return AudioInfo(frames=data_bytes // frame_bytes, sample_rate=fmt["sample_rate"],
                     channels=fmt["channels"], bits=fmt["bits"], fmt=fmt["format"])


def _np_read(path: str, start: int, frames: int) -> np.ndarray:
    fmt, offset, data_bytes = _np_header(path)
    ch, bits, code = fmt["channels"], fmt["bits"], fmt["format"]
    frame_bytes = bits // 8 * ch
    total = data_bytes // frame_bytes
    out = np.zeros((frames, ch), dtype=np.float32)
    if start >= total:
        return out
    n = min(frames, total - start)
    with open(path, "rb") as f:
        f.seek(offset + start * frame_bytes)
        raw = f.read(n * frame_bytes)
    n = len(raw) // frame_bytes
    buf = np.frombuffer(raw[:n * frame_bytes], dtype=np.uint8)
    if code == 3 and bits == 32:
        x = buf.view(np.float32).astype(np.float32)
    elif code == 3 and bits == 64:
        x = buf.view(np.float64).astype(np.float32)
    elif bits == 16:
        x = buf.view(np.int16).astype(np.float32) / 32768.0
    elif bits == 24:
        b = buf.reshape(-1, 3).astype(np.uint32)
        v = (b[:, 0] << 8) | (b[:, 1] << 16) | (b[:, 2] << 24)
        x = (v.view(np.int32) >> 8).astype(np.float32) / 8388608.0
    elif bits == 32:
        x = (buf.view(np.int32).astype(np.float64) / 2147483648.0).astype(np.float32)
    else:
        raise ValueError(f"Unsupported WAV: bits={bits} fmt={code}")
    out[:n] = x.reshape(n, ch)
    return out


# ---------------------------------------------------------------- public API

def _is_flac(path: str) -> bool:
    return path.lower().endswith(".flac")


def _require_flac(lib):
    if lib is None or not hasattr(lib, "flac_info"):
        raise ValueError(
            "FLAC decoding requires the native audio engine "
            "(g++ build of native/audio_io.cpp + flac_decoder.cpp failed or "
            "is unavailable); re-encode to WAV or fix the toolchain.")


def _flac_info(path: str) -> AudioInfo:
    lib = _load_native()
    _require_flac(lib)
    frames = ctypes.c_int64()
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    bits = ctypes.c_int32()
    rc = lib.flac_info(path.encode(), ctypes.byref(frames), ctypes.byref(sr),
                       ctypes.byref(ch), ctypes.byref(bits))
    if rc != 0:
        raise ValueError(f"flac_info failed ({rc}) for {path}")
    return AudioInfo(frames.value, sr.value, ch.value, bits.value, 1)


def info(path: str) -> AudioInfo:
    if _is_flac(path):
        return _flac_info(path)
    lib = _load_native()
    if lib is None:
        return _np_info(path)
    frames = ctypes.c_int64()
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    bits = ctypes.c_int32()
    fmt = ctypes.c_int32()
    rc = lib.wav_info(path.encode(), ctypes.byref(frames), ctypes.byref(sr),
                      ctypes.byref(ch), ctypes.byref(bits), ctypes.byref(fmt))
    if rc != 0:
        raise ValueError(f"wav_info failed ({rc}) for {path}")
    return AudioInfo(frames.value, sr.value, ch.value, bits.value, fmt.value)


def read(path: str, start: int = 0, frames: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Read ``[frames, channels]`` float32 starting at ``start``; zero-pads
    past EOF (the reference relies on this for tail chunks).  Returns
    ``(data, sample_rate)``."""
    meta = info(path)
    if frames is None:
        frames = meta.frames - start
    lib = _load_native()
    if _is_flac(path):
        _require_flac(lib)
        out = np.zeros((frames, meta.channels), dtype=np.float32)
        rc = lib.flac_read(path.encode(), start, frames,
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc < 0:
            raise ValueError(f"flac_read failed ({rc}) for {path}")
        return out, meta.sample_rate
    if lib is None:
        return _np_read(path, start, frames), meta.sample_rate
    out = np.zeros((frames, meta.channels), dtype=np.float32)
    rc = lib.wav_read(path.encode(), start, frames,
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc < 0:
        raise ValueError(f"wav_read failed ({rc}) for {path}")
    return out, meta.sample_rate


def write(path: str, data: np.ndarray, sample_rate: int, bits: int = 16) -> None:
    """Write ``[frames, channels]`` or ``[frames]`` float32 audio."""
    data = np.asarray(data, dtype=np.float32)
    if data.ndim == 1:
        data = data[:, None]
    data = np.ascontiguousarray(data)
    lib = _load_native()
    if lib is None:
        _np_write(path, data, sample_rate, bits)
        return
    rc = lib.wav_write(path.encode(),
                       data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       data.shape[0], data.shape[1], sample_rate, bits)
    if rc != 0:
        raise ValueError(f"wav_write failed ({rc}) for {path}")


def _np_write(path: str, data: np.ndarray, sample_rate: int, bits: int) -> None:
    ch = data.shape[1]
    if bits == 32:
        payload = data.astype("<f4").tobytes()
        code = 3
    elif bits == 16:
        payload = np.round(np.clip(data, -1, 1) * 32767.0).astype("<i2").tobytes()
        code = 1
    else:
        raise ValueError(f"bits must be 16 or 32, got {bits}")
    bytes_per = bits // 8
    hdr = (b"RIFF" + (36 + len(payload)).to_bytes(4, "little") + b"WAVEfmt "
           + (16).to_bytes(4, "little") + code.to_bytes(2, "little")
           + ch.to_bytes(2, "little") + sample_rate.to_bytes(4, "little")
           + (sample_rate * ch * bytes_per).to_bytes(4, "little")
           + (ch * bytes_per).to_bytes(2, "little") + bits.to_bytes(2, "little")
           + b"data" + len(payload).to_bytes(4, "little"))
    with open(path, "wb") as f:
        f.write(hdr + payload)


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase windowed-sinc resample along axis 0 (torchaudio-equivalent)."""
    if orig_sr == target_sr:
        return audio
    from math import gcd
    from scipy.signal import resample_poly
    g = gcd(orig_sr, target_sr)
    return resample_poly(audio, target_sr // g, orig_sr // g, axis=0).astype(np.float32)


def scan_mean_abs(path: str, chunk_frames: int, hop_frames: int
                  ) -> Optional[np.ndarray]:
    """Per-chunk mean |sample| (over frames and channels) at offsets
    ``i * hop_frames``, windows zero-padded past EOF — one streaming pass in
    the native engine.  Returns None when the native library is unavailable
    or the file isn't a supported WAV (callers fall back to per-chunk reads).
    """
    lib = _load_native()
    if lib is None or not str(path).lower().endswith(".wav"):
        return None
    meta = info(path)
    total = meta.frames
    n_chunks = 1 if total <= chunk_frames else 1 + (total - chunk_frames) // hop_frames
    out = np.zeros(n_chunks, dtype=np.float64)
    rc = lib.wav_scan_meanabs(str(path).encode(), chunk_frames, hop_frames,
                              out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                              n_chunks)
    if rc < 0:
        return None
    return out[:rc]
