"""MUSDB18/MUSDB18-HQ dataset (host-side, numpy).

Re-design of the reference loader (``data/mss_dataset.py:43-576``) with the
same behavior surface:

  * folder layout ``<root>/<subset>/<track>/{mixture,vocals,drums,bass,other}.wav``
    (FLAC only when a decoder backend is present; MUSDB18-HQ ships WAV),
  * metadata pickle cache with version/config validation (``CACHE_VERSION``),
  * optional precomputed chunk index (hop + loudness filter) cached to pickle,
  * loudness-aware random chunk sampling with bounded retries
    (``max_chunk_attempts``, ``min_loudness`` mean-|x| test),
  * streaming partial reads (native C++ ``audio_io`` engine — no full-track
    loads) with sample-rate-converted offsets,
  * missing stems -> zeros; mixture rebuilt from stem sum after stem-wise
    augmentation (skipped after mix-only augs),
  * train-only augmentations: per-stem gain 0.7-1.3 + clamp, stereo swap
    p=0.5, polarity flip p=0.1, additive Gaussian noise p=0.1 at 25-40 dB
    SNR (mix-only).  The reference's optional MP3-compression aug depends on
    ``audiomentations``/lameenc, absent here; the hook exists and activates
    when that package is importable, matching the reference's own gating.

Samples are ``{'mixture': [C, T] float32, '<stem>': [C, T], ...}``.
"""

from __future__ import annotations

import os
import pickle
import random
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import audio_io

__all__ = ["TrackInfo", "MUSDBDataset", "SimpleAudioDataset", "collate_fn"]

CACHE_VERSION = 2
FILE_TYPES = (".wav", ".flac")


@dataclass(frozen=True)
class TrackInfo:
    name: str
    directory: Path
    length: int
    sample_rate: int
    channels: int
    mixture_path: Path
    source_paths: Dict[str, Optional[Path]]


def _default_aug_config() -> Dict[str, Any]:
    return {
        "loudness": (0.7, 1.3),
        "channel_swap_prob": 0.5,
        "polarity_prob": 0.1,
        "mp3_prob": 0.2,
        "mp3_bitrate": (96, 192),
        "noise_prob": 0.1,
        "noise_snr": (25.0, 40.0),
    }


def _pad_or_trim(audio: np.ndarray, target: int) -> np.ndarray:
    if audio.shape[-1] == target:
        return audio
    if audio.shape[-1] > target:
        return audio[..., :target]
    pad = [(0, 0)] * (audio.ndim - 1) + [(0, target - audio.shape[-1])]
    return np.pad(audio, pad)


class MUSDBDataset:
    def __init__(
        self,
        root_dir: str,
        subset: str = "train",
        sample_rate: int = 44100,
        segment_length: Optional[int] = None,
        sources: Optional[Sequence[str]] = None,
        augmentation: bool = False,
        random_chunks: bool = True,
        min_loudness: float = 1e-4,
        max_chunk_attempts: int = 8,
        metadata_cache: bool = True,
        chunk_cache: Optional[str] = None,
        precompute_chunks: bool = False,
        chunk_hop: Optional[int] = None,
        augmentation_config: Optional[Dict[str, Any]] = None,
        rebuild_mixture: bool = True,
        return_metadata: bool = False,
        verbose: bool = True,
        seed: Optional[int] = None,
    ):
        self.root_dir = Path(root_dir)
        self.subset = subset
        self.sample_rate = sample_rate
        if segment_length is not None and segment_length <= 0:
            raise ValueError("segment_length must be positive")
        self.segment_length = segment_length
        self.sources = list(sources or ["vocals", "other"])
        self.augmentation = bool(augmentation) or isinstance(augmentation, dict)
        self.random_chunks = random_chunks
        self.min_loudness = max(0.0, float(min_loudness))
        self.max_chunk_attempts = max(1, int(max_chunk_attempts))
        self.precompute_chunks = precompute_chunks
        self.chunk_hop = chunk_hop
        self.rebuild_mixture = rebuild_mixture
        self.return_metadata = return_metadata
        self.verbose = verbose
        self._rng = random.Random(seed)

        aug_cfg = dict(augmentation) if isinstance(augmentation, dict) \
            else dict(augmentation_config or {})
        self._aug_config = _default_aug_config()
        self._aug_config.update({k: v for k, v in aug_cfg.items() if v is not None})

        self._metadata_cache_base: Optional[Path] = None
        if metadata_cache:
            base = Path(metadata_cache) if isinstance(metadata_cache, (str, os.PathLike)) \
                else self.root_dir / ".cache"
            base.mkdir(parents=True, exist_ok=True)
            self._metadata_cache_base = base
        if chunk_cache is None:
            self._chunk_cache_base = self._metadata_cache_base
        elif chunk_cache:
            self._chunk_cache_base = Path(chunk_cache)
            self._chunk_cache_base.mkdir(parents=True, exist_ok=True)
        else:
            self._chunk_cache_base = None

        self.subset_dir = self.root_dir / subset
        if not self.subset_dir.exists():
            raise FileNotFoundError(f"Subset directory not found: {self.subset_dir}")

        self.track_infos = self._load_track_metadata()
        if not self.track_infos:
            raise ValueError(f"No tracks found in {self.subset_dir}")

        self._chunk_index: Optional[List[Tuple[int, int]]] = None
        if precompute_chunks:
            if segment_length is None:
                raise ValueError("precompute_chunks requires segment_length")
            self._chunk_index = self._load_or_build_chunk_index()

        self._log(f"Loaded {len(self.track_infos)} tracks from {subset} subset")
        if self._chunk_index is not None:
            self._log(f"Prepared {len(self._chunk_index)} chunk descriptors")

    # ------------------------------------------------------------- metadata

    def _log(self, msg: str) -> None:
        if self.verbose:
            print(msg)

    def _metadata_cache_path(self) -> Optional[Path]:
        if self._metadata_cache_base is None:
            return None
        return self._metadata_cache_base / f"{self.subset}_metadata.pkl"

    def _chunk_cache_path(self) -> Optional[Path]:
        if self._chunk_cache_base is None:
            return None
        return self._chunk_cache_base / \
            f"{self.subset}_sr{self.sample_rate}_seg{self.segment_length or 0}.pkl"

    @staticmethod
    def _resolve_audio_path(directory: Path, stem: str) -> Optional[Path]:
        for ext in FILE_TYPES:
            p = directory / f"{stem}{ext}"
            if p.exists():
                return p
        return None

    def _metadata_config(self) -> Dict[str, Any]:
        return {"root": str(self.root_dir), "subset": self.subset,
                "sample_rate": self.sample_rate, "sources": tuple(self.sources)}

    def _load_track_metadata(self) -> List[TrackInfo]:
        cache = self._metadata_cache_path()
        if cache and cache.exists():
            try:
                with open(cache, "rb") as fh:
                    payload = pickle.load(fh)
                if (payload.get("version") == CACHE_VERSION
                        and payload.get("config") == self._metadata_config()
                        and "tracks" in payload):
                    return [
                        TrackInfo(
                            name=t["name"], directory=Path(t["directory"]),
                            length=t["length"], sample_rate=t["sample_rate"],
                            channels=t.get("channels", 2),
                            mixture_path=Path(t["mixture"]),
                            source_paths={k: (Path(v) if v else None)
                                          for k, v in t["sources"].items()},
                        ) for t in payload["tracks"]
                    ]
            except Exception:
                self._log(f"Metadata cache at {cache} is invalid, rebuilding...")

        tracks: List[TrackInfo] = []
        for directory in sorted(d for d in self.subset_dir.iterdir() if d.is_dir()):
            mixture = self._resolve_audio_path(directory, "mixture")
            if mixture is None:
                self._log(f"Skipping {directory.name}: mixture not found")
                continue
            try:
                meta = audio_io.info(str(mixture))
            except ValueError as exc:
                self._log(f"Skipping {directory.name}: {exc}")
                continue
            tracks.append(TrackInfo(
                name=directory.name, directory=directory, length=meta.frames,
                sample_rate=meta.sample_rate, channels=meta.channels,
                mixture_path=mixture,
                source_paths={s: self._resolve_audio_path(directory, s)
                              for s in self.sources},
            ))

        if cache:
            payload = {
                "version": CACHE_VERSION,
                "config": self._metadata_config(),
                "tracks": [{
                    "name": t.name, "directory": str(t.directory),
                    "length": t.length, "sample_rate": t.sample_rate,
                    "channels": t.channels, "mixture": str(t.mixture_path),
                    "sources": {k: (str(v) if v else None)
                                for k, v in t.source_paths.items()},
                } for t in tracks],
            }
            with open(cache, "wb") as fh:
                pickle.dump(payload, fh)
        return tracks

    # ---------------------------------------------------------- chunk index

    def _chunk_config(self) -> Dict[str, Any]:
        return {"sample_rate": self.sample_rate, "segment_length": self.segment_length,
                "chunk_hop": self.chunk_hop, "min_loudness": self.min_loudness,
                "sources": tuple(self.sources)}

    def _load_or_build_chunk_index(self) -> List[Tuple[int, int]]:
        cache = self._chunk_cache_path()
        if cache and cache.exists():
            try:
                with open(cache, "rb") as fh:
                    payload = pickle.load(fh)
                if (payload.get("version") == CACHE_VERSION
                        and payload.get("config") == self._chunk_config()
                        and "chunks" in payload):
                    return payload["chunks"]
            except Exception:
                self._log(f"Chunk cache at {cache} is invalid, rebuilding...")
        chunks = self._build_chunk_index()
        if cache:
            with open(cache, "wb") as fh:
                pickle.dump({"version": CACHE_VERSION,
                             "config": self._chunk_config(), "chunks": chunks}, fh)
        return chunks

    def _build_chunk_index(self) -> List[Tuple[int, int]]:
        chunks: List[Tuple[int, int]] = []
        for idx, track in enumerate(self.track_infos):
            frames = self._desired_frames_for_sr(track.sample_rate)
            if frames is None:
                chunks.append((idx, 0))
                continue
            hop = self._chunk_hop_frames_for_sr(track.sample_rate)
            if track.length <= frames:
                offsets = [0]
            else:
                offsets = list(range(0, track.length - frames + 1, hop)) or [0]
            loud = self._scan_loudness(track, frames, hop, len(offsets))
            if loud is not None:  # native streaming scan (one pass per stem)
                for off, ok in zip(offsets, loud):
                    if ok:
                        chunks.append((idx, off))
                continue
            for off in offsets:
                if self._passes_loudness(self._load_chunk(track, off)):
                    chunks.append((idx, off))
        return chunks or [(i, 0) for i in range(len(self.track_infos))]

    def _scan_loudness(self, track: TrackInfo, frames: int, hop: int,
                       n_offsets: int) -> Optional[List[bool]]:
        """Per-offset pass/fail via the native single-pass scanner
        (``native/audio_io.cpp: wav_scan_meanabs``).  None -> caller falls
        back to per-chunk reads (non-WAV stems, sr mismatch, or no native
        lib).  Matches ``_passes_loudness``: max over source stems (mixture
        as fallback) >= ``min_loudness``."""
        if self.min_loudness <= 0:
            return [True] * n_offsets
        if track.sample_rate != self.sample_rate:
            return None  # python path measures after resampling
        paths = [p for s, p in track.source_paths.items()
                 if s in self.sources and p is not None and p.exists()]
        if not paths:
            paths = [track.mixture_path]
        best = None
        for p in paths:
            scan = audio_io.scan_mean_abs(str(p), frames, hop)
            if scan is None or len(scan) < n_offsets:
                return None
            best = scan[:n_offsets] if best is None \
                else np.maximum(best, scan[:n_offsets])
        return [bool(v >= self.min_loudness) for v in best]

    def _desired_frames_for_sr(self, sr: int) -> Optional[int]:
        if self.segment_length is None:
            return None
        return max(int(round(self.segment_length * sr / self.sample_rate)), 1)

    def _chunk_hop_frames_for_sr(self, sr: int) -> int:
        if self.segment_length is None:
            return sr
        hop = self.chunk_hop if self.chunk_hop is not None \
            else max(self.segment_length // 2, 1)
        return max(int(round(hop * sr / self.sample_rate)), 1)

    # -------------------------------------------------------------- loading

    def __len__(self) -> int:
        if self._chunk_index is not None:
            return len(self._chunk_index)
        return len(self.track_infos)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        if self.segment_length is None:
            track = self.track_infos[idx % len(self.track_infos)]
            sample = self._load_chunk(track, 0, full=True)
        elif self._chunk_index is not None:
            tidx, off = self._chunk_index[idx % len(self._chunk_index)]
            track = self.track_infos[tidx]
            sample = self._load_chunk(track, off)
        elif self.random_chunks and self.subset == "train":
            sample, track = self._sample_random_chunk()
        else:
            track = self.track_infos[idx % len(self.track_infos)]
            sample = self._load_chunk(track, 0)

        mix_only_aug = False
        if self.augmentation and self.subset == "train":
            sample, mix_only_aug = self._apply_augmentation(sample)
        if self.rebuild_mixture and not mix_only_aug:
            sample["mixture"] = self._sum_stems(sample)
        if self.return_metadata:
            sample["track_name"] = track.name
        return sample

    def _sample_random_chunk(self):
        for _ in range(self.max_chunk_attempts):
            track = self._rng.choice(self.track_infos)
            off = self._random_offset(track)
            sample = self._load_chunk(track, off)
            if self._passes_loudness(sample):
                return sample, track
        track = self._rng.choice(self.track_infos)
        return self._load_chunk(track, 0), track

    def _random_offset(self, track: TrackInfo) -> int:
        frames = self._desired_frames_for_sr(track.sample_rate)
        if frames is None or track.length <= frames:
            return 0
        return self._rng.randint(0, track.length - frames)

    def _passes_loudness(self, sample: Dict[str, np.ndarray]) -> bool:
        if self.min_loudness <= 0:
            return True
        stats = [float(np.mean(np.abs(sample[s]))) for s in self.sources
                 if s in sample]
        if not stats and "mixture" in sample:
            stats = [float(np.mean(np.abs(sample["mixture"])))]
        return not stats or max(stats) >= self.min_loudness

    def _read(self, path: Path, offset: int, frames: Optional[int],
              source_sr: int) -> np.ndarray:
        data, sr = audio_io.read(str(path), start=offset, frames=frames)
        audio = data.T  # [C, T]
        if sr != self.sample_rate:
            audio = audio_io.resample(audio.T, sr, self.sample_rate).T
            if self.segment_length is not None:
                audio = _pad_or_trim(audio, self.segment_length)
        elif self.segment_length is not None and frames is not None:
            audio = _pad_or_trim(audio, self.segment_length)
        return np.ascontiguousarray(audio, dtype=np.float32)

    def _load_chunk(self, track: TrackInfo, offset: int,
                    full: bool = False) -> Dict[str, np.ndarray]:
        frames = None if full else self._desired_frames_for_sr(track.sample_rate)
        sample: Dict[str, np.ndarray] = {}
        sample["mixture"] = self._read(track.mixture_path, offset, frames,
                                       track.sample_rate)
        for stem, path in track.source_paths.items():
            if path is None or not path.exists():
                sample[stem] = np.zeros_like(sample["mixture"])
            else:
                audio = self._read(path, offset, frames, track.sample_rate)
                sample[stem] = _pad_or_trim(audio, sample["mixture"].shape[-1])
        return sample

    def _sum_stems(self, sample: Dict[str, np.ndarray]) -> np.ndarray:
        base = None
        for stem in self.sources:
            audio = sample.get(stem)
            if audio is None:
                continue
            if self.segment_length is not None:
                audio = _pad_or_trim(audio, self.segment_length)
            base = audio.copy() if base is None else base + audio
        if base is None:
            return sample["mixture"]
        return base

    # -------------------------------------------------------- augmentations

    def _apply_augmentation(self, sample):
        cfg = self._aug_config
        r = self._rng
        mix_only = False

        loud = cfg.get("loudness")
        if loud:
            low, high = loud
            for stem in self.sources:
                if stem in sample:
                    gain = r.uniform(low, high)
                    sample[stem] = np.clip(sample[stem] * gain, -1.0, 1.0)

        if cfg.get("channel_swap_prob", 0.0) > 0 and r.random() < cfg["channel_swap_prob"]:
            for key, audio in list(sample.items()):
                if isinstance(audio, np.ndarray) and audio.ndim == 2 and audio.shape[0] == 2:
                    sample[key] = audio[::-1].copy()

        if cfg.get("polarity_prob", 0.0) > 0 and r.random() < cfg["polarity_prob"]:
            for key, audio in list(sample.items()):
                if isinstance(audio, np.ndarray):
                    sample[key] = -audio

        mixture = sample.get("mixture")
        if mixture is not None:
            expected = mixture.shape[-1]
            mp3_prob = cfg.get("mp3_prob", 0.0)
            compressor = _mp3_compressor(cfg, r) if mp3_prob > 0 else None
            if compressor is not None and r.random() < mp3_prob:
                out = compressor(samples=mixture.astype(np.float32),
                                 sample_rate=self.sample_rate)
                sample["mixture"] = _pad_or_trim(out, expected).astype(np.float32)
                mix_only = True
            elif cfg.get("noise_prob", 0.0) > 0 and r.random() < cfg["noise_prob"]:
                snr_min, snr_max = cfg.get("noise_snr", (25.0, 40.0))
                snr = r.uniform(snr_min, snr_max)
                power = float(np.mean(mixture ** 2))
                if power > 0:
                    noise_power = power / (10 ** (snr / 10))
                    # seeded off the dataset RNG (NOT the global np.random):
                    # keeps seeded runs reproducible and avoids shared
                    # mutable state across loader threads
                    noise_rng = np.random.default_rng(r.getrandbits(64))
                    noise = noise_rng.standard_normal(
                        mixture.shape).astype(np.float32)
                    sample["mixture"] = np.clip(
                        mixture + noise * np.sqrt(noise_power), -1.0, 1.0)

            target = sample["mixture"].shape[-1]
            for stem in self.sources:
                if stem in sample:
                    sample[stem] = _pad_or_trim(sample[stem], target)

        for stem in self.sources:
            if stem in sample:
                sample[stem] = np.clip(sample[stem], -1.0, 1.0)
        return sample, mix_only


def _mp3_compressor(cfg, r=None):
    """Real MP3 round trip when audiomentations/lameenc is installed (the
    reference's path, ``data/mss_dataset.py:532-544``); otherwise the native
    MDCT-domain codec simulation (``data/codec.py`` — quantization noise +
    bitrate lowpass, the artifact classes the augmentation exists for).
    ``r`` (the dataset's seeded RNG) keeps the simulated bitrate draw and
    dither reproducible, like the noise augmentation."""
    lo, hi = cfg.get("mp3_bitrate", (96, 192))
    try:
        import audiomentations as AU
        return AU.Mp3Compression(min_bitrate=int(lo), max_bitrate=int(hi),
                                 p=1.0)
    except ImportError:
        pass
    from .codec import mp3_like_compression

    def simulate(samples, sample_rate):
        draw = np.random.default_rng(
            r.getrandbits(64) if r is not None else None)
        bitrate = float(draw.uniform(lo, hi))
        return mp3_like_compression(samples, sample_rate, bitrate, rng=draw)

    return simulate


class SimpleAudioDataset:
    """Recursive glob of audio files for ad-hoc inference batches (reference
    ``data/mss_dataset.py:579-645``)."""

    def __init__(self, root_dir: str, sample_rate: int = 44100,
                 extensions: Sequence[str] = FILE_TYPES):
        self.root_dir = Path(root_dir)
        self.sample_rate = sample_rate
        self.files = sorted(p for p in self.root_dir.rglob("*")
                            if p.suffix.lower() in extensions)

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        path = self.files[idx]
        data, sr = audio_io.read(str(path))
        audio = data.T
        if sr != self.sample_rate:
            audio = audio_io.resample(audio.T, sr, self.sample_rate).T
        return {"audio": np.ascontiguousarray(audio, dtype=np.float32),
                "path": str(path)}


def collate_fn(batch: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Pad every array key to the batch max length and stack; non-arrays
    become lists (reference ``data/mss_dataset.py:648-677``)."""
    out: Dict[str, Any] = {}
    keys = batch[0].keys()
    for key in keys:
        vals = [item[key] for item in batch]
        if isinstance(vals[0], np.ndarray):
            max_len = max(v.shape[-1] for v in vals)
            out[key] = np.stack([_pad_or_trim(v, max_len) for v in vals])
        else:
            out[key] = vals
    return out
