"""Model loading + end-to-end separation (reference ``inference/separate.py``).

``load_model`` accepts:
  * an orbax checkpoint directory written by our trainer (``train/checkpoint.py``),
  * a PyTorch ``.pth`` (wrapped trainer dict, raw state_dict, or ESPnet
    ``separator.``-prefixed) via the converter — the reference's two layouts
    (``inference/separate.py:107-110``),
plus an optional YAML config (else defaults), mirroring ``load_model``
(``:79-116``).

``separate_audio`` mirrors ``:119-169``: load at the model sample rate,
stereo->mono mean, separate, mono->duplicated-stereo, peak-normalized WAV
writes named ``{input}_{stem}.wav`` — except the single full-track forward is
replaced by chunked overlap-add (``infer/overlap_add.py``).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from ..core.config import Config, ModelConfig, load_config
from ..core.precision import BF16, FP32, Precision
from ..models import build_model
from ..models.mss_tflocoformer import TFLocoformerMSS
from ..utils.audio import load_audio, save_audio
from .overlap_add import SeparationEngine

__all__ = ["load_model", "separate_audio", "make_engine",
           "load_speech_separator"]


def load_model(checkpoint_path: str, config_path: Optional[str] = None,
               precision: Precision = BF16) -> Tuple[TFLocoformerMSS, dict, ModelConfig]:
    """Returns ``(model, params, model_config)``.

    Default inference precision is bf16 (fp32 islands preserved at the
    reference's autocast-disabled sites); pass ``precision=FP32`` for the
    bit-parity path.  The reference infers full-track fp32 — on a 16 GB v5e
    that layout OOMs for the base config at 8 s x batch 4, so bf16 is the
    TPU-native default.
    """
    if config_path:
        cfg = load_config(config_path).model
    else:
        cfg = ModelConfig()
    model = build_model(cfg, precision=precision)

    if checkpoint_path.endswith((".pth", ".pt", ".ckpt")):
        from ..convert.torch_ckpt import convert_state_dict, load_torch_checkpoint
        params = convert_state_dict(load_torch_checkpoint(checkpoint_path))
    elif os.path.isdir(checkpoint_path):
        import orbax.checkpoint as ocp
        if getattr(cfg, "stereo", False):
            dummy = np.zeros((1, 2, cfg.n_fft * 2), dtype=np.float32)
        else:
            dummy = np.zeros((1, cfg.n_fft * 2), dtype=np.float32)
        template = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), dummy))
        ckptr = ocp.StandardCheckpointer()
        # accept either a bare params dir or a trainer state dir
        try:
            params = ckptr.restore(checkpoint_path, template)
        except Exception:
            state = ckptr.restore(os.path.join(checkpoint_path, "state"), None)
            params = state["params"] if "params" in state else state
    else:
        raise FileNotFoundError(f"Unsupported checkpoint: {checkpoint_path}")
    return model, params, cfg


def load_speech_separator(checkpoint_path: str, cfg):
    """Speech-family analogue of :func:`load_model`: build the
    ``TFLocoformerSeparator`` from a ``SpeechConfig`` and load either an
    orbax checkpoint (bare params, or the trainer's ``state`` dir) or a
    torch ``.pth`` (ESPnet ``separator.``-prefixed or raw state_dict) —
    the two layouts the reference's pretrained speech models ship in
    (``egs2/*/enh1/exp/*/valid.loss.ave_5best.pth``).  Returns
    ``(module, params)``."""
    from ..models.tflocoformer import TFLocoformerSeparator

    module = TFLocoformerSeparator(**cfg.separator.module_kwargs())
    if checkpoint_path.endswith((".pth", ".pt", ".ckpt")):
        from ..convert.torch_ckpt import (convert_state_dict,
                                          load_torch_checkpoint)
        params = convert_state_dict(load_torch_checkpoint(checkpoint_path))
    elif os.path.isdir(checkpoint_path):
        import jax.numpy as jnp
        import orbax.checkpoint as ocp

        from ..ops.stft import stft
        dummy = jnp.swapaxes(
            stft(np.zeros((1, cfg.stft.n_fft * 4), np.float32),
                 cfg.stft.n_fft, cfg.stft.hop_length), -1, -2)
        template = jax.eval_shape(
            lambda: module.init(jax.random.PRNGKey(0), dummy))
        ckptr = ocp.StandardCheckpointer()
        try:
            params = ckptr.restore(checkpoint_path, template)
        except Exception:
            state = ckptr.restore(os.path.join(checkpoint_path, "state"),
                                  None)
            params = state["params"] if "params" in state else state
    else:
        raise FileNotFoundError(f"Unsupported checkpoint: {checkpoint_path}")
    return module, params


def make_engine(model: TFLocoformerMSS, params, chunk_seconds: float = 8.0,
                overlap_seconds: float = 1.0, sample_rate: int = 44100,
                batch_size: int = 2, sharding=None) -> SeparationEngine:
    # params ride as a jit ARGUMENT (not a closure constant): captured trees
    # are embedded into the lowered program — at xlarge scale the serialized
    # program exceeds remote-compile request limits (SeparationEngine docs).
    return SeparationEngine(
        model.apply,
        chunk_samples=int(chunk_seconds * sample_rate),
        overlap=int(overlap_seconds * sample_rate),
        batch_size=batch_size, sharding=sharding, params=params)


def separate_audio(
    input_path: str,
    output_dir: str,
    model: TFLocoformerMSS,
    params,
    sample_rate: int = 44100,
    chunk_seconds: float = 8.0,
    overlap_seconds: float = 1.0,
    batch_size: int = 2,
    save_stems: bool = True,
    sharding=None,
) -> Dict[str, np.ndarray]:
    audio, sr = load_audio(input_path, sample_rate=sample_rate)
    if getattr(model.config, "stereo", False):
        # stereo BS-Locoformer lane: the model sees both channels jointly
        if audio.shape[0] == 1:
            audio = np.repeat(audio, 2, axis=0)
        inp = audio[:2]  # [2, T]
    else:
        inp = audio.mean(axis=0)  # stereo -> mono mean (reference :136-139)

    engine = make_engine(model, params, chunk_seconds, overlap_seconds,
                         sample_rate, batch_size, sharding)
    stems = engine(inp)

    if save_stems:
        os.makedirs(output_dir, exist_ok=True)
        base = os.path.splitext(os.path.basename(input_path))[0]
        for name, est in stems.items():
            if est.ndim == 1:  # mono -> fake stereo (reference :158-162)
                est = np.stack([est, est])
            save_audio(os.path.join(output_dir, f"{base}_{name}.wav"),
                       est, sample_rate, normalize=True)
    return stems
