"""PyTorch checkpoint -> JAX parameter-tree converter.

Handles both reference layouts (``utils/common.py:46-102`` and the ESPnet
``separator.``-prefixed flat state_dicts, ``README.md:522-531``):

  * MSS training checkpoints: ``{'model_state_dict': ..., 'optimizer_state_dict':
    ..., 'epoch': ..., ...}`` or a raw state_dict (``inference/separate.py:107-110``).
  * ESPnet speech checkpoints: flat dicts whose separator weights carry a
    ``separator.`` key prefix.

Because our layers store weights in torch layouts (see ``nn/layers.py``),
conversion is a pure key-rename — no transposes — which keeps it bit-exact.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

__all__ = ["convert_state_dict", "load_torch_checkpoint", "params_to_state_dict"]


def _set(tree: Dict[str, Any], path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _rename(key: str):
    """Map one torch state_dict key to a flax param path (tuple of strings)."""
    # encoder: conv.0.* -> conv/*, conv.1.* -> conv_norm/*
    m = re.fullmatch(r"conv\.0\.(weight|bias)", key)
    if m:
        return ("conv", m.group(1))
    m = re.fullmatch(r"conv\.1\.(weight|bias)", key)
    if m:
        return ("conv_norm", m.group(1))
    if key in ("deconv.weight", "deconv.bias"):
        return tuple(key.split("."))
    # blocks.I.PATH.rest
    m = re.fullmatch(r"blocks\.(\d+)\.(freq_path|frame_path)\.(.*)", key)
    if m:
        i, path, rest = m.groups()
        return (f"blocks_{i}", path) + _rename_locoformer(rest)
    # band-split module (BS-Locoformer): the reference separator holds one
    # ``BandSplitModule`` attribute named ``band_split_module`` whose inner
    # encoder ModuleList is *also* named ``band_split_module``
    # (standalone/bslocoformer_separator.py:137,212-236).  Our flax model
    # flattens both levels into top-level ``band_encoder_*``/``band_decoder_*``
    # submodules, so the outer prefix is dropped entirely.
    m = re.fullmatch(r"band_split_module\.(.*)", key)
    if m:
        return _rename_bandsplit(m.group(1))
    raise KeyError(f"Unrecognized torch key: {key}")


def _rename_locoformer(rest: str):
    m = re.fullmatch(r"ffn_norm\.(\d+)\.(gamma|beta|weight|bias)", rest)
    if m:
        return (f"ffn_norm_{m.group(1)}", m.group(2))
    m = re.fullmatch(r"ffn\.(\d+)\.(conv1d|deconv1d)\.(weight|bias)", rest)
    if m:
        return (f"ffn_{m.group(1)}", m.group(2), m.group(3))
    # ConvDeconv1d stores layers in an nn.Sequential: net.0 = conv, net.3 = deconv
    m = re.fullmatch(r"ffn\.(\d+)\.net\.0\.(weight|bias)", rest)
    if m:
        return (f"ffn_{m.group(1)}", "conv1d", m.group(2))
    m = re.fullmatch(r"ffn\.(\d+)\.net\.3\.(weight|bias)", rest)
    if m:
        return (f"ffn_{m.group(1)}", "deconv1d", m.group(2))
    m = re.fullmatch(r"attn_norm\.(gamma|beta|weight|bias)", rest)
    if m:
        return ("attn_norm", m.group(1))
    if rest == "attn.qkv.weight":
        return ("attn", "qkv", "weight")
    if rest == "attn.aggregate_heads.0.weight":
        return ("attn", "aggregate_heads", "weight")
    raise KeyError(f"Unrecognized locoformer key suffix: {rest}")


def _rename_bandsplit(rest: str):
    # band_split_module.B.{0:GroupNorm,1:Conv1d}.* (encoder per band)
    m = re.fullmatch(r"band_split_module\.(\d+)\.([01])\.(weight|bias)", rest)
    if m:
        b, idx, p = m.groups()
        sub = "norm" if idx == "0" else "conv"
        return (f"band_encoder_{b}", sub, p)
    # bandwise_decoding_module.B.{0:GN,1:Conv,3:Conv,4:Conv}.*
    m = re.fullmatch(r"bandwise_decoding_module\.(\d+)\.(\d)\.(weight|bias)", rest)
    if m:
        b, idx, p = m.groups()
        sub = {"0": "norm", "1": "conv_0", "3": "conv_1", "4": "conv_2"}[idx]
        return (f"band_decoder_{b}", sub, p)
    raise KeyError(f"Unrecognized band-split key suffix: {rest}")


def convert_state_dict(state_dict: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Torch state_dict (numpy-valued mapping) -> flax ``{'params': ...}``."""
    params: Dict[str, Any] = {}
    for key, val in state_dict.items():
        path = _rename(key)
        _set(params, path, np.asarray(val))
    return {"params": params}


def params_to_state_dict(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse direction: flax params -> flat torch-style state_dict (for
    exporting trained TPU weights back to the PyTorch ecosystem)."""
    tree = params.get("params", params)
    flat: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            flat[_unrename(path)] = np.asarray(node)

    walk(tree, ())
    return flat


def _unrename(path) -> str:
    parts = list(path)
    # BS-Locoformer band modules: invert the prefix-drop of ``_rename``
    # (reference nests both ModuleLists under the separator's
    # ``band_split_module`` attribute).
    m = re.fullmatch(r"band_(encoder|decoder)_(\d+)", parts[0])
    if m:
        kind, b = m.groups()
        sub, p = parts[1], parts[2]
        if kind == "encoder":
            idx = {"norm": "0", "conv": "1"}[sub]
            return f"band_split_module.band_split_module.{b}.{idx}.{p}"
        idx = {"norm": "0", "conv_0": "1", "conv_1": "3", "conv_2": "4"}[sub]
        return f"band_split_module.bandwise_decoding_module.{b}.{idx}.{p}"
    out = []
    for p in parts:
        m = re.fullmatch(r"blocks_(\d+)", p)
        if m:
            out.append(f"blocks.{m.group(1)}")
            continue
        m = re.fullmatch(r"(ffn|ffn_norm)_(\d+)", p)
        if m:
            out.append(f"{m.group(1)}.{m.group(2)}")
            continue
        out.append(p)
    key = ".".join(out)
    key = key.replace("conv_norm", "conv.1")
    if key.startswith("conv.") and not key.startswith("conv.1"):
        key = "conv.0." + key.split(".", 1)[1]
    key = key.replace("aggregate_heads.weight", "aggregate_heads.0.weight")
    return key


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth`` checkpoint into a numpy state_dict.

    Accepts the wrapped trainer layout, a raw state_dict, or an ESPnet flat
    dict (``separator.`` prefixes are stripped; non-separator keys dropped).
    """
    try:
        import torch
    except ImportError as e:
        raise RuntimeError(
            "Loading .pth checkpoints requires torch (CPU build is enough). "
            "Alternatively convert offline and ship the .msgpack/orbax form.") from e
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    if any(k.startswith("separator.") for k in ckpt):
        ckpt = {k[len("separator."):]: v for k, v in ckpt.items()
                if k.startswith("separator.")}
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()}
