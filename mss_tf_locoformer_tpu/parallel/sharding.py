"""Tensor-parallel (``mp`` axis) sharding rules for Locoformer parameters.

The reference has no model parallelism (SURVEY.md §2.9: the largest config is
~25 M params); this is the TPU-native extension for configs that outgrow one
chip's HBM: a Megatron-style column/row split of the per-block matmuls over
the mesh's ``mp`` axis, expressed purely as ``NamedSharding`` annotations —
XLA's SPMD partitioner inserts the ICI collectives (one psum per attention
step and one per FFN, on the row-parallel products).

Split choices per block:
  * ``attn/qkv/weight [3A, C]``          -> rows over mp (column-parallel;
    the packed 3A axis is not head-aligned per shard, so SPMD re-propagates
    the sharding through the ``[B,L,3,H,D]`` head reshape and picks the
    collective placement itself — functionally exact either way)
  * ``attn/aggregate_heads/weight [C, A]`` -> columns over mp (row-parallel:
    contraction over the sharded head dim -> psum)
  * ``ffn_*/conv1d/weight [2I, C, k]`` + bias -> rows over mp (the SwiGLU
    value/gate halves are sharded independently but consistently)
  * ``ffn_*/deconv1d/weight [I, C, k]``  -> rows over mp (ConvTranspose
    weight is [in, out, k]: ``in`` is the sharded inner dim -> psum);
    its bias [C] stays replicated
  * everything else (norms, encoder/decoder convs, band modules) replicated

These rules apply to ANY pytree whose leaf paths contain the module names
(params, or optimizer moments mirroring them), so one call shards a whole
``TrainState``.  NB: the SwiGLU 2I axis packs value rows then gate rows; an
``mp`` split therefore gives each shard ``2I/mp`` rows mixing value and gate
halves only if ``mp`` does not divide I — require ``I % mp == 0`` so shards
hold matching value/gate slices (checked in ``validate_tp``).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tp_shardings", "validate_tp"]

_RULES = (
    # (exact path segments that must ALL appear, leaf name, spec factory).
    # Segment matching is EXACT: "deconv1d" must not satisfy a "conv1d"
    # rule, or the [C] deconv bias (replicated per the row-parallel
    # pattern, see the module docstring) would be sharded over mp.
    (("attn", "qkv"), "weight", lambda: P("mp", None)),
    (("attn", "aggregate_heads"), "weight", lambda: P(None, "mp")),
    (("conv1d",), "weight", lambda: P("mp", None, None)),
    (("conv1d",), "bias", lambda: P("mp")),
    (("deconv1d",), "weight", lambda: P("mp", None, None)),
)


def _spec_for(path: tuple, leaf) -> P:
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    name = keys[-1] if keys else ""
    joined = set(keys)
    for segments, leaf_name, spec in _RULES:
        if name == leaf_name and all(s in joined for s in segments):
            sp = spec()
            if len(sp) <= getattr(leaf, "ndim", 0):
                return sp
    return P()


def tp_shardings(tree: Any, mesh: Mesh):
    """Same-structure tree of ``NamedSharding`` implementing the TP rules.

    Works on a params tree or a whole ``TrainState`` (optimizer moments
    mirror the params paths; scalars fall through to replicated).
    """
    def leaf_sharding(path, leaf):
        if getattr(leaf, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _spec_for(path, leaf))

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def validate_tp(model_cfg, mp: int) -> None:
    """Hard requirements for an even TP split of a Locoformer config."""
    if mp <= 1:
        return
    if model_cfg.attention_dim % (model_cfg.n_heads * mp):
        raise ValueError(
            f"attention_dim {model_cfg.attention_dim} not divisible by "
            f"n_heads*mp = {model_cfg.n_heads}*{mp}")
    if model_cfg.n_heads % mp:
        raise ValueError(f"n_heads {model_cfg.n_heads} not divisible by mp={mp}")
    dims = model_cfg.ffn_hidden_dim
    if not isinstance(dims, (tuple, list)):
        dims = (dims,)
    for d in dims:
        if d % mp:
            raise ValueError(f"ffn_hidden_dim {d} not divisible by mp={mp}")
