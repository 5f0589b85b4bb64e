"""Tensor-parallel execution of the fused Pallas block steps.

The Megatron-style sharding rules in ``parallel/sharding.py`` let XLA's
SPMD partitioner shard the UNFUSED math; ``pallas_call``, however, carries
no SPMD rules, so under an ``mp > 1`` mesh the fused block-step kernels
used to be disabled outright (round-2 gate) — a silent perf cliff exactly
where model parallelism matters.  This module removes that cliff the
TPU-idiomatic way: ``jax.shard_map`` over the mesh's ``mp`` axis with the
kernels running on per-shard slices and ONE explicit psum per step —
the same collective SPMD inserts for the unfused row-parallel matmuls.

Split choices (consistent with ``parallel/sharding.py``):

* attention — HEADS over mp.  Each shard runs the whole fused step
  (norm -> QKV -> RoPE -> flash -> out-proj) for its ``n_heads/mp`` heads
  with ``residual=False``: the out-projection contracts only the local
  head columns, so shard outputs are partial sums.  One psum, then the
  post-projection dropout site and the residual add run outside (they
  must see the full sum).  The in-SDPA probability dropout site stays
  in-kernel — it is per-head — with the shard index folded into the seed
  so head masks decorrelate across shards.

* SwiGLU FFN — INNER channels over mp.  The SwiGLU gate couples channels
  only pointwise, so conv (column-parallel), gate, the in-kernel inner
  dropout site, and deconv (row-parallel -> partial sums) all run locally
  on ``inner/mp`` channels; one psum, then the deconv bias (excluded from
  the local kernel), the outer dropout site, and the residual run outside.

The packed torch weight layouts (``w_qkv [3A, C]``, ``conv_w [2I, C, k]``)
interleave q/k/v and value/gate halves along the split axis, so a
contiguous mp split of the stored arrays is NOT head/half-aligned; the
wrappers reshape to head/half-major views (``[3, H, D, C]``,
``[2, I, C, k]``) before shard_map and let SPMD reshard — a one-off
weight-sized collective per step, negligible against the activations.

The shard_map is FULLY manual over BOTH mesh axes: Mosaic custom calls
refuse to lower under any remaining automatic axis ("Mosaic kernels
cannot be automatically partitioned" — caught by lowering the wrapper
for the TPU target on an AbstractMesh, ``tests/test_tp_fused.py``), so
rows are mapped explicitly over ``dp`` (``P("dp")``) rather than riding
GSPMD.  GSPMD still composes these wrappers with the pjit train step —
it resharding-matches the explicit specs at the shard_map boundary.

Numerics note: shard partial sums are added in the compute dtype by the
psum (one bf16 add at mp=2) and the two dropout sites draw different
masks than the single-device kernels — TP training is numerically
equivalent but not bit-identical to single-device training (matching the
unfused TP path, whose collectives reassociate the same sums).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pallas.attention_block import fused_attention_block
from ..ops.pallas.swiglu_block import fused_norm_ffn_residual

__all__ = ["tp_attention_step", "tp_ffn_step"]


# odd word folding the LINEAR shard index (over dp AND mp) into the
# dropout seed: mp shards hold different heads/channels and dp shards hold
# different rows, but the in-kernel mask generators index by LOCAL
# row/head, so an unfolded seed would replay identical masks at different
# global positions.  Deliberately NOT the golden-ratio word the in-kernel
# generators stride their (tile, head, subtile) indices by — with the same
# constant, shard idx+1 at tile t would reproduce shard idx's tile t+1
# seed exactly (idx*G + (t+1)*G == idx'*G + (t'+1)*G whenever
# idx + t == idx' + t'), i.e. bit-identical masks at shifted positions.
# With a distinct odd word A, a collision needs t' - t == (idx - idx') *
# A * G^-1 (mod 2^32) == (idx - idx') * 0x4799E743 — >1.2e9 even for
# adjacent shards, far beyond any tile/head index range.
_SHARD_SEED_STRIDE = -2048144789  # 0x85EBCA6B as int32 (murmur3 c2)


def _local_seed(seed, mp: int):
    if seed is None:
        return None
    idx = (jax.lax.axis_index("dp") * mp
           + jax.lax.axis_index("mp")).astype(jnp.int32)
    return seed + idx * jnp.int32(_SHARD_SEED_STRIDE)


def tp_attention_step(x, gamma, w_qkv, w_out, n_heads: int, num_groups: int,
                      eps: float, rope: bool, theta: float,
                      drop_rate: float, seed, mesh: Mesh):
    """``OutProj(MHSA(RMSGroupNorm(x)))`` with heads sharded over ``mp``.

    x ``[R, L, C]`` (rows may be dp-sharded; replicated over mp) ->
    ``[R, L, C]``.  Returns the PRE-dropout, PRE-residual projected output:
    the caller applies the post-projection dropout site and adds x (the
    reference's two remaining pieces of the attention sub-step).
    """
    mp = mesh.shape["mp"]
    c = x.shape[-1]
    a = w_qkv.shape[0] // 3
    if n_heads % mp:
        raise ValueError(f"n_heads {n_heads} not divisible by mp={mp}")
    head_dim = a // n_heads
    wq4 = w_qkv.reshape(3, n_heads, head_dim, c)   # head-major split view
    wo3 = w_out.reshape(c, n_heads, head_dim)
    has_seed = seed is not None

    def body(x, gamma, wq4l, wo3l, *s):
        hl = wq4l.shape[1]
        part = fused_attention_block(
            x, gamma, wq4l.reshape(3 * hl * head_dim, c),
            wo3l.reshape(c, hl * head_dim), hl, num_groups, eps, rope,
            theta, drop_rate, _local_seed(s[0], mp) if has_seed else None,
            residual=False)
        return jax.lax.psum(part, "mp")

    args = [x, gamma, wq4, wo3]
    in_specs = [P("dp", None, None), P(),
                P(None, "mp", None, None), P(None, "mp", None)]
    if has_seed:
        args.append(jnp.asarray(seed, jnp.int32).reshape(1))
        in_specs.append(P())
    return jax.shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                         out_specs=P("dp", None, None),
                         check_vma=False)(*args)


def tp_ffn_step(x, gamma, conv_w, conv_b, deconv_w, kernel: int,
                num_groups: int, eps: float, drop_rate: float, seed,
                mesh: Mesh):
    """``deconv(drop_inner(SwiGLU(conv(RMSGroupNorm(x)))))`` with the inner
    dim sharded over ``mp``.

    x ``[R, S2, C]`` -> ``[R, S2, C]``.  Returns the PRE-bias, PRE-outer-
    dropout, PRE-residual output: the caller adds ``deconv_b``, applies the
    outer dropout site, and adds x.
    """
    mp = mesh.shape["mp"]
    c = x.shape[-1]
    inner = deconv_w.shape[0]
    if inner % mp:
        raise ValueError(f"ffn inner dim {inner} not divisible by mp={mp}")
    cw4 = conv_w.reshape(2, inner, c, kernel)      # value/gate-major view
    cb2 = conv_b.reshape(2, inner)
    has_seed = seed is not None

    def body(x, gamma, cw4l, cb2l, dwl, *s):
        il = dwl.shape[0]
        part = fused_norm_ffn_residual(
            x, gamma, cw4l.reshape(2 * il, c, kernel), cb2l.reshape(2 * il),
            dwl, jnp.zeros((c,), deconv_w.dtype), kernel, num_groups, eps,
            drop_rate, _local_seed(s[0], mp) if has_seed else None,
            residual=False)
        return jax.lax.psum(part, "mp")

    args = [x, gamma, cw4, cb2, deconv_w]
    in_specs = [P("dp", None, None), P(), P(None, "mp", None, None),
                P(None, "mp"), P("mp", None, None)]
    if has_seed:
        args.append(jnp.asarray(seed, jnp.int32).reshape(1))
        in_specs.append(P())
    return jax.shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                         out_specs=P("dp", None, None),
                         check_vma=False)(*args)
