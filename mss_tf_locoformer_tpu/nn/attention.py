"""Multi-head self-attention with optional RoPE.

Mirrors the reference MHSA (``models/mss_tflocoformer.py:467-559``): fused
QKV projection without bias, interleaved-pair RoPE on Q/K in fp32, SDPA, and
a bias-free output projection + dropout.  The ``flash`` backend selects the
Pallas fused kernel; ``xla`` is the einsum path (fp32 softmax either way).

With ``prenorm_gamma`` (an RMSGroupNorm scale from the enclosing block) the
whole attention sub-step ``x + OutProj(MHSA(norm(x)))`` runs as ONE Pallas
kernel (``ops/pallas/attention_block.py``); the caller must not norm or add
the residual itself.  Parameters keep the exact same tree
(``qkv/weight``, ``aggregate_heads/weight``) so checkpoints are unaffected.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from ..ops.rope import apply_rope
from .layers import Linear, _uniform_init

__all__ = ["MultiHeadSelfAttention", "attn_step_applicable"]


def attn_step_applicable(norm_type: str, flash_attention: bool,
                         emb_dim: int, attention_dim: int, n_heads: int,
                         seq_len: int, itemsize: int = 2) -> bool:
    """Whether the fully fused norm+MHSA+residual kernel serves this step
    (the block passes the pre-norm scale into the attention when it does).
    ``itemsize`` = compute dtype width (fp32 doubles the kernel's VMEM
    footprint vs the production bf16).  Under a model-parallel mesh the
    step runs shard_map-wrapped with heads split over mp
    (``parallel/tp_fused.py``), so the VMEM gate applies to the PER-SHARD
    shape."""
    from ..ops.pallas import pallas_enabled, tp_fused_mesh
    if not (flash_attention and norm_type == "rmsgroupnorm"):
        return False
    from ..ops.pallas.attention_block import supports_block
    mesh = tp_fused_mesh()
    if mesh is not None:
        mp = mesh.shape["mp"]
        if n_heads % mp or attention_dim % n_heads:
            return False
        return supports_block(emb_dim, attention_dim // mp, n_heads // mp,
                              seq_len, itemsize)
    if not pallas_enabled():
        return False
    return supports_block(emb_dim, attention_dim, n_heads, seq_len, itemsize)


class _Weight(nn.Module):
    """Registers a ``weight`` param identical to ``Linear(use_bias=False)``
    without applying it (the fused kernel consumes the raw matrix)."""

    shape: tuple
    bound: float

    @nn.compact
    def __call__(self):
        return self.param("weight", _uniform_init(self.bound), self.shape)


class MultiHeadSelfAttention(nn.Module):
    emb_dim: int
    attention_dim: int
    n_heads: int = 8
    dropout: float = 0.0
    use_rope: bool = True
    flash_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    # pre-norm fusion (set by the block when the fused attention-step kernel
    # applies): RMSGroupNorm group count / eps for the in-kernel norm
    prenorm_groups: int = 4
    prenorm_eps: float = 1.0e-5

    @nn.compact
    def __call__(self, x, deterministic: bool = True, prenorm_gamma=None):
        """x: [B, L, C] -> [B, L, C]; attention over L."""
        b, l, _ = x.shape
        head_dim = self.attention_dim // self.n_heads

        if prenorm_gamma is not None:
            from ..ops.pallas import tp_fused_mesh
            from ..ops.pallas.attention_block import fused_attention_block
            w_qkv = _Weight((self.attention_dim * 3, self.emb_dim),
                            1.0 / (self.emb_dim ** 0.5), name="qkv")()
            w_out = _Weight((self.emb_dim, self.attention_dim),
                            1.0 / (self.attention_dim ** 0.5),
                            name="aggregate_heads")()
            drop = 0.0 if deterministic else self.dropout
            seed = None
            if drop > 0.0:  # in-kernel dropout replay (fwd + bwd)
                import jax
                seed = jax.random.randint(self.make_rng("dropout"), (1,), 0,
                                          jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
            mesh = tp_fused_mesh()
            if mesh is not None:
                # heads sharded over mp; the post-projection dropout site
                # and the residual apply to the psum'd FULL output here
                from ..parallel.tp_fused import tp_attention_step
                xd = x.astype(self.dtype)
                out = tp_attention_step(
                    xd, prenorm_gamma, w_qkv, w_out, self.n_heads,
                    self.prenorm_groups, self.prenorm_eps, self.use_rope,
                    10000.0, drop, seed, mesh)
                out = nn.Dropout(self.dropout,
                                 deterministic=deterministic)(out)
                return xd + out
            return fused_attention_block(
                x.astype(self.dtype), prenorm_gamma, w_qkv, w_out,
                self.n_heads, self.prenorm_groups, self.prenorm_eps,
                self.use_rope, 10000.0, drop, seed)

        # Row-chunking decision for the unfused path: rows ([B] here) are
        # independent, and at xlarge fallback shapes the fp32 RoPE/score
        # intermediates (rows x H x L x D fp32, several live in the
        # backward) are what pushed the 15 s train step to 35.7 GB of HLO
        # temps (PERFORMANCE.md "The xlarge lane, root-caused").  Training
        # (non-deterministic) chunks above 512 MB; inference, which holds
        # no backward temps, only above 2 GB.
        rope_bytes = b * self.n_heads * l * head_dim * 4
        ceiling = (self._XLA_CHUNK_BYTES if not deterministic
                   else 4 * self._XLA_CHUNK_BYTES)
        if rope_bytes > ceiling and b >= 8:
            return self._chunked_mhsa(x, b, l, head_dim, deterministic)

        qkv = Linear(self.emb_dim, self.attention_dim * 3, use_bias=False,
                     dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, l, 3, self.n_heads, head_dim)
        qkv = jnp.moveaxis(qkv, (2, 3), (0, 2))  # [3, B, H, L, D]
        q, k, v = qkv[0], qkv[1], qkv[2]

        # the reference's in-SDPA attention-probability dropout site
        # (``dropout_p=self.dropout if self.training else 0.0``, ``:524-531``)
        drop_kw = {}
        if not deterministic and self.dropout > 0.0:
            drop_kw = dict(dropout_rate=self.dropout,
                           dropout_key=self.make_rng("dropout"))

        backend = "flash" if self.flash_attention else "auto"
        if self.use_rope and self.flash_attention:
            # RoPE fused into the Pallas kernel (fp32 inside) — saves two
            # full HBM round-trips of Q and K (dropout requests route to
            # the XLA path inside, which rotates explicitly)
            out = dot_product_attention(q, k, v, backend=backend,
                                        fused_rope=True, **drop_kw)
        else:
            if self.use_rope:
                q = apply_rope(q).astype(self.dtype)  # fp32 island inside
                k = apply_rope(k).astype(self.dtype)
            out = dot_product_attention(q, k, v, backend=backend,
                                        **drop_kw)  # [B,H,L,D]

        out = jnp.swapaxes(out, 1, 2).reshape(b, l, self.attention_dim)
        out = Linear(self.attention_dim, self.emb_dim, use_bias=False,
                     dtype=self.dtype, name="aggregate_heads")(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)

    _XLA_CHUNK_BYTES = 512 * 1024 * 1024

    def _chunked_mhsa(self, x, b, l, head_dim, deterministic):
        """The unfused MHSA over row chunks: ``lax.map`` under
        ``jax.checkpoint`` caps the fp32 RoPE and projection intermediates
        at one chunk's worth in the forward AND the backward recompute.
        Registers the same ``qkv/weight`` / ``aggregate_heads/weight``
        params as the Linear path (checkpoints unaffected); the outer
        post-projection dropout stays outside (its mask is [rows, L, C] —
        small next to the per-head temps).  Dropout keys fold_in per chunk
        so the checkpoint replay is bit-exact."""
        import jax

        w_qkv = _Weight((self.attention_dim * 3, self.emb_dim),
                        1.0 / (self.emb_dim ** 0.5), name="qkv")()
        w_out = _Weight((self.emb_dim, self.attention_dim),
                        1.0 / (self.attention_dim ** 0.5),
                        name="aggregate_heads")()
        drop = 0.0 if deterministic else self.dropout
        key = self.make_rng("dropout") if drop > 0.0 else None
        dt = self.dtype

        def chain(xc, kc):
            rc = xc.shape[0]
            qkv = xc.astype(dt) @ w_qkv.T.astype(dt)
            qkv = qkv.reshape(rc, l, 3, self.n_heads, head_dim)
            qkv = jnp.moveaxis(qkv, (2, 3), (0, 2))
            q, k, v = qkv[0], qkv[1], qkv[2]
            drop_kw = (dict(dropout_rate=drop, dropout_key=kc)
                       if drop > 0.0 else {})
            backend = "flash" if self.flash_attention else "auto"
            if self.use_rope and self.flash_attention:
                out = dot_product_attention(q, k, v, backend=backend,
                                            fused_rope=True, **drop_kw)
            else:
                if self.use_rope:
                    q = apply_rope(q).astype(dt)
                    k = apply_rope(k).astype(dt)
                out = dot_product_attention(q, k, v, backend=backend,
                                            **drop_kw)
            out = jnp.swapaxes(out, 1, 2).reshape(rc, l, self.attention_dim)
            return out @ w_out.T.astype(dt)

        rc = max(1, int(self._XLA_CHUNK_BYTES
                        // (self.n_heads * l * head_dim * 4)))
        nc = -(-b // rc)
        xp = jnp.pad(x, ((0, nc * rc - b), (0, 0), (0, 0)))

        @jax.checkpoint
        def body(args):
            xc, i = args
            kc = jax.random.fold_in(key, i) if drop > 0.0 else None
            return chain(xc, kc)

        ys = jax.lax.map(body, (xp.reshape(nc, rc, l, -1), jnp.arange(nc)))
        out = ys.reshape(nc * rc, l, self.emb_dim)[:b]
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)
