"""Locoformer feed-forward networks: Conv-Deconv local modeling.

``SwiGLUConvDeconv1d`` is the signature "Loco" FFN
(``models/mss_tflocoformer.py:603-655``): Conv1d(dim -> 2*inner, k, stride)
with explicit symmetric padding, SwiGLU gate, ConvTranspose1d back to dim,
crop to the original sequence length.  The pad/crop arithmetic below is the
reference's exactly.

``ConvDeconv1d`` exists in the reference (``:562-600``) but without input
padding — its output is shorter than its crop window for every shipped
kernel/shift combo, so it crashes when used and no config selects it.  We
implement the *intended* op using the same padding scheme as the SwiGLU
variant (documented divergence; parameter schema is unchanged).

TPU note: rows ([B*S1] of them) are batched through one big conv — MXU-sized
matmuls, no per-row loops.  With ``use_fused`` (and stride 1, no active
dropout) the whole conv -> SwiGLU -> deconv chain runs as one Pallas kernel
(``ops/pallas/swiglu_ffn.py``) that never materializes the ``2*inner``-wide
intermediate in HBM.  Parameters live under the same ``conv1d``/``deconv1d``
scopes either way, so checkpoints are path-independent.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import conv as conv_ops
from ..ops.pallas import swiglu_ffn
from .layers import Conv1d, ConvTranspose1d, _uniform_init

__all__ = ["SwiGLUConvDeconv1d", "ConvDeconv1d", "block_step_applicable"]


def block_step_applicable(norm_type: str, ffn_type: str, use_fused: bool,
                          kernel: int, shift: int, seq_len: int,
                          hidden_dim: int, emb_dim: int,
                          needs_bwd: bool = True, itemsize: int = 2) -> bool:
    """Whether the fully fused norm+FFN+residual kernel serves this step
    (the block passes the pre-norm scale into the FFN when it does).
    Shape-gated on the scoped-VMEM limit: training (``needs_bwd``) also
    requires the backward kernel to fit — otherwise the step runs as
    norm + the plain fused FFN kernel, both VMEM-safe on their own.
    ``itemsize`` = the compute dtype width (fp32 rows double the VMEM
    footprint and gate out shapes bf16 admits)."""
    from ..ops.pallas import pallas_enabled, tp_fused_mesh
    from ..ops.pallas.swiglu_block import supports_step
    if not (use_fused and norm_type == "rmsgroupnorm"
            and ffn_type == "swiglu_conv1d"
            and swiglu_ffn.supports(kernel, shift)):
        return False
    mesh = tp_fused_mesh()
    if mesh is not None:
        # shard_map TP mode: inner channels split over mp, per-shard VMEM
        mp = mesh.shape["mp"]
        if hidden_dim % mp:
            return False
        return supports_step(seq_len, emb_dim, hidden_dim // mp, kernel,
                             bwd=needs_bwd, itemsize=itemsize)
    return (pallas_enabled()
            and supports_step(seq_len, emb_dim, hidden_dim, kernel,
                              bwd=needs_bwd, itemsize=itemsize))


def _pad_len(s2: int, kernel: int, shift: int) -> int:
    diff_ks = kernel - shift
    return math.ceil((s2 + 2 * diff_ks - kernel) / shift) * shift + kernel


class _ConvParams(nn.Module):
    """Bare conv weight+bias in a named child scope (torch layouts/inits),
    shared by the fused and unfused execution paths."""

    shape: Tuple[int, ...]   # [O, I, K] conv / [I, O, K] conv-transpose
    fan_in: int
    bias_dim: int

    @nn.compact
    def __call__(self):
        bound = 1.0 / (self.fan_in ** 0.5)
        w = self.param("weight", _uniform_init(bound), self.shape)
        b = self.param("bias", _uniform_init(bound), (self.bias_dim,))
        return w, b


class SwiGLUConvDeconv1d(nn.Module):
    dim: int
    dim_inner: int
    conv1d_kernel: int
    conv1d_shift: int
    dropout: float = 0.0
    use_fused: bool = False
    dtype: jnp.dtype = jnp.float32

    # pre-norm fusion (set by the block when the fused norm+FFN+residual
    # kernel applies): RMSGroupNorm group count / eps for the in-kernel norm
    prenorm_groups: int = 4
    prenorm_eps: float = 1.0e-5

    @nn.compact
    def __call__(self, x, deterministic: bool = True, prenorm_gamma=None):
        """x: [B, S1, S2, C] -> [B, S1, S2, C] (conv along S2, rows B*S1).

        With ``prenorm_gamma`` (a ``[C]`` RMSGroupNorm scale) the whole
        macaron step ``x + dropout(FFN(norm(x)))`` runs as ONE Pallas kernel
        (``ops/pallas/swiglu_block.py``); the caller must not norm or add
        the residual itself."""
        b, s1, s2, h = x.shape
        k, shift = self.conv1d_kernel, self.conv1d_shift
        diff_ks = k - shift
        x = x.reshape(b * s1, s2, h)

        from ..ops.pallas import pallas_enabled
        fused_ok = (self.use_fused and pallas_enabled()
                    and swiglu_ffn.supports(k, shift))
        drop_rate = 0.0 if deterministic else self.dropout
        cw = _ConvParams((self.dim_inner * 2, self.dim, k),
                         fan_in=self.dim * k, bias_dim=self.dim_inner * 2,
                         name="conv1d")
        dw = _ConvParams((self.dim_inner, self.dim, k),
                         fan_in=self.dim * k, bias_dim=self.dim,
                         name="deconv1d")
        conv_w, conv_b = cw()
        deconv_w, deconv_b = dw()

        if prenorm_gamma is not None:
            from ..ops.pallas import tp_fused_mesh
            mesh = tp_fused_mesh()
            assert fused_ok or mesh is not None, \
                "prenorm fusion requires the fused TPU path"
            seed = None
            if drop_rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (1,), 0,
                                          jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
            if mesh is not None:
                # inner dim sharded over mp; the deconv bias, the outer
                # dropout site, and the residual apply to the psum'd FULL
                # output here (``parallel/tp_fused.py``)
                from ..parallel.tp_fused import tp_ffn_step
                xd = x.astype(self.dtype)
                y = tp_ffn_step(xd, prenorm_gamma, conv_w, conv_b, deconv_w,
                                k, self.prenorm_groups, self.prenorm_eps,
                                drop_rate, seed, mesh)
                y = y + deconv_b.astype(y.dtype)
                y = nn.Dropout(self.dropout,
                               deterministic=deterministic)(y)
                return (xd + y).reshape(b, s1, s2, h)
            from ..ops.pallas.swiglu_block import fused_norm_ffn_residual
            y = fused_norm_ffn_residual(
                x.astype(self.dtype), prenorm_gamma, conv_w, conv_b,
                deconv_w, deconv_b, k, self.prenorm_groups,
                self.prenorm_eps, drop_rate, seed)
            return y.reshape(b, s1, s2, h)

        seq_len = _pad_len(s2, k, shift)
        x = jnp.pad(x, ((0, 0), (diff_ks, seq_len - s2 - diff_ks), (0, 0)))

        if fused_ok and not swiglu_ffn.supports_shape(
                seq_len, h, self.dim_inner, k,
                jnp.dtype(self.dtype).itemsize):
            # e.g. the xlarge freq path: gated out of the block step, and
            # the plain kernel's VMEM-resident [Lp, Ip] intermediates do
            # not fit either -> XLA convs (swiglu_ffn.supports_shape)
            from ..ops.pallas import warn_fallback
            warn_fallback("swiglu_ffn.shape")
            fused_ok = False
        if fused_ok:
            seed = None
            if drop_rate > 0.0:  # in-kernel dropout replay (fwd + bwd)
                seed = jax.random.randint(self.make_rng("dropout"), (1,), 0,
                                          jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
            y = swiglu_ffn.swiglu_conv_deconv(
                x.astype(self.dtype), conv_w, conv_b, deconv_w, deconv_b, k,
                drop_rate, seed)
        else:
            y = self._xla_ffn(x.astype(self.dtype),
                              conv_w.astype(self.dtype),
                              conv_b.astype(self.dtype),
                              deconv_w.astype(self.dtype),
                              deconv_b.astype(self.dtype),
                              shift, drop_rate)
        y = y[:, diff_ks:diff_ks + s2, :]
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return y.reshape(b, s1, s2, h)

    # widest live intermediate (bytes) above which the XLA fallback chunks
    # its rows: the unfused conv -> gate -> deconv chain materializes
    # [rows, L, 2*inner] several times, and at xlarge frame-path training
    # shapes ([2049, 655, 2048] bf16 = 5.1 GB EACH) the train step asked
    # for 52 GB of HLO temps on a 15.75 GB chip (tools/xlarge_probe.py)
    _XLA_CHUNK_BYTES = 512 * 1024 * 1024

    def _xla_ffn(self, x, conv_w, conv_b, deconv_w, deconv_b, shift,
                 drop_rate):
        """Unfused conv->SwiGLU->dropout->deconv.  Rows are independent, so
        when the [rows, L, 2*inner] intermediate exceeds ``_XLA_CHUNK_BYTES``
        the chain runs as a ``lax.map`` over row chunks under
        ``jax.checkpoint`` — the forward AND the backward recompute then
        hold only one chunk's intermediates at a time (this is what makes
        the xlarge config trainable on a single 16 GB chip at all: the
        fused Pallas kernels are VMEM-gated out at its shapes).  The inner
        dropout masks derive from a per-chunk fold_in, so the checkpoint
        replay regenerates them bit-exactly."""
        rows, seq_len, _ = x.shape
        itemsize = jnp.dtype(self.dtype).itemsize
        inter = rows * seq_len * 2 * self.dim_inner * itemsize
        key = (self.make_rng("dropout") if drop_rate > 0.0 else None)

        def chain(xc, kc):
            y = conv_ops.conv1d(xc, conv_w, conv_b, stride=shift)
            gate = nn.silu(y[..., self.dim_inner:])
            y = y[..., :self.dim_inner] * gate
            if drop_rate > 0.0:
                keep = jax.random.bernoulli(kc, 1.0 - drop_rate, y.shape)
                y = jnp.where(keep, y / (1.0 - drop_rate), 0.0)
            return conv_ops.conv_transpose1d(y, deconv_w, deconv_b,
                                             stride=shift)

        if inter <= self._XLA_CHUNK_BYTES or rows < 8:
            return chain(x, key)

        rc = max(1, self._XLA_CHUNK_BYTES
                 // (seq_len * 2 * self.dim_inner * itemsize))
        nc = -(-rows // rc)
        xp = jnp.pad(x, ((0, nc * rc - rows), (0, 0), (0, 0)))

        @jax.checkpoint
        def body(args):
            xc, i = args
            kc = jax.random.fold_in(key, i) if drop_rate > 0.0 else None
            return chain(xc, kc)

        ys = jax.lax.map(body, (xp.reshape(nc, rc, seq_len, -1),
                                jnp.arange(nc)))
        return ys.reshape(nc * rc, ys.shape[-2], ys.shape[-1])[:rows]


class ConvDeconv1d(nn.Module):
    dim: int
    dim_inner: int
    conv1d_kernel: int
    conv1d_shift: int
    dropout: float = 0.0
    use_fused: bool = False  # accepted for API parity; plain path only
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, s1, s2, h = x.shape
        diff_ks = self.conv1d_kernel - self.conv1d_shift
        x = x.reshape(b * s1, s2, h)
        seq_len = _pad_len(s2, self.conv1d_kernel, self.conv1d_shift)
        x = jnp.pad(x, ((0, 0), (diff_ks, seq_len - s2 - diff_ks), (0, 0)))

        y = Conv1d(self.dim, self.dim_inner, self.conv1d_kernel,
                   stride=self.conv1d_shift, dtype=self.dtype, name="conv1d")(x)
        y = nn.silu(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = ConvTranspose1d(self.dim_inner, self.dim, self.conv1d_kernel,
                            stride=self.conv1d_shift, dtype=self.dtype,
                            name="deconv1d")(y)
        y = y[:, diff_ks:diff_ks + s2, :]
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return y.reshape(b, s1, s2, h)
