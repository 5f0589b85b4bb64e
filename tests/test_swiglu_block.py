"""Fully fused norm+FFN+residual step vs the unfused composition."""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mss_tf_locoformer_tpu.ops.pallas import swiglu_block as B

_TPU = jax.default_backend() == "tpu"


def _ctx():
    return contextlib.nullcontext() if _TPU else pltpu.force_tpu_interpret_mode()


# interpret mode computes fp32 exactly; the real chip runs fp32 lax.dot as
# single-pass bf16 MXU matmuls in BOTH the kernel and the XLA oracle, and
# the two formulations round differently (~0.5% of scale)
_ATOL = 5e-3 if _TPU else 1e-4
_RTOL = 2e-2 if _TPU else 2e-3
_GATOL = 8e-3 if _TPU else 5e-4   # gradients chain more bf16 matmuls
_GRTOL = 3e-2 if _TPU else 5e-3


def _args(rng, r=3, s2=41, c=32, inner=64, k=4):
    x = rng.standard_normal((r, s2, c)).astype(np.float32)
    gamma = (1.0 + 0.1 * rng.standard_normal(c)).astype(np.float32)
    conv_w = (rng.standard_normal((2 * inner, c, k)) * 0.2).astype(np.float32)
    conv_b = (rng.standard_normal(2 * inner) * 0.1).astype(np.float32)
    deconv_w = (rng.standard_normal((inner, c, k)) * 0.2).astype(np.float32)
    deconv_b = (rng.standard_normal(c) * 0.1).astype(np.float32)
    return tuple(map(jnp.asarray, (x, gamma, conv_w, conv_b, deconv_w,
                                   deconv_b)))


@pytest.mark.parametrize("c,inner,k,groups", [(32, 64, 4, 4), (96, 160, 8, 4),
                                              (48, 192, 3, 6)])
def test_forward_parity(rng, c, inner, k, groups):
    args = _args(rng, c=c, inner=inner, k=k)
    want = np.asarray(B.reference_norm_ffn_residual(*args, k, groups, 1e-5))
    with _ctx():
        got = np.asarray(B.fused_norm_ffn_residual(*args, k, groups, 1e-5))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=_ATOL * scale, rtol=_RTOL)


def test_grad_parity(rng):
    args = _args(rng)
    k, groups = 4, 4
    g = jnp.asarray(rng.standard_normal(args[0].shape).astype(np.float32))

    _, vjp = jax.vjp(lambda *a: B.reference_norm_ffn_residual(*a, k, groups,
                                                              1e-5), *args)
    want = vjp(g)
    with _ctx():
        _, vjp_f = jax.vjp(
            lambda *a: B.fused_norm_ffn_residual(*a, k, groups, 1e-5), *args)
        got = vjp_f(g)
    names = ("dx", "dgamma", "dconv_w", "dconv_b", "ddeconv_w", "ddeconv_b")
    for name, a, b in zip(names, want, got):
        scale = max(np.abs(np.asarray(a)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=_GATOL * scale, rtol=_GRTOL,
                                   err_msg=name)


def test_module_level_parity(rng):
    """The block-level wiring (gamma passthrough) equals norm->ffn->+res."""
    from mss_tf_locoformer_tpu.nn.blocks import LocoformerBlock
    x = rng.standard_normal((1, 3, 29, 32)).astype(np.float32)
    blk = LocoformerBlock(emb_dim=32, num_groups=4, n_heads=2,
                          attention_dim=32, ffn_type="swiglu_conv1d",
                          ffn_hidden_dim=64, fused_ffn=True)
    params = blk.init(jax.random.PRNGKey(0), x)
    # on CPU block_step_applicable is False -> module runs the unfused path;
    # this asserts the wiring doesn't change CPU behavior
    out = blk.apply(params, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(not _TPU, reason="fused step only runs on TPU")
def test_block_fused_equals_unfused_on_tpu(rng):
    """On the real chip: block with fused_ffn (fused norm+FFN+residual
    kernels) vs the same params with fused_ffn=False."""
    from mss_tf_locoformer_tpu.nn.blocks import LocoformerBlock
    x = (0.5 * rng.standard_normal((1, 3, 29, 32))).astype(np.float32)
    kw = dict(emb_dim=32, num_groups=4, n_heads=2, attention_dim=32,
              ffn_type=("swiglu_conv1d", "swiglu_conv1d"),
              ffn_hidden_dim=(64, 64))
    fused = LocoformerBlock(fused_ffn=True, **kw)
    plain = LocoformerBlock(fused_ffn=False, **kw)
    params = plain.init(jax.random.PRNGKey(0), x)
    want = np.asarray(plain.apply(params, x))
    got = np.asarray(fused.apply(params, x))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=5e-3 * scale, rtol=2e-2)


def test_grad_parity_multi_tile(rng):
    """The IT-tiled backward (round 3: inner > 128 spans several channel
    tiles) matches the unfused vjp — the freq-path training shape class
    that round 2's untiled backward had to gate out of the fused step."""
    k, groups = 4, 4
    args = _args(rng, r=2, s2=70, c=32, inner=3 * B.IT)
    g = jnp.asarray(rng.standard_normal(args[0].shape).astype(np.float32))

    _, vjp = jax.vjp(lambda *a: B.reference_norm_ffn_residual(*a, k, groups,
                                                              1e-5), *args)
    want = vjp(g)
    with _ctx():
        _, vjp_f = jax.vjp(
            lambda *a: B.fused_norm_ffn_residual(*a, k, groups, 1e-5), *args)
        got = vjp_f(g)
    names = ("dx", "dgamma", "dconv_w", "dconv_b", "ddeconv_w", "ddeconv_b")
    for name, a, b in zip(names, want, got):
        scale = max(np.abs(np.asarray(a)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=_GATOL * scale, rtol=_GRTOL,
                                   err_msg=name)


def test_supports_step_admits_freq_training_shape():
    """Round-2 verdict item 4: the base-config freq path (seq 1025, emb 96,
    inner 384, k 4) must take the fully fused step in TRAINING too — in the
    production bf16.  fp32 rows double the VMEM footprint past the scoped
    limit at that shape (measured 17.76 MiB vs the 16 MiB limit), so the
    dtype-aware gate must route fp32 freq-path training to the fallback."""
    assert B.supports_step(1025, 96, 384, 4, bwd=True)
    assert B.supports_step(259, 96, 384, 4, bwd=True)   # time path
    assert not B.supports_step(4096, 96, 1024, 8, bwd=True)  # beyond budget
    assert not B.supports_step(1025, 96, 384, 4, bwd=True, itemsize=4)
    assert B.supports_step(259, 96, 384, 4, bwd=True, itemsize=4)
