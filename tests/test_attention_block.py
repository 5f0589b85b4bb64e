"""Fully fused norm+MHSA+residual attention step vs the unfused composition."""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mss_tf_locoformer_tpu.ops.pallas import attention_block as AB

_TPU = jax.default_backend() == "tpu"


def _ctx():
    return contextlib.nullcontext() if _TPU else pltpu.force_tpu_interpret_mode()


# interpret mode computes fp32 exactly; the real chip runs fp32 jax.lax.dot
# as bf16 MXU passes (~0.5% error) in BOTH the kernel and the XLA oracle,
# and the two round differently
_ATOL = 5e-3 if _TPU else 2e-4
_RTOL = 2e-2 if _TPU else 2e-3


def _args(rng, r=3, l=37, c=32, a=32):
    x = (0.5 * rng.standard_normal((r, l, c))).astype(np.float32)
    gamma = (1.0 + 0.1 * rng.standard_normal(c)).astype(np.float32)
    w_qkv = (rng.standard_normal((3 * a, c)) / np.sqrt(c)).astype(np.float32)
    w_out = (rng.standard_normal((c, a)) / np.sqrt(a)).astype(np.float32)
    return tuple(map(jnp.asarray, (x, gamma, w_qkv, w_out)))


@pytest.mark.parametrize("c,a,h,l,rope", [
    (32, 32, 2, 37, True),      # head_dim 16 -> padded to 32
    (96, 96, 4, 130, True),     # base-config dims, L crosses one lane tile
    (96, 96, 4, 64, False),     # NoPE
    (64, 96, 3, 50, True),      # attention_dim != emb_dim, head_dim 32
])
def test_forward_parity(rng, c, a, h, l, rope):
    args = _args(rng, l=l, c=c, a=a)
    want = np.asarray(AB.reference_attention_block(*args, h, 4, 1e-5, rope))
    with _ctx():
        got = np.asarray(AB.fused_attention_block(*args, h, 4, 1e-5, rope))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=_ATOL * scale, rtol=_RTOL)


def test_supports_block_gate():
    assert AB.supports_block(96, 96, 4, 1025)     # freq path, base config
    assert AB.supports_block(96, 96, 4, 259)      # time path
    assert AB.supports_block(128, 128, 8, 1025)   # medium freq (calibrated:
    assert AB.supports_block(128, 128, 8, 431)    # compiles+runs on v5e)
    assert not AB.supports_block(96, 95, 4, 64)   # head split must be exact
    assert not AB.supports_block(96, 96, 4, 8192) # beyond the VMEM budget
    assert not AB.supports_block(256, 256, 16, 2049)  # xlarge freq
    # fp32 rows double the footprint: medium freq gates back out
    assert not AB.supports_block(128, 128, 8, 1025, itemsize=4)


@pytest.mark.parametrize("c,a,h,l,rope", [
    (32, 32, 2, 37, True),
    (96, 96, 4, 130, True),
    (64, 96, 3, 50, False),
])
def test_grad_parity_pallas_backward(rng, c, a, h, l, rope):
    """The fused Pallas backward (norm+QKV+attention recompute in VMEM,
    in-kernel back-rotation) vs jax.vjp of the unfused reference — all four
    cotangents."""
    args = _args(rng, l=l, c=c, a=a)
    g = jnp.asarray(rng.standard_normal(args[0].shape).astype(np.float32))
    with _ctx():
        _, o_stash, stats = AB._attn_forward(*args, h, 4, 1e-5, rope, 10000.0,
                                             return_o=True)
        grads = AB._attn_backward_pallas(*args, h, 4, 1e-5, rope, 10000.0,
                                         0.0, None, g, o_stash, stats)
    _, vjp_r = jax.vjp(
        lambda *a_: AB.reference_attention_block(*a_, h, 4, 1e-5, rope), *args)
    want = vjp_r(g)
    for name, gx, wx in zip(("dx", "dgamma", "dw_qkv", "dw_out"), grads, want):
        scale = max(np.abs(np.asarray(wx)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(wx),
                                   atol=(8e-3 if _TPU else 5e-5) * scale,
                                   rtol=2e-2 if _TPU else 5e-4, err_msg=name)


def test_grad_runs_through_custom_vjp(rng):
    """End-to-end vjp through the custom_vjp wiring."""
    args = _args(rng)
    g = jnp.asarray(rng.standard_normal(args[0].shape).astype(np.float32))
    with _ctx():
        _, vjp = jax.vjp(
            lambda *a: AB.fused_attention_block(*a, 2, 4, 1e-5, True), *args)
        grads = vjp(g)
    _, vjp_r = jax.vjp(
        lambda *a: AB.reference_attention_block(*a, 2, 4, 1e-5, True), *args)
    want = vjp_r(g)
    for name, gx, wx in zip(("dx", "dgamma", "dw_qkv", "dw_out"), grads, want):
        scale = max(np.abs(np.asarray(wx)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(wx),
                                   atol=(8e-3 if _TPU else 5e-5) * scale,
                                   rtol=2e-2 if _TPU else 5e-4, err_msg=name)


def test_dropout_scaling_interpret(rng):
    """In interpret mode the PRNG yields all-zero bits -> every element is
    kept, so BOTH dropout sites (attention probabilities + post-projection)
    reduce to a 1/(1-rate) scale each on the attention contribution —
    checks the fwd wiring of the two sites and that bwd replays the same
    (all-keep) masks.  Real mask statistics are TPU-only."""
    if _TPU:
        pytest.skip("interpret-mode-only check")
    args = _args(rng)
    seed = jnp.asarray([1234], jnp.int32)
    with _ctx():
        base = np.asarray(AB.fused_attention_block(*args, 2, 4, 1e-5, True))
        drop = np.asarray(AB.fused_attention_block(*args, 2, 4, 1e-5, True,
                                                   10000.0, 0.5, seed))
    x = np.asarray(args[0])
    # (1/keep) from the probability site x (1/keep) from the projection site
    np.testing.assert_allclose(drop - x, (base - x) / 0.25,
                               atol=1e-5, rtol=1e-5)

    g = jnp.asarray(rng.standard_normal(args[0].shape).astype(np.float32))
    with _ctx():
        _, vjp_d = jax.vjp(lambda *a: AB.fused_attention_block(
            *a, 2, 4, 1e-5, True, 10000.0, 0.5, seed), *args)
        _, vjp_0 = jax.vjp(lambda *a: AB.fused_attention_block(
            *a, 2, 4, 1e-5, True), *args)
        dx_d = np.asarray(vjp_d(g)[0])
        dx_0 = np.asarray(vjp_0(g)[0])
    gn = np.asarray(g)
    # dx = g (residual) + attn-path cotangent; the latter scales by 1/keep
    # at each of the two sites
    np.testing.assert_allclose(dx_d - gn, (dx_0 - gn) / 0.25,
                               atol=1e-4, rtol=1e-3)


@pytest.mark.skipif(not _TPU, reason="fused step only runs on TPU")
def test_block_fused_attn_equals_unfused_on_tpu(rng):
    """On the real chip: block with flash_attention (fused attention-step
    kernel) vs the same params with flash_attention=False (XLA SDPA)."""
    from mss_tf_locoformer_tpu.nn.blocks import LocoformerBlock
    x = (0.5 * rng.standard_normal((1, 3, 140, 32))).astype(np.float32)
    kw = dict(emb_dim=32, num_groups=4, n_heads=2, attention_dim=32,
              ffn_type="swiglu_conv1d", ffn_hidden_dim=64)
    fused = LocoformerBlock(flash_attention=True, **kw)
    plain = LocoformerBlock(flash_attention=False, **kw)
    params = plain.init(jax.random.PRNGKey(0), x)
    want = np.asarray(plain.apply(params, x))
    got = np.asarray(fused.apply(params, x))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=5e-3 * scale, rtol=2e-2)


def test_batch_padding(rng):
    """Row count not a multiple of the kernel group size."""
    args = _args(rng, r=5, l=29, c=32, a=32)
    want = np.asarray(AB.reference_attention_block(*args, 2, 4, 1e-5, True))
    with _ctx():
        got = np.asarray(AB.fused_attention_block(*args, 2, 4, 1e-5, True))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=_ATOL * scale, rtol=_RTOL)


@pytest.mark.skipif(not _TPU, reason="in-kernel PRNG is TPU-only")
def test_prob_dropout_statistics_tpu(rng):
    """On the real chip: with both dropout sites live at rate r, the
    attention contribution is a random sparsification — its expectation
    over seeds approaches the deterministic output, and single-seed outputs
    are reproducible and seed-sensitive."""
    args = _args(rng, r=2, l=128, c=32, a=32)
    base = np.asarray(AB.fused_attention_block(*args, 2, 4, 1e-5, True))
    x = np.asarray(args[0])

    s1 = jnp.asarray([101], jnp.int32)
    d1 = np.asarray(AB.fused_attention_block(*args, 2, 4, 1e-5, True,
                                             10000.0, 0.3, s1))
    d1b = np.asarray(AB.fused_attention_block(*args, 2, 4, 1e-5, True,
                                              10000.0, 0.3, s1))
    np.testing.assert_array_equal(d1, d1b)  # same seed -> same masks
    d2 = np.asarray(AB.fused_attention_block(*args, 2, 4, 1e-5, True,
                                             10000.0, 0.3,
                                             jnp.asarray([202], jnp.int32)))
    assert not np.allclose(d1, d2)          # different seed -> different masks

    # post-projection zeros: a dropped output element equals the residual
    # exactly; at rate 0.3 roughly 30% of elements should
    frac_res = np.mean(np.isclose(d1 - x, 0.0, atol=1e-7))
    assert 0.2 < frac_res < 0.4, frac_res

    # seed-averaged contribution approaches the deterministic one (the two
    # sites are unbiased: E[mask/keep] = 1)
    acc = np.zeros_like(base)
    n = 48
    for s in range(n):
        acc += np.asarray(AB.fused_attention_block(
            *args, 2, 4, 1e-5, True, 10000.0, 0.3,
            jnp.asarray([1000 + s], jnp.int32)))
    mean_contrib = (acc / n) - x
    want_contrib = base - x
    err = np.abs(mean_contrib - want_contrib).mean() / \
        max(np.abs(want_contrib).mean(), 1e-9)
    assert err < 0.25, err


@pytest.mark.skipif(not _TPU, reason="in-kernel PRNG is TPU-only")
def test_prob_dropout_fwd_bwd_replay_tpu(rng):
    """Exact-linearity check of the FIXED-seed mask replay: with masks and
    q/k fixed, the step output is exactly LINEAR in W_v and W_o (the
    probability masks depend only on the seed and the softmax only on q/k),
    so a large-delta secant must equal the analytic directional derivative
    up to bf16 MXU rounding (~1%).  A mis-replayed mask (the backward's
    128-wide q-blocks regenerating different subtiles than the forward's
    whole-row blocks — here L=384 so one fwd block spans three bwd blocks)
    errs by O(30%), not O(1%).  A plain finite difference CANNOT test this
    on hardware: fp32 `lax.dot` runs as single-pass bf16 on the MXU, and
    the ~0.5% evaluation noise swamps an eps-scaled difference quotient.
    """
    l, c, a = 384, 32, 32
    args = _args(rng, r=1, l=l, c=c, a=a)
    seed = jnp.asarray([4242], jnp.int32)
    w = jnp.asarray(rng.standard_normal(args[0].shape).astype(np.float32))
    x, gamma, w_qkv, w_out = args

    def f(w_qkv_, w_out_):
        return jnp.sum(w * AB.fused_attention_block(
            x, gamma, w_qkv_, w_out_, 2, 4, 1e-5, True, 10000.0, 0.3, seed))

    gq, go = jax.grad(f, argnums=(0, 1))(w_qkv, w_out)

    # W_o direction: exercises the post-projection mask replay (dzd) and
    # the backward's o recompute through the probability masks (dwo)
    d_o = jnp.asarray(0.3 * rng.standard_normal(w_out.shape)
                      .astype(np.float32))
    sec = float(f(w_qkv, w_out + d_o)) - float(f(w_qkv, w_out))
    an = float(jnp.sum(go * d_o))
    assert abs(sec - an) < 0.05 * max(abs(sec), abs(an), 1.0), (sec, an)

    # W_v direction: exercises the probability-mask replay in dv (V enters
    # the output linearly through the masked, normalized probabilities)
    d_v = np.zeros((3 * a, c), np.float32)
    d_v[2 * a:] = 0.3 * rng.standard_normal((a, c))
    d_v = jnp.asarray(d_v)
    sec = float(f(w_qkv + d_v, w_out)) - float(f(w_qkv, w_out))
    an = float(jnp.sum(gq * d_v))
    assert abs(sec - an) < 0.05 * max(abs(sec), abs(an), 1.0), (sec, an)
