"""Row-chunked XLA FFN fallback (``nn/ffn.py _xla_ffn``).

At xlarge frame-path training shapes the unfused conv->SwiGLU->deconv
chain materializes [rows, L, 2*inner] intermediates that OOM a 16 GB chip
(52.2 GB of HLO temps — PERFORMANCE.md "The xlarge lane, root-caused").
When the widest intermediate exceeds ``_XLA_CHUNK_BYTES`` the chain runs
as a ``lax.map`` over row chunks under ``jax.checkpoint``.  These tests
pin the two contracts that make that safe:

- deterministic outputs are BIT-IDENTICAL to the unchunked path (rows are
  independent; chunking is pure scheduling), including through gradients;
- the in-chain dropout keys derive from a per-chunk ``fold_in``, so a
  fixed rng replays exactly (what the checkpointed backward relies on).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mss_tf_locoformer_tpu.nn.ffn import SwiGLUConvDeconv1d


@pytest.fixture
def setup():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 8, 50, 16)), jnp.float32)
    m = SwiGLUConvDeconv1d(dim=16, dim_inner=32, conv1d_kernel=4,
                           conv1d_shift=1, dropout=0.3)
    params = m.init({"params": jax.random.PRNGKey(0)}, x, True)
    return m, params, x


def _chunked(monkeypatch, tiny=True):
    monkeypatch.setattr(SwiGLUConvDeconv1d, "_XLA_CHUNK_BYTES",
                        1024 if tiny else 512 * 1024 * 1024)


def test_deterministic_bit_identical(setup, monkeypatch):
    m, params, x = setup
    want = m.apply(params, x, True)
    _chunked(monkeypatch)
    got = m.apply(params, x, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_deterministic_grads_match(setup, monkeypatch):
    m, params, x = setup

    def loss(p, xx):
        return jnp.sum(m.apply(p, xx, True) ** 2)

    gw = jax.grad(loss)(params, x)
    gx = jax.grad(loss, argnums=1)(params, x)
    _chunked(monkeypatch)
    cw = jax.grad(loss)(params, x)
    cx = jax.grad(loss, argnums=1)(params, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-5),
        cw, gw)
    np.testing.assert_allclose(np.asarray(cx), np.asarray(gx),
                               atol=1e-5, rtol=1e-5)


def test_dropout_replay_and_scale(setup, monkeypatch):
    m, params, x = setup
    _chunked(monkeypatch)
    r = {"dropout": jax.random.PRNGKey(3)}
    y1 = m.apply(params, x, False, rngs=r)
    y2 = m.apply(params, x, False, rngs=r)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = m.apply(params, x, False, rngs={"dropout": jax.random.PRNGKey(4)})
    assert not np.allclose(np.asarray(y1), np.asarray(y3))
    # E[dropout(y)] = deterministic y: seed-averaged output approaches it
    det = np.asarray(m.apply(params, x, True))
    acc = np.zeros_like(det)
    n = 24
    for s in range(n):
        acc += np.asarray(m.apply(params, x, False,
                                  rngs={"dropout": jax.random.PRNGKey(s)}))
    err = np.abs(acc / n - det).mean() / max(np.abs(det).mean(), 1e-9)
    assert err < 0.35, err


def test_dropout_grads_run_chunked(setup, monkeypatch):
    m, params, x = setup
    _chunked(monkeypatch)

    def loss(p):
        y = m.apply(p, x, False, rngs={"dropout": jax.random.PRNGKey(5)})
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(params)
    total = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), g, 0.0)
    assert np.isfinite(total) and total > 0.0

# ---- row-chunked MHSA fallback (nn/attention.py _chunked_mhsa) ----

from mss_tf_locoformer_tpu.nn.attention import MultiHeadSelfAttention


@pytest.fixture
def attn_setup():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((10, 37, 32)), jnp.float32)
    m = MultiHeadSelfAttention(emb_dim=32, attention_dim=32, n_heads=2,
                               dropout=0.25, use_rope=True)
    params = m.init({"params": jax.random.PRNGKey(0)}, x, True)
    return m, params, x


def _attn_chunked(monkeypatch, tiny=True):
    monkeypatch.setattr(MultiHeadSelfAttention, "_XLA_CHUNK_BYTES",
                        64 if tiny else 512 * 1024 * 1024)


def test_mhsa_deterministic_matches(attn_setup, monkeypatch):
    """Chunked == unchunked up to fp32 matmul reassociation (XLA may
    schedule the per-chunk projections differently than the batched one —
    observed max diff ~5e-8)."""
    m, params, x = attn_setup
    want = m.apply(params, x, True)
    _attn_chunked(monkeypatch)
    got = m.apply(params, x, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-5)


def test_mhsa_grads_match(attn_setup, monkeypatch):
    m, params, x = attn_setup

    def loss(p, xx):
        return jnp.sum(m.apply(p, xx, True) ** 2)

    gw = jax.grad(loss)(params, x)
    gx = jax.grad(loss, argnums=1)(params, x)
    _attn_chunked(monkeypatch)
    cw = jax.grad(loss)(params, x)
    cx = jax.grad(loss, argnums=1)(params, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-4),
        cw, gw)
    np.testing.assert_allclose(np.asarray(cx), np.asarray(gx),
                               atol=1e-5, rtol=1e-4)


def test_mhsa_param_tree_unchanged(attn_setup, monkeypatch):
    """The chunked path registers raw weights (_Weight) instead of Linear —
    the checkpoint tree must be byte-for-byte the same structure."""
    m, params, x = attn_setup
    _attn_chunked(monkeypatch)
    p2 = m.init({"params": jax.random.PRNGKey(0)}, x, True)
    assert (jax.tree_util.tree_structure(p2)
            == jax.tree_util.tree_structure(params))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        p2, params)


def test_mhsa_dropout_replay_and_grads(attn_setup, monkeypatch):
    m, params, x = attn_setup
    _attn_chunked(monkeypatch)
    r = {"dropout": jax.random.PRNGKey(3)}
    y1 = m.apply(params, x, False, rngs=r)
    y2 = m.apply(params, x, False, rngs=r)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x, False, rngs=r) ** 2))(params)
    total = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), g, 0.0)
    assert np.isfinite(total) and total > 0.0
