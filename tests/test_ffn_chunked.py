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