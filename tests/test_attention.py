"""Attention backends: chunked == xla == torch SDPA; flash kernel (interpret
mode on CPU, REAL kernels on the TPU backend) == xla."""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mss_tf_locoformer_tpu.ops.attention import (_chunked_attention,
                                                 _xla_attention,
                                                 dot_product_attention)

_TPU = jax.default_backend() == "tpu"


def _kernel_ctx():
    """Real kernels on TPU; interpret mode elsewhere (forcing interpret on
    the remote chip ABORTS the backend)."""
    from jax.experimental.pallas import tpu as pltpu
    return (contextlib.nullcontext() if _TPU
            else pltpu.force_tpu_interpret_mode())


def _assert_close(got, want, atol, rtol=0.0, err_msg=""):
    """CPU keeps the exact-fp32 bounds; on the chip fp32 lax.dot runs as
    single-pass bf16 MXU matmuls on BOTH sides of every comparison, so the
    bound becomes bf16-scale relative to the oracle magnitude."""
    got, want = np.asarray(got), np.asarray(want)
    if _TPU:
        scale = max(np.abs(want).max(), 1.0)
        atol, rtol = 8e-3 * scale, 2e-2
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol,
                               err_msg=err_msg)


def _rand_qkv(rng, b=3, h=2, l=70, d=24):
    return tuple(rng.standard_normal((b, h, l, d), dtype=np.float32) * 0.5
                 for _ in range(3))


def test_xla_matches_torch_sdpa(rng):
    q, k, v = _rand_qkv(rng)
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)).numpy()
    got = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    _assert_close(got, ref, atol=2e-5)


def test_chunked_matches_xla(rng):
    q, k, v = _rand_qkv(rng, b=5, l=33)
    full = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    # force tiny budget -> many chunks
    chunked = np.asarray(_chunked_attention(jnp.asarray(q), jnp.asarray(k),
                                            jnp.asarray(v), max_score_bytes=4 * 33 * 33 * 2))
    _assert_close(chunked, full, atol=2e-5)


def test_auto_selects_chunked_for_large(rng):
    q, k, v = _rand_qkv(rng, b=2, l=64)
    out = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                backend="auto", max_score_bytes=1024)
    full = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    _assert_close(np.asarray(out), full, atol=2e-5)


def test_chunked_gradient_matches_xla(rng):
    q, k, v = _rand_qkv(rng, b=2, h=1, l=16, d=8)
    qj, kj, vj = map(jnp.asarray, (q, k, v))

    def loss_full(q, k, v):
        return jnp.sum(_xla_attention(q, k, v) ** 2)

    def loss_chunked(q, k, v):
        return jnp.sum(_chunked_attention(q, k, v, max_score_bytes=4 * 16 * 16) ** 2)

    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(qj, kj, vj)
    g_chunk = jax.grad(loss_chunked, argnums=(0, 1, 2))(qj, kj, vj)
    for a, b in zip(g_full, g_chunk):
        _assert_close(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("l,d", [(64, 24), (130, 32), (257, 16)])
def test_flash_interpret_matches_xla(rng, l, d):
    """Pallas kernel in interpreter mode (CPU) vs the XLA path."""
    from jax.experimental.pallas import tpu as pltpu
    from mss_tf_locoformer_tpu.ops.pallas import flash_attention as FA

    q, k, v = _rand_qkv(rng, b=2, h=2, l=l, d=d)
    with _kernel_ctx():
        got = np.asarray(FA.flash_attention(jnp.asarray(q), jnp.asarray(k),
                                            jnp.asarray(v)))
    full = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    _assert_close(got, full, atol=2e-5)


def test_flash_backward_via_chunked(rng):
    from jax.experimental.pallas import tpu as pltpu
    from mss_tf_locoformer_tpu.ops.pallas import flash_attention as FA

    q, k, v = _rand_qkv(rng, b=1, h=1, l=32, d=16)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    with _kernel_ctx():
        g = jax.grad(lambda a, b, c: jnp.sum(FA.flash_attention(a, b, c) ** 2),
                     argnums=(0, 1, 2))(qj, kj, vj)
    g_ref = jax.grad(lambda a, b, c: jnp.sum(_xla_attention(a, b, c) ** 2),
                     argnums=(0, 1, 2))(qj, kj, vj)
    for a, b in zip(g, g_ref):
        _assert_close(np.asarray(a), np.asarray(b), atol=1e-4)


def test_flash_fused_rope_matches(rng):
    """Fused-RoPE flash kernel == apply_rope + flash (interpret mode)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from mss_tf_locoformer_tpu.ops.pallas.flash_attention import flash_attention
    from mss_tf_locoformer_tpu.ops.rope import apply_rope

    q = rng.standard_normal((3, 2, 70, 24)).astype(np.float32)
    k = rng.standard_normal((3, 2, 70, 24)).astype(np.float32)
    v = rng.standard_normal((3, 2, 70, 24)).astype(np.float32)
    with _kernel_ctx():
        want = np.asarray(flash_attention(
            jnp.asarray(apply_rope(q)), jnp.asarray(apply_rope(k)),
            jnp.asarray(v)))
        got = np.asarray(flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), True))
    _assert_close(got, want, atol=2e-5, rtol=1e-4)


def test_flash_fused_rope_grad(rng):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from mss_tf_locoformer_tpu.ops.pallas.flash_attention import flash_attention
    from mss_tf_locoformer_tpu.ops.attention import _chunked_attention
    from mss_tf_locoformer_tpu.ops.rope import apply_rope

    q = rng.standard_normal((2, 40, 16)).astype(np.float32)

    def ref(a):
        return jnp.sum(_chunked_attention(apply_rope(a), apply_rope(a), a,
                                          1 << 30) ** 2)

    def fused(a):
        return jnp.sum(flash_attention(a, a, a, True) ** 2)

    g_ref = np.asarray(jax.grad(ref)(jnp.asarray(q)))
    with _kernel_ctx():
        g_fus = np.asarray(jax.grad(fused)(jnp.asarray(q)))
    _assert_close(g_fus, g_ref, atol=1e-4, rtol=1e-3)


def test_flash_pallas_backward_matches_chunked(rng):
    """Pallas backward kernel == chunked-XLA recompute gradients."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from mss_tf_locoformer_tpu.ops.pallas import flash_attention as FA
    from mss_tf_locoformer_tpu.ops.attention import _chunked_attention
    from mss_tf_locoformer_tpu.ops.rope import apply_rope

    for rope in (False, True):
        q = jnp.asarray(rng.standard_normal((2, 3, 70, 24)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 3, 70, 24)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, 3, 70, 24)).astype(np.float32))
        ct = jnp.asarray(rng.standard_normal((2, 3, 70, 24)).astype(np.float32))

        def ref(a, b, c):
            if rope:
                a = apply_rope(a)
                b = apply_rope(b)
            return _chunked_attention(a, b, c, 1 << 30)

        _, vjp = jax.vjp(ref, q, k, v)
        want = vjp(ct)
        with _kernel_ctx():
            got = FA._flash_backward_pallas(q, k, v, ct, rope, 10000.0)
        for name, a, b in zip("qkv", want, got):
            _assert_close(np.asarray(b), np.asarray(a),
                          atol=2e-4, rtol=1e-3,
                          err_msg=f"d{name} rope={rope}")


def test_rope_inverse_roundtrip(rng):
    from mss_tf_locoformer_tpu.ops.rope import apply_rope
    x = rng.standard_normal((3, 50, 24)).astype(np.float32)
    y = apply_rope(apply_rope(x), inverse=True)
    _assert_close(np.asarray(y), x, atol=1e-5)


def test_bounded_shift_guard_adversarial_norms(rng):
    """Round-2 advisor finding: a high-norm / low-correlation outlier key
    makes the Cauchy-Schwarz shift exceed the true row max by hundreds —
    the unguarded kernel underflowed EVERY probability and silently
    returned all-zero attention.  The diag-clamped shift must recover the
    exact softmax (fwd AND bwd)."""
    from jax.experimental.pallas import tpu as pltpu
    from mss_tf_locoformer_tpu.ops.pallas import flash_attention as FA

    d, l = 32, 256
    q = (0.5 * rng.standard_normal((1, 1, l, d))).astype(np.float32)
    k = (0.5 * rng.standard_normal((1, 1, l, d))).astype(np.float32)
    v = (0.5 * rng.standard_normal((1, 1, l, d))).astype(np.float32)
    q[..., 0] = 0.0          # queries orthogonal to the outlier direction
    k[..., 0] = 0.0
    k[..., 5, :] = 0.0
    k[..., 5, 0] = 4096.0    # ||k_5|| = 4096 -> bound ~ ||q|| * 4096 / sqrt(d)

    qj, kj, vj = map(jnp.asarray, (q, k, v))
    want = np.asarray(_xla_attention(qj, kj, vj))
    assert np.abs(want).max() > 1e-3  # the oracle itself is non-degenerate

    with _kernel_ctx():
        got = np.asarray(FA.flash_attention(qj, kj, vj))
    assert np.abs(got).max() > 1e-3, "guarded kernel still underflows to zero"
    _assert_close(got, want, atol=5e-4, rtol=5e-3)

    def loss_flash(a, b, c):
        return jnp.sum(FA.flash_attention(a, b, c) ** 2)

    def loss_xla(a, b, c):
        return jnp.sum(_xla_attention(a, b, c) ** 2)

    with _kernel_ctx():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(qj, kj, vj)
    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(qj, kj, vj)
    for name, a, b in zip("qkv", g_flash, g_ref):
        scale = max(np.abs(np.asarray(b)).max(), 1.0)
        _assert_close(np.asarray(a), np.asarray(b),
                      atol=1e-3 * scale, rtol=5e-3, err_msg=f"d{name}")


def test_bounded_shift_guard_fused_block(rng):
    """Same adversarial regime through the fused attention-step kernel: the
    key projection amplifies channel 0 ~1000x, one normed row points along
    channel 0 (huge ||k||), and the query projection is blind to channel 0
    (low correlation) — the Cauchy-Schwarz bound lands ~270 above the true
    scores, which zeroed every probability before the diag guard."""
    from jax.experimental.pallas import tpu as pltpu
    from mss_tf_locoformer_tpu.ops.pallas import attention_block as AB

    r, l, c, a, h = 1, 128, 32, 32, 1
    x = (0.5 * rng.standard_normal((r, l, c))).astype(np.float32)
    x[..., 0] = 0.0
    x[0, 7, :] = 0.0
    x[0, 7, 0] = 1.0         # post-norm this row points along channel 0
    gamma = (1.0 + 0.05 * rng.standard_normal(c)).astype(np.float32)
    wq = (0.3 * rng.standard_normal((a, c)) / np.sqrt(c)).astype(np.float32)
    wq[0, :] = 0.0           # q[0] == 0 for every position: q . k_7 == 0
    wk = np.eye(a, c, dtype=np.float32)
    wk[0, 0] = 1000.0        # ||k_7|| ~ 2800 -> bound >> true max
    wv = (0.5 * rng.standard_normal((a, c)) / np.sqrt(c)).astype(np.float32)
    w_qkv = np.concatenate([wq, wk, wv], axis=0)
    w_out = (rng.standard_normal((c, a)) / np.sqrt(a)).astype(np.float32)
    args = tuple(map(jnp.asarray, (x, gamma, w_qkv, w_out)))

    want = np.asarray(AB.reference_attention_block(*args, h, 4, 1e-5, False))
    with _kernel_ctx():
        got = np.asarray(AB.fused_attention_block(*args, h, 4, 1e-5, False))
    # the residual dominates |out|; compare the attention contribution
    delta_w = want - np.asarray(x)
    delta_g = got - np.asarray(x)
    assert np.abs(delta_g).max() > 1e-4, "attention output underflowed to zero"
    scale = max(np.abs(delta_w).max(), 1.0)
    _assert_close(delta_g, delta_w, atol=2e-3 * scale, rtol=1e-2)


# ------------------- attention-probability dropout (reference SDPA site)


def test_prob_dropout_matches_torch_semantics(rng):
    """Drop-after-normalize: the xla path with a fixed mask must equal
    softmax(QK^T/sqrt d) with survivors scaled by 1/keep and NO
    renormalization, times V — torch's ``dropout_p`` semantics
    (reference ``models/mss_tflocoformer.py:524-531``)."""
    q, k, v = _rand_qkv(rng, b=2, h=2, l=24, d=8)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    key = jax.random.PRNGKey(7)
    rate = 0.4
    got = np.asarray(_xla_attention(qj, kj, vj, rate, key))

    logits = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    keep = np.asarray(jax.random.bernoulli(key, 1.0 - rate, probs.shape))
    dropped = np.where(keep, probs / (1.0 - rate), 0.0)
    want = np.einsum("bhqk,bhkd->bhqd", dropped, v)
    _assert_close(got, want, atol=2e-5)
    # the mask actually dropped something
    assert keep.mean() < 0.95


def test_prob_dropout_chunked_replays_per_row_keys(rng):
    """The chunked path derives one mask key per flattened row; its output
    must equal per-row xla attention with the same split keys (pins the
    replay scheme — jax.checkpoint must regenerate identical masks in the
    backward)."""
    q, k, v = _rand_qkv(rng, b=3, h=2, l=16, d=8)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    key = jax.random.PRNGKey(3)
    rate = 0.3
    budget = 4 * 16 * 16 * 2  # 2 rows per chunk; 6 rows total
    got = np.asarray(_chunked_attention(qj, kj, vj, budget, rate, key))

    rows = qj.reshape(6, 16, 8), kj.reshape(6, 16, 8), vj.reshape(6, 16, 8)
    row_keys = jax.random.split(key, 6)
    want = np.stack([
        np.asarray(_xla_attention(rows[0][i], rows[1][i], rows[2][i],
                                  rate, row_keys[i]))
        for i in range(6)]).reshape(3, 2, 16, 8)
    _assert_close(got, want, atol=2e-5)


def test_prob_dropout_gradient_deterministic(rng):
    """grad through the chunked dropout path runs and is reproducible (the
    checkpoint recompute sees the same keys)."""
    q, k, v = _rand_qkv(rng, b=2, h=1, l=16, d=8)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    key = jax.random.PRNGKey(11)

    def loss(q_, k_, v_):
        return jnp.sum(_chunked_attention(q_, k_, v_, 4 * 16 * 16,
                                          0.25, key) ** 2)

    g1 = jax.grad(loss, argnums=(0, 1, 2))(qj, kj, vj)
    g2 = jax.grad(loss, argnums=(0, 1, 2))(qj, kj, vj)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and differs from the dropout-free gradient (the mask took effect)
    g0 = jax.grad(lambda a, b, c: jnp.sum(
        _xla_attention(a, b, c) ** 2), argnums=(0, 1, 2))(qj, kj, vj)
    assert not np.allclose(np.asarray(g1[0]), np.asarray(g0[0]))


def test_flash_backend_declines_prob_dropout(rng):
    """backend='flash' with a dropout request must not reach the Pallas
    kernel (it has no probability site) — it routes to the XLA path and
    still applies RoPE explicitly."""
    from mss_tf_locoformer_tpu.ops.rope import apply_rope
    q, k, v = _rand_qkv(rng, b=2, h=1, l=32, d=8)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    key = jax.random.PRNGKey(5)
    got = dot_product_attention(qj, kj, vj, backend="flash", fused_rope=True,
                                dropout_rate=0.3, dropout_key=key)
    want = _xla_attention(apply_rope(qj), apply_rope(kj), vj, 0.3, key)
    _assert_close(np.asarray(got), np.asarray(want), atol=2e-5)
