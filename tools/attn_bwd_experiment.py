"""Upper-bound the 'stash softmax stats' attention-backward lever (chip).

PERFORMANCE.md's stated next lever for the attention backward was saving
the softmax statistics (shift + denominator) so the backward skips their
recompute.  This experiment bounds that win FROM ABOVE without building the
stash plumbing: time the production backward at the training shapes, then
(with ``--nosoftmax``, after `_patch()` hacks the kernel module) a variant
whose backward replaces the entire softmax recompute — bounded shift,
exponentiation, and denominator normalization — with a linear stand-in of
the same matmul geometry.  Whatever a stats-stash could save is a strict
subset of that delta (a stash still pays the exp, plus its own DMA).

Run both on the chip and diff:
    python tools/attn_bwd_experiment.py            # production timing
    python tools/attn_bwd_experiment.py --nosoftmax
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# training shapes (PERFORMANCE.md forward-time table): base config, batch 2
FREQ = dict(r=2 * 259, l=1025, c=96, a=96, h=4)    # rows=B*N, seq=F
TIME = dict(r=2 * 1025, l=259, c=96, a=96, h=4)    # rows=B*F, seq=N


def _patch():
    """Replace the backward's softmax recompute with a same-geometry linear
    stand-in (NOT numerically meaningful — timing only)."""
    import jax.numpy as jnp
    from mss_tf_locoformer_tpu.ops.pallas import attention_block as AB

    AB._bounded_shift = lambda q, k, lb=None: 0.0
    AB._diag_lb = lambda q, k, qsl: None
    orig_num = AB._softmax_num

    def fake_num(s, shift):
        return s * 1e-4  # keep magnitudes bounded; skips exp entirely
    AB._softmax_num = fake_num
    # the denominator normalization in the bwd is `p / max(sum(p))`; with
    # the linear stand-in the sum survives, so ALSO neutralize jnp.sum of
    # score-class arrays via a shim the kernel body calls
    orig_sum = jnp.sum

    def fake_sum(x, axis=None, keepdims=False):
        if axis in (0,) and keepdims and x.ndim == 2:  # the denom reduction
            return jnp.ones((1, x.shape[1]), x.dtype)
        return orig_sum(x, axis=axis, keepdims=keepdims)
    AB.jnp = type(AB.jnp)("jnp_shim")
    AB.jnp.__dict__.update(jnp.__dict__)
    AB.jnp.sum = fake_sum
    return orig_num


def bench(name, spec, drop=0.1, iters=16, reps=3):
    import jax
    import jax.numpy as jnp
    from mss_tf_locoformer_tpu.ops.pallas.attention_block import (
        fused_attention_block)

    rng = np.random.default_rng(0)
    r, l, c, a, h = (spec[k] for k in ("r", "l", "c", "a", "h"))
    dt = jnp.bfloat16
    x = jnp.asarray(0.5 * rng.standard_normal((r, l, c)), dt)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), dt)
    wq = jnp.asarray(rng.standard_normal((3 * a, c)) / np.sqrt(c), dt)
    wo = jnp.asarray(rng.standard_normal((c, a)) / np.sqrt(a), dt)
    seed = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def fwd_bwd(x, gamma, wq, wo):
        def f(*args):
            return jnp.sum(fused_attention_block(
                *args, h, 4, 1e-5, True, 10000.0, drop, seed).astype(
                    jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3))(x, gamma, wq, wo)

    g = fwd_bwd(x, gamma, wq, wo)  # compile
    float(jnp.sum(g[0].astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            g = fwd_bwd(x, gamma, wq, wo)
        float(jnp.sum(g[0].astype(jnp.float32)))  # forced scalar sync
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name}: fwd+bwd {best * 1e3:.1f} ms (drop {drop})", flush=True)
    return best


def main():
    mode = "nosoftmax" if "--nosoftmax" in sys.argv else "production"
    if mode == "nosoftmax":
        _patch()
    print(f"== {mode}")
    bench("freq", FREQ)
    bench("time", TIME)


if __name__ == "__main__":
    main()
