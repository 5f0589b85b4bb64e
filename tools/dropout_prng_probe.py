"""Decompose the attention-step dropout overhead on the chip.

PERFORMANCE.md round 3: the freq-path fused attention step costs 39.8 ms
fwd+bwd drop-free but 49.9 ms at drop 0.1 — ~10 ms/call of dropout
overhead, ~40 ms of the 0.639 s train step.  Before optimizing, split that
overhead into its components by timing same-geometry stand-ins:

    production        fwd+bwd at drop 0.0 and 0.1 (reproduce the baseline)
    --noprng          `_prob_keep`'s PRNG draw replaced by an iota hash of
                      the same shape (keeps compare/where/concat + the
                      third [Lp, BLK] buffer; removes prng_seed +
                      prng_random_bits) -> delta = pure PRNG draw cost
    --noapply         `_drop_probs`/`_apply_keeps` become identity (the
                      whole probability site gone; geometry and the
                      post-projection site stay) -> delta = full prob-site
    --nopostproj      `_dropout_mask` all-keep without a draw -> delta =
                      post-projection site cost

Timing only — the stand-ins are NOT numerically meaningful.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from attn_bwd_experiment import FREQ, TIME, bench  # noqa: E402


def _patch_noprng():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from mss_tf_locoformer_tpu.ops.pallas import attention_block as AB

    def fake_prob_keep(seed_ref, group, gi, lp, h, qt, rate):
        row_idx = pl.program_id(0) * group + gi
        base = jnp.int32(h * 1024 + qt) * jnp.int32(48271) + row_idx
        bits = (jax.lax.broadcasted_iota(jnp.int32, (lp, 128), 0)
                * jnp.int32(2654435761 & 0x7FFFFFFF) + base)
        bits = jax.lax.bitwise_and(bits, jnp.int32(0x7FFFFFFF))
        return bits < jnp.int32(int((1.0 - rate) * (1 << 31)))

    AB._prob_keep = fake_prob_keep


def _patch_noapply():
    from mss_tf_locoformer_tpu.ops.pallas import attention_block as AB
    AB._drop_probs = lambda p, *a, **k: p
    AB._prob_keeps = lambda seed_ref, group, gi, lp, h, qb, blk_q, rate: [
        None] * (blk_q // 128)
    AB._apply_keeps = lambda p, keeps, rate: p


def _patch_nopostproj():
    import jax.numpy as jnp

    from mss_tf_locoformer_tpu.ops.pallas import attention_block as AB

    def fake_mask(seed_ref, group, gi, shape, rate):
        return jnp.ones(shape, jnp.int32) > 0
    AB._dropout_mask = fake_mask


def main():
    mode = "production"
    if "--noprng" in sys.argv:
        mode = "noprng"
        _patch_noprng()
    elif "--noapply" in sys.argv:
        mode = "noapply"
        _patch_noapply()
    elif "--nopostproj" in sys.argv:
        mode = "nopostproj"
        _patch_nopostproj()
    print(f"== {mode}")
    if mode == "production":
        bench("freq", FREQ, drop=0.0)
        bench("time", TIME, drop=0.0)
    bench("freq", FREQ, drop=0.1)
    bench("time", TIME, drop=0.1)


if __name__ == "__main__":
    main()
