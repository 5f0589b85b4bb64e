"""Benchmark: 4-stem separation throughput on the base MUSDB18 config.

Measures steady-state real-time factor (audio-seconds separated per second
per chip) for the flagship TFLocoformerMSS forward (base config:
n_fft 2048 / hop 512 / 4 layers / emb 96) over batched 3-second chunks —
the chunked-OLA inference shape.

Baseline: the reference documents 1.5x realtime for the base config on an
RTX 5090 (README.md:360-368 / CONFIGS_COMPARISON.md; see BASELINE.md).
``vs_baseline`` = measured RTF / 1.5.

Stdout carries exactly ONE JSON line ({"metric", "value", "unit",
"vs_baseline"} — what the driver parses); a secondary training-step metric
(base config, batch 2, 3 s, dropout 0.1 — the PERFORMANCE.md training
shape) goes to stderr.  Reference training baseline:
their docs predict 25 min/epoch on an RTX 5090 at batch 1 (~86 tracks x
~40 chunks -> ~0.44 s per batch-1 step; ours is batch 2, so ``vs_baseline``
= (2/step_s) / (1/0.44) chunk-throughput ratio.
"""

import json
import time

import numpy as np


def main():
    import jax
    from mss_tf_locoformer_tpu.core.config import ModelConfig
    from mss_tf_locoformer_tpu.core.precision import BF16
    from mss_tf_locoformer_tpu.models.mss_tflocoformer import TFLocoformerMSS

    cfg = ModelConfig(n_fft=2048, hop_length=512, n_sources=4, n_layers=4,
                      emb_dim=96, num_groups=4, n_heads=4, attention_dim=96,
                      flash_attention=True, fused_ffn=True, fused_stft=True,
                      ffn_type=("swiglu_conv1d", "swiglu_conv1d"),
                      ffn_hidden_dim=(384, 384))
    model = TFLocoformerMSS(cfg, precision=BF16)

    batch = 4
    seconds = 3.0
    sr = 44100
    samples = int(seconds * sr)  # 132300, matches base config segment_length

    rng = np.random.default_rng(0)
    mixture = rng.standard_normal((batch, samples)).astype(np.float32) * 0.1
    # params as a jit ARGUMENT, not a closure constant: captured trees are
    # embedded into the lowered program, which exceeds remote-compile
    # request limits at larger configs (tools/bench_lanes.py)
    params = jax.device_put(model.init(jax.random.PRNGKey(0), mixture[:1]))
    mixture = jax.device_put(mixture)
    apply_jit = jax.jit(model.apply)

    def forward(mixture):
        return apply_jit(params, mixture)

    # warmup / compile; sync via a scalar fetch (block_until_ready alone has
    # been observed to return early over remote-device tunnels)
    def run_sync(n):
        out = None
        for _ in range(n):
            out = forward(mixture)
        return float(sum(jnp.sum(v.astype(jnp.float32)) for v in out.values()))

    import jax.numpy as jnp
    run_sync(1)

    iters = 10
    t0 = time.perf_counter()
    run_sync(iters)
    elapsed = time.perf_counter() - t0

    audio_sec = batch * seconds * iters
    rtf = audio_sec / elapsed

    # MFU: analytic model FLOPs (matmuls/convs/FFT only — utils/flops.py)
    # over the chip's peak bf16 FLOP/s; None off-TPU where peak is unknown
    from mss_tf_locoformer_tpu.utils.flops import (device_peak_flops,
                                                   tflocoformer_forward_flops)
    peak = device_peak_flops()
    fwd_flops = tflocoformer_forward_flops(cfg, batch, samples)
    fwd_mfu = (fwd_flops * iters / elapsed / peak) if peak else None

    train_line = _bench_train_step(cfg, mixture[:2], samples, peak)
    if train_line:
        # secondary metric on STDERR: stdout carries exactly the ONE
        # canonical JSON line the driver parses
        import sys
        print(train_line, file=sys.stderr)
    print(json.dumps({
        "metric": "separation_rtf_base_config",
        "value": round(rtf, 3),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtf / 1.5, 3),
        "mfu": round(fwd_mfu, 4) if fwd_mfu is not None else None,
    }))


def _bench_train_step(model_cfg, mixture, samples, peak=None):
    """Secondary metric: full optimizer step (fwd+bwd+AdamW), base config,
    batch 2, dropout 0.1 — PERFORMANCE.md's training shape.  No remat: the
    fused kernels' custom VJPs stash only sub-step inputs, so micro-batch 2
    fits 16 GB HBM without it (measured 0.930 -> 0.770 s/step on v5e)."""
    try:
        import dataclasses
        import jax
        import jax.numpy as jnp
        from mss_tf_locoformer_tpu.core.config import Config, LossConfig, \
            TrainingConfig
        from mss_tf_locoformer_tpu.core.precision import BF16
        from mss_tf_locoformer_tpu.models.mss_tflocoformer import TFLocoformerMSS
        from mss_tf_locoformer_tpu.train.state import init_state, make_optimizer
        from mss_tf_locoformer_tpu.train.step import make_train_step

        mcfg = dataclasses.replace(model_cfg, dropout=0.1,
                                   remat_blocks=False, remat_ffn=False)
        cfg = Config(model=mcfg, loss=LossConfig(loss_type="combined"),
                     training=TrainingConfig(use_amp=True, amp_dtype="bfloat16"))
        model = TFLocoformerMSS(mcfg, precision=BF16)
        rng = np.random.default_rng(1)
        stems = {k: jax.device_put(
            0.25 * rng.standard_normal((2, samples)).astype(np.float32))
            for k in ("vocals", "drums", "bass", "other")}
        params = model.init(jax.random.PRNGKey(0), np.asarray(mixture)[:1])
        tx = make_optimizer(cfg.training)
        state = init_state(params, tx)
        step = make_train_step(model, cfg, tx)
        key = jax.random.PRNGKey(2)

        def one(state):
            state, ld = step(state, mixture, stems, 1e-4, key)
            return state, float(ld["total_loss"])  # forced scalar sync

        state, _ = one(state)  # compile
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            state, _ = one(state)
        per_step = (time.perf_counter() - t0) / iters
        from mss_tf_locoformer_tpu.utils.flops import train_step_flops
        mfu = (train_step_flops(mcfg, 2, samples) / per_step / peak
               if peak else None)
        # reference-predicted RTX 5090 pace: ~0.44 s per batch-1 chunk
        return json.dumps({
            "metric": "train_step_base_config_b2",
            "value": round(per_step, 4),
            "unit": "sec/step",
            "vs_baseline": round((2.0 / per_step) / (1.0 / 0.44), 3),
            "mfu": round(mfu, 4) if mfu is not None else None,
        })
    except Exception as e:  # secondary metric must never break the bench
        import sys
        print(f"train-step bench skipped: {type(e).__name__}: {e}",
              file=sys.stderr)
        return ""


if __name__ == "__main__":
    main()
