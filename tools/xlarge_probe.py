"""Bisect the xlarge remote-compile failure (LANES.jsonl rtf_error).

The xlarge lane (n_fft 4096 / 12 layers / emb 256 / heads 16) fails to
compile on the chip with ``remote_compile: HTTP 500: tpu_compile_helper
subprocess exit code 1`` for BOTH the inference forward and the train step.
A crashed backend compile can wedge the device tunnel for ~30 min
(PERFORMANCE.md, fused-iSTFT post-mortem), so each stage of this bisection
runs in its OWN process:

    python tools/xlarge_probe.py fwd_xla       # all fused gates off
    python tools/xlarge_probe.py fwd_stft      # + fused Pallas STFT
    python tools/xlarge_probe.py fwd_ffn       # + fused FFN/block-step
    python tools/xlarge_probe.py fwd_full      # + flash attention (shipped)
    python tools/xlarge_probe.py train_xla     # train step, fused off
    python tools/xlarge_probe.py train_full    # train step, shipped config

Each stage jit-lowers and COMPILES (no execution) and prints OK + compile
seconds, or the exception.
"""

import dataclasses
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CFG = os.path.join(REPO, "configs/musdb18_xlarge.yaml")


def model_cfg(stage):
    from mss_tf_locoformer_tpu.core.config import load_config
    cfg = load_config(CFG)
    m = cfg.model
    fused = stage.endswith("full")
    repl = dict(flash_attention=fused,
                fused_ffn=fused or stage.endswith("ffn"),
                fused_stft=fused or stage.endswith(("stft", "ffn")))
    return cfg, dataclasses.replace(m, **repl)


def main():
    stage = sys.argv[1]
    import jax

    from mss_tf_locoformer_tpu.core.precision import BF16
    from mss_tf_locoformer_tpu.models import build_model

    cfg, mcfg = model_cfg(stage)
    sr = cfg.dataset.sample_rate
    rng = np.random.default_rng(0)

    if stage.startswith("fwd"):
        samples = int(3.0 * sr)
        mixture = (0.1 * rng.standard_normal((1, samples))).astype(np.float32)
        model = build_model(mcfg, precision=BF16)
        params = jax.device_put(model.init(jax.random.PRNGKey(0), mixture))
        t0 = time.time()
        c = jax.jit(model.apply).lower(params, mixture).compile()
        print(f"{stage}: OK compile {time.time() - t0:.1f}s "
              f"(flash={mcfg.flash_attention} ffn={mcfg.fused_ffn} "
              f"stft={mcfg.fused_stft})", flush=True)
        del c
        return

    # train step
    from mss_tf_locoformer_tpu.train.state import init_state, make_optimizer
    from mss_tf_locoformer_tpu.train.step import make_train_step

    seg = cfg.dataset.segment_length
    if os.environ.get("XL_SEG_S"):   # single-chip feasibility probes
        seg = int(float(os.environ["XL_SEG_S"]) * sr)
    if cfg.training.gradient_checkpointing and not mcfg.remat_blocks:
        mcfg = dataclasses.replace(mcfg, remat_blocks=True)
    model = build_model(mcfg, precision=BF16)
    mix = (0.1 * rng.standard_normal((1, seg))).astype(np.float32)
    stems = {k: (0.05 * rng.standard_normal((1, seg))).astype(np.float32)
             for k in ("vocals", "drums", "bass", "other")}
    params = model.init(jax.random.PRNGKey(0), mix)
    tcfg = dataclasses.replace(cfg.training, gradient_accumulation_steps=1)
    train_cfg = dataclasses.replace(cfg, training=tcfg, model=mcfg)
    tx = make_optimizer(tcfg)
    state = init_state(params, tx)
    step = make_train_step(model, train_cfg, tx)
    key = jax.random.PRNGKey(2)
    t0 = time.time()
    jstep = jax.jit(step)
    c = jstep.lower(state, mix, stems, 1e-4, key).compile()
    print(f"{stage}: OK compile {time.time() - t0:.1f}s "
          f"(flash={mcfg.flash_attention} ffn={mcfg.fused_ffn})", flush=True)
    del c
    if os.environ.get("XL_RUN"):   # time the step (forced scalar sync)
        import jax.numpy as jnp
        state, ld = jstep(state, mix, stems, 1e-4, key)
        float(ld["total_loss"])
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(4):
                state, ld = jstep(state, mix, stems, 1e-4, key)
            float(ld["total_loss"])
            best = min(best, (time.time() - t0) / 4)
        print(f"{stage}: {best:.3f} s/step (seg {seg / sr:.1f}s, batch 1)",
              flush=True)


if __name__ == "__main__":
    main()
