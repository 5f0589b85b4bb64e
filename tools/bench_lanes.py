"""Per-config measured lanes on the real chip (PERFORMANCE.md table).

For every shipped MUSDB config: separation RTF (chunked-OLA shape), training
s/step at the config's own micro-batch/segment/remat/dropout, analytic-FLOPs
MFU for both, and HBM peak.  Failures (OOM, gate rejections) are RECORDED,
not skipped — an unmeasured lane is the round-3 weakness this tool closes.

Writes one JSON object per lane to ``LANES.jsonl`` (append) and prints them.

Usage: python tools/bench_lanes.py [config ...]   (default: all shipped)
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_LANES = [
    ("small", "configs/musdb18_small.yaml", 8, 2),
    ("base", "configs/musdb18.yaml", 4, 2),
    ("bslocoformer", "configs/musdb18_bslocoformer.yaml", 4, 2),
    ("medium", "configs/musdb18_medium.yaml", 2, 2),
    ("lowmem", "configs/musdb18_lowmem.yaml", 4, 1),
    ("xlarge", "configs/musdb18_xlarge.yaml", 1, 1),
]


def _sync(out):
    import jax.numpy as jnp
    return float(sum(jnp.sum(v.astype(jnp.float32)) for v in
                     (out.values() if isinstance(out, dict) else [out])))


def _hbm_peak():
    import jax
    stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
    if not stats:
        return None
    return stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")


def measure_lane(name, cfg_path, infer_batch, train_micro):
    import jax
    from mss_tf_locoformer_tpu.core.config import load_config
    from mss_tf_locoformer_tpu.core.precision import BF16
    from mss_tf_locoformer_tpu.models import build_model
    from mss_tf_locoformer_tpu.utils.flops import (device_peak_flops,
                                                   tflocoformer_forward_flops,
                                                   train_step_flops)

    cfg = load_config(os.path.join(REPO, cfg_path))
    mcfg = cfg.model
    stereo = bool(getattr(mcfg, "stereo", False))
    peak = device_peak_flops()
    rec = {"lane": name, "config": cfg_path,
           "n_fft": mcfg.n_fft, "layers": mcfg.n_layers, "emb": mcfg.emb_dim}
    is_bs = type(mcfg).__name__ == "BSModelConfig"

    # ---------- separation forward (chunked-OLA inference shape: 3 s)
    sr = cfg.dataset.sample_rate
    seconds = 3.0
    samples = int(seconds * sr)
    rng = np.random.default_rng(0)
    shape = ((infer_batch, 2, samples) if stereo
             else (infer_batch, samples))
    mixture = (0.1 * rng.standard_normal(shape)).astype(np.float32)
    model = build_model(mcfg, precision=BF16)
    try:
        params = jax.device_put(model.init(jax.random.PRNGKey(0), mixture[:1]))
        # params as a jit ARGUMENT: a closure-captured tree is embedded as
        # program constants and the xlarge (~25 M param) serialized program
        # exceeds the remote-compile request limit (HTTP 413)
        fwd = jax.jit(model.apply)
        dev_mix = jax.device_put(mixture)
        _sync(fwd(params, dev_mix))  # compile
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(8):
                out = fwd(params, dev_mix)
            _sync(out)
            reps.append((time.perf_counter() - t0) / 8)
        fwd_s = min(reps)
        rec["rtf"] = round(infer_batch * seconds / fwd_s, 2)
        rec["fwd_ms"] = round(fwd_s * 1e3, 1)
        rec["fwd_batch"] = infer_batch
        if peak and not is_bs:
            fl = tflocoformer_forward_flops(mcfg, infer_batch, samples)
            rec["fwd_mfu"] = round(fl / fwd_s / peak, 4)
    except Exception as e:
        rec["rtf_error"] = f"{type(e).__name__}: {str(e)[:300]}"
    rec["hbm_peak_fwd_gb"] = (round(_hbm_peak() / 2**30, 2)
                              if _hbm_peak() else None)

    # ---------- train step (config's own segment/micro-batch/remat/dropout)
    try:
        from mss_tf_locoformer_tpu.core.config import Config
        from mss_tf_locoformer_tpu.train.state import (init_state,
                                                       make_optimizer)
        from mss_tf_locoformer_tpu.train.step import make_train_step

        seg = cfg.dataset.segment_length or samples
        mcfg_t = mcfg
        if cfg.training.gradient_checkpointing and not mcfg.remat_blocks:
            mcfg_t = dataclasses.replace(mcfg, remat_blocks=True)
        tmodel = build_model(mcfg_t, precision=BF16)
        tshape = ((train_micro, 2, seg) if stereo else (train_micro, seg))
        mix_t = jax.device_put(
            (0.1 * rng.standard_normal(tshape)).astype(np.float32))
        stems = {k: jax.device_put(
            (0.05 * rng.standard_normal(tshape)).astype(np.float32))
            for k in ("vocals", "drums", "bass", "other")[:mcfg.n_sources]}
        params_t = tmodel.init(jax.random.PRNGKey(0),
                               np.asarray(mix_t[:1]))
        tcfg = dataclasses.replace(cfg.training,
                                   gradient_accumulation_steps=1)
        train_cfg = dataclasses.replace(cfg, training=tcfg)
        tx = make_optimizer(tcfg)
        state = init_state(params_t, tx)
        step = make_train_step(tmodel, train_cfg, tx)
        key = jax.random.PRNGKey(2)

        def one(state):
            state, ld = step(state, mix_t, stems, 1e-4, key)
            return state, float(ld["total_loss"])

        state, _ = one(state)  # compile
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                state, _ = one(state)
            reps.append((time.perf_counter() - t0) / 4)
        st = min(reps)
        rec["train_s_per_step"] = round(st, 4)
        rec["train_micro_batch"] = train_micro
        rec["train_segment_s"] = round(seg / sr, 1)
        rec["remat"] = bool(cfg.training.gradient_checkpointing)
        if peak and not is_bs:
            rec["train_mfu"] = round(
                train_step_flops(mcfg, train_micro, seg) / st / peak, 4)
    except Exception as e:
        rec["train_error"] = f"{type(e).__name__}: {str(e)[:300]}"
    rec["hbm_peak_gb"] = (round(_hbm_peak() / 2**30, 2)
                          if _hbm_peak() else None)
    return rec


def main():
    lanes = DEFAULT_LANES
    if len(sys.argv) > 1:
        lanes = [l for l in DEFAULT_LANES if l[0] in sys.argv[1:]]
    out_path = os.path.join(REPO, "LANES.jsonl")
    for lane in lanes:
        rec = measure_lane(*lane)
        line = json.dumps(rec)
        print(line, flush=True)
        with open(out_path, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
