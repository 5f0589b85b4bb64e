"""Benchmark: 4-stem separation throughput on the base MUSDB18 config.

Measures steady-state real-time factor (audio-seconds separated per second
per chip) for the flagship TFLocoformerMSS forward (base config:
n_fft 2048 / hop 512 / 4 layers / emb 96) over batched 3-second chunks —
the chunked-OLA inference shape.

Baseline: the reference documents 1.5x realtime for the base config on an
RTX 5090 (README.md:360-368 / CONFIGS_COMPARISON.md; see BASELINE.md).
``vs_baseline`` = measured RTF / 1.5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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
    params = model.init(jax.random.PRNGKey(0), mixture[:1])
    mixture = jax.device_put(mixture)

    @jax.jit
    def forward(mixture):
        return model.apply(params, mixture)

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
    print(json.dumps({
        "metric": "separation_rtf_base_config",
        "value": round(rtf, 3),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtf / 1.5, 3),
    }))


if __name__ == "__main__":
    main()
