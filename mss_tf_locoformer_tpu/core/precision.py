"""Mixed-precision policy with fp32 islands.

The reference trains under ``torch.cuda.amp.autocast`` (bf16) but pins four
sites to fp32 (``models/mss_tflocoformer.py:218,229,550,682``):

  * the Conv2d encoder + GroupNorm,
  * the ConvTranspose2d decoder,
  * RMSGroupNorm,
  * RoPE rotation.

On TPU we express the same thing as an explicit policy: parameters live in
fp32, block compute runs in ``compute_dtype`` (bf16 by default — the MXU's
native input type), and island ops up-cast to fp32 locally.  Softmax inside
attention is always accumulated in fp32.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

__all__ = ["Precision", "FP32", "BF16", "precision_from_amp"]


@dataclass(frozen=True)
class Precision:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    island_dtype: jnp.dtype = jnp.float32  # encoder/decoder/norm/rope compute

    def cast_compute(self, x):
        return x.astype(self.compute_dtype) if x.dtype != self.compute_dtype else x

    def cast_island(self, x):
        return x.astype(self.island_dtype) if x.dtype != self.island_dtype else x


FP32 = Precision()
BF16 = Precision(compute_dtype=jnp.bfloat16)


def precision_from_amp(use_amp: bool, amp_dtype: str = "bfloat16") -> Precision:
    if not use_amp or amp_dtype == "float32":
        return FP32
    if amp_dtype == "bfloat16":
        return BF16
    if amp_dtype == "float16":
        # fp16 has no advantage over bf16 on TPU; map to bf16 (documented divergence)
        return BF16
    raise ValueError(f"unknown amp_dtype {amp_dtype}")
