"""Headline benchmark: one JSON line for the driver.

Metric: forward-attention latency at the reference's headline config
(B=2, H=8, d=64, S=8192 non-causal; ``/root/reference/README.md:11`` — its
RTX 3060 number is 119 ms).  ``vs_baseline`` is the speedup over that number
(>1 is better than the reference).

Timing method: chained fori_loop under a single jit with forced host readback
and a two-point slope — robust to remote-dispatch per-call overhead (the plain
per-call wall clock on a tunneled TPU is dominated by network round trips).
"""

import json

import jax
import jax.numpy as jnp

from flashattention_tpu.ops.flash import BlockSizes, flash_attention
from flashattention_tpu.utils.benchit import attention_flops, devtime_ms
from flashattention_tpu.utils.testing import make_random

BASELINE_MS = 119.0  # reference "Ours" on RTX 3060, README.md:11
B, H, D, S = 2, 8, 64, 8192
DTYPE = jnp.float32  # the reference benchmarks FP32
BLOCKS = BlockSizes(512, 1024, 512)  # tuned on v5e (scripts/tune_flash.py)


def main():
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (make_random(kk, (B * H, S, D), DTYPE) for kk in ks)
    ms = devtime_ms(
        lambda q, k, v: flash_attention(q, k, v, block_sizes=BLOCKS), (q, k, v)
    )
    flops = attention_flops(B * H, S, S, D)
    print(
        json.dumps(
            {
                "metric": f"fwd_attention_latency_B{B}_H{H}_d{D}_S{S}_fp32",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 2),
                "tflops_per_s": round(flops / ms / 1e9, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
