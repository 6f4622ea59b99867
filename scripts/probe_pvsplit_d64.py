"""Round-4: does the pv_split win (measured +8% at d=128) carry to d=64?

At d=64 the PV matmul output is also one 128-lane tile (V is ones-extended
to 128 lanes for the MXU row sum), i.e. the same thin-N shape the d=128
decomposition identified as the v5e bottleneck (measurements/
D128_CEILING.md).  Sweep pv_split on the two d=64 headline shapes.

Run: python scripts/probe_pvsplit_d64.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flashattention_tpu.ops.flash import BlockSizes, flash_attention
from flashattention_tpu.utils.benchit import attention_flops, devtime_ms
from flashattention_tpu.utils.testing import make_random


def sweep(bh, s, d, dtype, causal, configs):
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (make_random(kk, (bh, s, d), dtype) for kk in ks)
    fl = attention_flops(bh, s, s, d, causal=causal)
    print(f"== BH={bh} d={d} S={s} {dtype.__name__} causal={causal} ==", flush=True)
    for bs in configs:
        try:
            ms = devtime_ms(
                lambda q, k, v, bs=bs: flash_attention(
                    q, k, v, causal=causal, block_sizes=bs
                ),
                (q, k, v),
            )
        except Exception as e:  # noqa: BLE001
            print(f"  {bs}: FAIL {type(e).__name__}: {e}", flush=True)
            continue
        print(
            f"  bq={bs.block_q:4} bkv={bs.block_kv:4} split={bs.pv_split}: "
            f"{ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s",
            flush=True,
        )


def main():
    # Non-causal bf16 headline (currently 3.32 ms @ 1024/2048).
    sweep(
        16, 8192, 64, jnp.bfloat16, False,
        [
            BlockSizes(1024, 2048, 2048, 1, s) for s in (1, 2, 4)
        ] + [BlockSizes(512, 2048, 2048, 1, 4), BlockSizes(1024, 4096, 4096, 1, 4)],
    )
    # Causal bf16 headline (currently 2.18-2.34 ms @ 1024/1024 tri grid).
    sweep(
        16, 8192, 64, jnp.bfloat16, True,
        [
            BlockSizes(1024, 1024, 1024, 1, s) for s in (1, 2, 4)
        ] + [
            BlockSizes(1024, 2048, 2048, 1, 4),
            BlockSizes(512, 2048, 2048, 1, 4),
            BlockSizes(1024, 2048, 2048, 1, 1),
        ],
    )
    # fp32 lane-packed headline (currently 3.61 ms fast / 7.75 default).
    sweep(
        16, 8192, 64, jnp.float32, False,
        [
            BlockSizes(1024, 2048, 2048, 1, s) for s in (1, 2, 4)
        ],
    )


if __name__ == "__main__":
    main()
