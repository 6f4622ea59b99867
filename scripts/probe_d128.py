"""Block-config sweep for the d=128 (Llama-7B-shape) prefill gap (round 3).

VERDICT r2 #1: the BH=128, d=128, S=2048 bf16 row runs at 139 TF/s (71% of
v5e peak) with no structural excuse.  Hypotheses probed here:

1. ``BlockSizes.fit`` ignores head_dim — the d=128 config space was never
   swept (scripts/tune_flash.py only sweeps d=64 shapes).
2. ``block_kv_compute == block_kv`` leaves one sub-tile per grid step, so
   QK^T (MXU) -> max/exp (VPU) -> PV (MXU) is a single serial dependency
   chain; bkc < bkv gives the VLIW scheduler independent chains from
   adjacent sub-tiles to overlap MXU and VPU work.

Run: python scripts/probe_d128.py [sweep|d64|causal]
"""

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flashattention_tpu.ops.flash import BlockSizes, flash_attention
from flashattention_tpu.utils.benchit import attention_flops, devtime_ms
from flashattention_tpu.utils.testing import make_random


def sweep(bh, s, d, dtype, causal=False, configs=None):
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (make_random(kk, (bh, s, d), dtype) for kk in ks)
    fl = attention_flops(bh, s, s, d, causal=causal)
    print(f"== BH={bh} d={d} S={s} {dtype.__name__} causal={causal} ==", flush=True)
    if configs is None:
        configs = [
            (bq, bkv, bkc)
            for bq, bkv, bkc in itertools.product(
                (256, 512, 1024), (512, 1024, 2048), (256, 512, 1024, 2048)
            )
            if bkc <= bkv and bkv % bkc == 0 and bq <= s and bkv <= s
        ]
    best = None
    for bq, bkv, bkc in configs:
        bs = BlockSizes(bq, bkv, bkc)
        try:
            ms = devtime_ms(
                lambda q, k, v, bs=bs: flash_attention(
                    q, k, v, block_sizes=bs, causal=causal
                ),
                (q, k, v),
            )
        except Exception as e:
            print(f"  {bq:4}/{bkv:5}/{bkc:5}: FAIL {type(e).__name__}: {e}", flush=True)
            continue
        tag = ""
        if best is None or ms < best[0]:
            best = (ms, bs)
            tag = "  <-- best"
        print(
            f"  {bq:4}/{bkv:5}/{bkc:5}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s{tag}",
            flush=True,
        )
    if best is not None:
        print(f"  BEST: {best[1]} -> {best[0]:.3f} ms  {fl/best[0]/1e9:.1f} TF/s")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    if which == "sweep":
        sweep(128, 2048, 128, jnp.bfloat16)
    elif which == "d64":
        # The bf16 d=64 headline (VERDICT #3): does sub-tiling move it?
        sweep(
            16, 8192, 64, jnp.bfloat16,
            configs=[
                (512, 2048, 2048), (512, 2048, 1024), (512, 2048, 512),
                (1024, 2048, 2048), (1024, 2048, 1024),
                (512, 4096, 4096), (512, 4096, 2048), (512, 4096, 1024),
                (1024, 4096, 2048), (1024, 8192, 2048), (1024, 8192, 1024),
            ],
        )
    elif which == "causal":
        # Causal headline (VERDICT #2): tri grid + sub-stripe predication.
        sweep(
            16, 8192, 64, jnp.bfloat16, causal=True,
            configs=[
                (512, 1024, 1024), (512, 1024, 512), (512, 2048, 1024),
                (512, 2048, 512), (1024, 1024, 1024), (1024, 2048, 1024),
                (1024, 2048, 512), (256, 1024, 1024), (1024, 1024, 512),
                (512, 2048, 2048), (1024, 2048, 2048),
            ],
        )
    else:
        raise SystemExit(f"unknown probe {which!r}")


if __name__ == "__main__":
    main()
