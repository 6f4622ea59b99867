"""Block-size tuning sweep for the flash kernel on real TPU hardware.

Run directly on a TPU host: ``python scripts/tune_flash.py``.
Timing uses a chained fori_loop under one jit with forced host readback and a
two-point slope, which is robust to the remote-dispatch overhead of tunneled
TPU setups (plain per-call wall clock is dominated by round trips).
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


def main():
    # Wide heads (round 3; VERDICT #10): pass "wide" to sweep d=192/256
    # (bf16 only — wide heads are the bf16 production regime).
    if len(sys.argv) > 1 and sys.argv[1] == "wide":
        shapes = [(4, 8, 192, 2048), (4, 8, 256, 2048), (2, 8, 256, 4096)]
        dtypes = [jnp.bfloat16]
        bhs = (1,)
    elif len(sys.argv) > 1 and sys.argv[1] == "small":
        # Small-S overhead shapes (round 3; VERDICT #4): sweep block_h too.
        shapes = [(8, 16, 64, 1024), (8, 16, 32, 1024)]
        dtypes = [jnp.float32, jnp.bfloat16]
        bhs = (1, 2, 4, 8, 16)
    else:
        shapes = [(8, 16, 64, 1024), (2, 8, 64, 8192)]
        dtypes = [jnp.bfloat16, jnp.float32]
        bhs = (1,)
    for (b, h, d, s), dtype in itertools.product(shapes, dtypes):
        ks = jax.random.split(jax.random.key(0), 3)
        q, k, v = (make_random(kk, (b * h, s, d), dtype) for kk in ks)
        fl = attention_flops(b * h, s, s, d)
        print(f"== B={b} H={h} d={d} S={s} {dtype.__name__} ==")
        best = None
        for bq, bkv, bkc, bhead in itertools.product(
            (128, 256, 512, 1024),
            (128, 256, 512, 1024, 2048),
            (128, 256, 512, 1024, 2048),
            bhs,
        ):
            if bkc > bkv or bkv % bkc or bq > s or bkv > s:
                continue
            if len(bhs) > 1 and (bkc != bkv or (b * h) % bhead):
                continue  # block_h sweep: skip sub-tiling x head-batch cross
            bs = BlockSizes(bq, bkv, bkc, bhead)
            try:
                ms = devtime_ms(
                    lambda q, k, v, bs=bs: flash_attention(q, k, v, block_sizes=bs),
                    (q, k, v),
                )
            except Exception as e:  # VMEM OOM etc.
                print(f"  {bq:4}/{bkv:5}/{bkc:5}/h{bhead}: FAIL {type(e).__name__}")
                continue
            tag = ""
            if best is None or ms < best[0]:
                best = (ms, bs)
                tag = "  <-- best"
            print(
                f"  {bq:4}/{bkv:5}/{bkc:5}/h{bhead}: {ms:7.3f} ms"
                f"  {fl/ms/1e9:6.1f} TF/s{tag}"
            )
        if best is None:
            print("  (no config compiled)")
        else:
            print(f"  BEST: {best[1]} -> {best[0]:.3f} ms")


def cache_q():
    """The reference's CACHE_Q residency trade, measured on TPU (round 2).

    The reference can trade SMEM residency of Q for occupancy (CACHE_Q=0 is
    +20% on a 3060, /root/reference/README.md:28-32).  On TPU the trade has
    no direct analog: Pallas re-fetches an input block only when its
    runtime block index CHANGES, so a KV-invariant Q index map gives free
    residency (one buffered tile, zero refetch traffic) and there is no
    occupancy resource to buy back — the revolver pipeline depth is fixed.
    The measurable residual of the trade is VMEM pressure from the Q tile
    under the multi-pass fp32 emulation: sweep block_q at the pressure
    corner and report whether a smaller resident tile (the CACHE_Q=0
    spirit) ever wins.
    """
    b, h, d, s = 2, 8, 64, 8192
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (make_random(kk, (b * h, s, d), jnp.float32) for kk in ks)
    fl = attention_flops(b * h, s, s, d)
    print(f"== CACHE_Q analog: fp32(packed) B={b} H={h} d={d} S={s} ==")
    for bq in (256, 512, 1024):
        bs = BlockSizes(bq, 2048, 2048)
        ms = devtime_ms(
            lambda q, k, v, bs=bs: flash_attention(q, k, v, block_sizes=bs),
            (q, k, v), n_hi=5,
        )
        print(f"  block_q={bq:5}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "cache_q":
        cache_q()
    else:
        main()
