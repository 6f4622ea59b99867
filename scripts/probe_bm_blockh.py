"""Round-5: block-sparse band grid — head batching sweep (VERDICT r4 #4).

benchmarks.json's band rows run 71.7 us/pair-unit vs the prefix-LM grid's
58.7 and the tri grid's 61 — the band's per-head rows are SHALLOW (22 pairs
over 8 q blocks = 2.75 steps/row), so pipeline ramp dominates.  block_h now
folds heads on the bm grid; sweep it, and also compare mask block sizes.

Run: python scripts/probe_bm_blockh.py   (needs the real chip)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flashattention_tpu.ops.flash import BlockMask, BlockSizes, flash_attention
from flashattention_tpu.utils.benchit import attention_flops, devtime_ms
from flashattention_tpu.utils.testing import make_random

S = 8192


def band_1024(r, c):
    return abs(r - c) < 1024


def band_512(r, c):
    return abs(r - c) < 512


def main():
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (make_random(kk, (16, S, 64), jnp.bfloat16) for kk in ks)
    fl_dense = attention_flops(16, S, S, 64)
    ref = None
    for label, fn, mq, mkv, bhf, sp in (
        ("w1024 blk1024 bh1 sp4", band_1024, 1024, 1024, 1, 4),
        ("w1024 blk1024 bh2 sp4", band_1024, 1024, 1024, 2, 4),
        ("w1024 blk1024 bh4 sp4", band_1024, 1024, 1024, 4, 4),
        ("w1024 blk1024 bh8 sp4", band_1024, 1024, 1024, 8, 4),
        ("w1024 blk1024 bh4 sp2", band_1024, 1024, 1024, 4, 2),
        ("w512  blk512  bh4 sp4", band_512, 512, 512, 4, 4),
        ("w512  blk1024 bh4 sp4", band_512, 1024, 1024, 4, 4),
    ):
        bm = BlockMask.from_mask_fn(fn, S, S, block_q=mq, block_kv=mkv)
        bs = BlockSizes(mq, mkv, mkv, bhf, sp)
        f = lambda q, k, v, bm=bm, bs=bs: flash_attention(
            q, k, v, block_mask=bm, block_sizes=bs
        )
        out = jax.jit(f)(q, k, v).astype(jnp.float32)
        key = fn.__name__
        if ref is None or ref[0] != key:
            ref = (key, out)
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(out - ref[1])))
        ms = devtime_ms(f, (q, k, v))
        fl_live = fl_dense * bm.element_live_fraction
        print(
            f"  {label:24s} {ms:7.4f} ms  live {fl_live/ms/1e9:5.1f} TF/s  "
            f"occ {bm.occupancy:.2f}  err={err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
