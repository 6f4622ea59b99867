"""Round-5: wide-KV + substripe compute for non-causal d=64 (follow-up).

The d=128 S=4096 sweep (probe_d128_s4096.txt) found bkv=4096 DMA blocks
with bkc=2048 compute substripes at 160.6 TF/s vs 141 for every bkc==bkv
config — fewer grid steps at unchanged compute width.  Test the same
schedule on the bf16 d=64 S=8192 headline (current best bq2048/bkv2048
3.14-3.26 ms).

Run: python scripts/probe_substripe_d64.py   (needs the real chip)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flashattention_tpu.ops.flash import BlockSizes, flash_attention
from flashattention_tpu.utils.benchit import attention_flops, devtime_ms
from flashattention_tpu.utils.testing import make_random


def main():
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (make_random(kk, (16, 8192, 64), jnp.bfloat16) for kk in ks)
    fl = attention_flops(16, 8192, 8192, 64)
    ref = jax.jit(lambda q, k, v: flash_attention(q, k, v))(q, k, v)
    for bq, bkv, bkc, sp in (
        (2048, 2048, 2048, 4),   # current fit (baseline)
        (2048, 4096, 2048, 4),
        (1024, 4096, 2048, 4),
        (2048, 8192, 2048, 4),
        (1024, 8192, 2048, 4),
        (2048, 4096, 4096, 4),
    ):
        bs = BlockSizes(bq, bkv, bkc, 1, sp)
        f = lambda q, k, v, bs=bs: flash_attention(q, k, v, block_sizes=bs)
        try:
            out = jax.jit(f)(q, k, v)
            err = float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - ref.astype(jnp.float32))))
            ms = devtime_ms(f, (q, k, v))
        except Exception as e:  # noqa: BLE001
            print(f"  {bq}/{bkv}/{bkc} sp{sp}: FAIL {type(e).__name__}: {e}",
                  flush=True)
            continue
        print(f"  {bq}/{bkv}/{bkc} sp{sp}: {ms:7.4f} ms  {fl/ms/1e9:5.1f} TF/s"
              f"  err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
