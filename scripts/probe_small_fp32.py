"""Round-4 probe: decompose the small-shape fp32 rows (VERDICT #3).

The reference's best-win shapes (B=8 H=16 S=1024, d=64/32 fp32,
README.md:13-14) run at 22.4 / 13.9 TF/s (ceiling_frac 0.45 / 0.42 vs the
lane-packed ceilings 49.2 / 32.8).  Round-3 shipped levers (block_h,
one-shot) without profiling the lock; this probe decomposes the 1.54 ms:

  hbm_floor    pure q/k/v/o stream (a copy kernel on the same tiles):
               fp32 traffic is ~134 MB -> ~0.16 ms if HBM-bound
  skeleton     packed QK + PV only (no softmax): the MXU+DMA floor
  pv_split     the d=128 finding applied here — the packed PV is ALSO a
               thin-N (128-lane) output accumulated serially; sweep splits
  block_h      1/4/8 heads per step at bq=512/1024
  bf16_inputs  the same shape with bf16 inputs (isolates the packed-fp32
               overhead from the shape overhead)

Run: python scripts/probe_small_fp32.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattention_tpu.ops.flash import BlockSizes, flash_attention
from flashattention_tpu.utils.benchit import attention_flops, devtime_ms
from flashattention_tpu.utils.testing import make_random


def hbm_floor(bh, s, d):
    """Copy kernel over the same q/k/v/o tiles: the pure-traffic floor."""

    def kernel(q_ref, k_ref, v_ref, o_ref):
        o_ref[...] = q_ref[...] + k_ref[...] + v_ref[...]

    @jax.jit
    def fn(q, k, v):
        return pl.pallas_call(
            kernel,
            grid=(bh,),
            in_specs=[pl.BlockSpec((1, s, d), lambda b: (b, 0, 0))] * 3,
            out_specs=pl.BlockSpec((1, s, d), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, s, d), jnp.float32),
        )(q, k, v)

    return fn


def main():
    for d in (64, 32):
        bh, s = 128, 1024
        ks = jax.random.split(jax.random.key(0), 3)
        q, k, v = (make_random(kk, (bh, s, d), jnp.float32) for kk in ks)
        fl = attention_flops(bh, s, s, d)
        print(f"== BH={bh} S={s} d={d} fp32 ==", flush=True)
        ms = devtime_ms(hbm_floor(bh, s, d), (q, k, v))
        print(f"  hbm_floor           : {ms:7.3f} ms", flush=True)
        configs = [
            ("fit (auto)", None),
            ("bq1024 bh8 split1", BlockSizes(1024, 1024, 1024, 8, 1)),
            ("bq1024 bh8 split4", BlockSizes(1024, 1024, 1024, 8, 4)),
            ("bq1024 bh4 split4", BlockSizes(1024, 1024, 1024, 4, 4)),
            ("bq1024 bh1 split4", BlockSizes(1024, 1024, 1024, 1, 4)),
            ("bq512  bh8 split4", BlockSizes(512, 1024, 1024, 8, 4)),
            ("bq1024 bh8 split8", BlockSizes(1024, 1024, 1024, 8, 8)),
        ]
        for name, bs in configs:
            try:
                ms = devtime_ms(
                    lambda q, k, v, bs=bs: flash_attention(q, k, v, block_sizes=bs),
                    (q, k, v),
                )
            except Exception as e:  # noqa: BLE001
                print(f"  {name:20}: FAIL {type(e).__name__}: {e}", flush=True)
                continue
            print(f"  {name:20}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s", flush=True)
        # bf16-input comparison point (same shape, native MXU).
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        ms = devtime_ms(
            lambda q, k, v: flash_attention(q, k, v), (qb, kb, vb)
        )
        print(f"  bf16 inputs (fit)   : {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
