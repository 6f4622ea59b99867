"""Round-5: honest fused-vs-two-pass backward A/B.

The fused=False default rests on "1.50 ms (fused) vs 0.93 ms (two-pass)"
— but 0.93 is from the DCE era: two-pass timings took `...[0]`, so XLA
dead-code-eliminated the dkv pallas_call and timed dq alone.  The fused
kernel is ONE pallas_call with three outputs (not individually DCE-able),
so its 1.50 was real.  Honest two-pass (tune_bwd_r5.txt) is 1.97-2.26 ms
at the same shape — the fused kernel may actually WIN.

Sweeps fused blocks too (its geometry was never tuned: kv-major grid,
full-sequence dQ accumulator).

Run: python scripts/probe_fused_bwd.py   (needs the real chip)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flashattention_tpu.ops.backward import flash_attention_bwd
from flashattention_tpu.ops.flash import BlockSizes, flash_attention
from flashattention_tpu.utils.benchit import attention_flops, devtime_ms
from flashattention_tpu.utils.testing import make_random


def run(bh, s, d, dtype):
    ks = jax.random.split(jax.random.key(0), 4)
    q, k, v = (make_random(kk, (bh, s, d), dtype) for kk in ks[:3])
    do = make_random(ks[3], (bh, s, d), dtype)
    o, l, m = flash_attention(q, k, v, causal=True, save_residuals=True)
    lse = m + jnp.log(jnp.where(l == 0.0, 1.0, l))
    fl = int(2.5 * attention_flops(bh, s, s, d, causal=True))
    print(f"== bwd A/B BH={bh} d={d} S={s} {dtype.__name__} causal ==",
          flush=True)

    def f(fused, bs=None):
        def g(q, k, v, o, lse, do):
            dq, dk, dv = flash_attention_bwd(
                q, k, v, o, lse, do, causal=True, fused=fused, block_sizes=bs
            )
            return (dq + dk + dv).astype(q.dtype)
        return g

    for label, fused, bs in (
        ("two-pass auto", False, None),
        ("fused auto", True, None),
        ("fused 512/512", True, BlockSizes(512, 512, 512)),
        ("fused 512/1024", True, BlockSizes(512, 1024, 1024)),
        ("fused 1024/512", True, BlockSizes(1024, 512, 512)),
        ("fused 1024/1024", True, BlockSizes(1024, 1024, 1024)),
    ):
        try:
            ms = devtime_ms(f(fused, bs), (q, k, v, o, lse, do), n_hi=5)
        except Exception as e:  # noqa: BLE001
            print(f"  {label:16s}: FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            continue
        print(f"  {label:16s}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s",
              flush=True)


def main():
    run(16, 4096, 64, jnp.bfloat16)
    run(16, 4096, 64, jnp.float32)
    run(64, 2048, 128, jnp.bfloat16)
    run(64, 2048, 128, jnp.float32)


if __name__ == "__main__":
    main()
