"""Backward block sweep per head_dim (round 4; VERDICT #5).

The bwd 512x512 block cap was set once at d=64 (VMEM: ~4 score-sized fp32
tiles live at once) and never re-swept; this sweeps (block_q, block_kv) for
the two production shapes:

  d=64  S=4096 causal  (fp32 + bf16)  — the benchmarks.json rows; the fp32
                                        row sits at 39.5 TF/s vs a 45 target
  d=128 S=2048 causal  (fp32 + bf16)  — the flagship training shape, never
                                        benchmarked before round 4

Run: python scripts/tune_bwd.py
"""

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flashattention_tpu.ops.backward import flash_attention_bwd
from flashattention_tpu.ops.flash import BlockSizes, flash_attention
from flashattention_tpu.utils.benchit import attention_flops, devtime_ms
from flashattention_tpu.utils.testing import make_random


def sweep(bh, s, d, dtype, splits=(1,), blocks=None, fused=False):
    ks = jax.random.split(jax.random.key(0), 4)
    q, k, v = (make_random(kk, (bh, s, d), dtype) for kk in ks[:3])
    do = make_random(ks[3], (bh, s, d), dtype)
    o, l, m = flash_attention(q, k, v, causal=True, save_residuals=True)
    lse = m + jnp.log(jnp.where(l == 0.0, 1.0, l))
    fl = int(2.5 * attention_flops(bh, s, s, d, causal=True))
    print(f"== bwd BH={bh} d={d} S={s} {dtype.__name__} causal ==", flush=True)
    best = None
    if blocks is None:
        blocks = list(itertools.product((256, 512, 1024), (256, 512, 1024)))
    for (bq, bkv), sp in itertools.product(blocks, splits):
        bs = BlockSizes(bq, bkv, bkv, 1, sp)

        # NB (round 5): `...[0]` here let XLA dead-code-eliminate the dk/dv
        # pallas_call inside the jitted timing loop — the round-4 sweeps
        # timed the dq kernel only.  Sum all three gradients into the chain.
        def f(q, k, v, o, lse, do, bs=bs):
            dq, dk, dv = flash_attention_bwd(
                q, k, v, o, lse, do, causal=True, block_sizes=bs,
                fused=fused,
            )
            return (dq + dk + dv).astype(q.dtype)

        try:
            ms = devtime_ms(f, (q, k, v, o, lse, do), n_hi=5)
        except Exception as e:  # noqa: BLE001
            print(f"  {bq:4}/{bkv:4} sp={sp}: FAIL {type(e).__name__}: {e}",
                  flush=True)
            continue
        tag = ""
        if best is None or ms < best[0]:
            best = (ms, bs)
            tag = "  <-- best"
        print(f"  {bq:4}/{bkv:4} sp={sp}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s{tag}",
              flush=True)
    if best:
        print(f"  BEST: {best[1]} -> {best[0]:.3f} ms  {fl/best[0]/1e9:.1f} TF/s",
              flush=True)


def main():
    # --split: focused acc_split sweep on the per-(dtype, d) winning blocks
    # from the full round-4 sweep (measurements/tune_bwd.txt) — the _csplit
    # independent-chain question is orthogonal to the block-shape one.
    if "--fused" in sys.argv:
        # Round-5 default path (probe_fused_bwd.txt chose these; re-run to
        # re-tune after kernel/compiler changes).  splits are a no-op on the
        # fused kernel (no _csplit) — swept at 1 only.
        blocks = [(512, 512), (512, 1024), (1024, 512), (1024, 1024)]
        sweep(16, 4096, 64, jnp.float32, blocks=blocks, fused=True)
        sweep(16, 4096, 64, jnp.bfloat16, blocks=blocks, fused=True)
        sweep(64, 2048, 128, jnp.float32, blocks=blocks, fused=True)
        sweep(64, 2048, 128, jnp.bfloat16, blocks=blocks, fused=True)
        return
    if "--r5" in sys.argv:
        # Round-5 re-tune: every round-4 number was dq-only (the [0] DCE bug
        # fixed above), so the recorded bests are untrustworthy.  Full
        # honest re-sweep over the credible grid (256-blocks never won).
        blocks = list(itertools.product((512, 1024), (512, 1024)))
        sweep(16, 4096, 64, jnp.float32, splits=(1, 2), blocks=blocks)
        sweep(16, 4096, 64, jnp.bfloat16, splits=(1, 2), blocks=blocks)
        sweep(64, 2048, 128, jnp.float32, splits=(1, 2), blocks=blocks)
        sweep(64, 2048, 128, jnp.bfloat16, splits=(1, 2), blocks=blocks)
        return
    if "--split" in sys.argv:
        # Winning block shapes from measurements/tune_bwd.txt, plus the
        # runner-up with the larger contraction (more to split).
        sweep(16, 4096, 64, jnp.float32, splits=(1, 2, 4),
              blocks=[(1024, 512), (512, 1024), (1024, 1024)])
        sweep(16, 4096, 64, jnp.bfloat16, splits=(1, 2, 4),
              blocks=[(512, 1024), (1024, 1024)])
        sweep(64, 2048, 128, jnp.float32, splits=(1, 2, 4),
              blocks=[(512, 1024), (1024, 1024)])
        sweep(64, 2048, 128, jnp.bfloat16, splits=(1, 2, 4),
              blocks=[(1024, 1024)])
        return
    for dtype in (jnp.float32, jnp.bfloat16):
        sweep(16, 4096, 64, dtype)
    for dtype in (jnp.float32, jnp.bfloat16):
        sweep(64, 2048, 128, dtype)


if __name__ == "__main__":
    main()
