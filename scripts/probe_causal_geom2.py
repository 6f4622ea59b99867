"""Round-5 part 2: causal sub-striped wide-KV geometries (VERDICT r4 #1).

probe_causal_geom.txt showed no bkc==bkv geometry beats the fit config
(1024^2/split2, 2.1655 ms), and probe_causal_r5.txt priced the per-step
fixed cost at ~9 us/step (36 steps).  The untested lever: block_kv >>
block_kv_compute — the kernel's sub-tile diagonal predication
(ops/flash.py run_sub) skips DEAD 1024-substripes inside a wide KV block,
so a bkv=4096 tri grid runs 12 grid steps (vs 36) while still executing
only the ~36 live substripes.  Dead-substripe K/V DMA does stream (the
BlockSpec block is whole), but causal KV traffic is ~0.2 ms of HBM against
a 2.16 ms compute bound — hideable.

Run: python scripts/probe_causal_geom2.py   (needs the real chip)
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(causal, bq, bkv, bkc, split, label):
    code = f"""
import sys; sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import jax, jax.numpy as jnp
from flashattention_tpu.ops.flash import BlockSizes, flash_attention
from flashattention_tpu.utils.benchit import attention_flops, devtime_ms
from flashattention_tpu.utils.testing import make_random
ks = jax.random.split(jax.random.key(0), 3)
q, k, v = (make_random(kk, (16, 8192, 64), jnp.bfloat16) for kk in ks)
bs = BlockSizes({bq}, {bkv}, {bkc}, 1, {split})
fn = lambda q, k, v: flash_attention(q, k, v, causal={causal}, block_sizes=bs)
ref = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal={causal}))(q, k, v)
err = float(jnp.max(jnp.abs(jax.jit(fn)(q, k, v).astype(jnp.float32) - ref.astype(jnp.float32))))
ms = devtime_ms(fn, (q, k, v))
fl = attention_flops(16, 8192, 8192, 64, causal={causal})
print(f"RESULT {{ms:.4f}} ms  {{fl/ms/1e9:.1f}} TF/s  err={{err:.2e}}")
"""
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=2400,
        )
    except subprocess.TimeoutExpired:
        print(f"  {label:46s} TIMEOUT", flush=True)
        return
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    print(f"  {label:46s} {line[0][7:] if line else 'FAIL: ' + out.stderr[-250:]}",
          flush=True)


def main():
    print("== causal sub-striped wide-KV sweep (bf16 S=8192 BH=16 d=64) ==",
          flush=True)
    timed(True, 1024, 2048, 1024, 2, "causal bq1024 bkv2048 bkc1024 split2 (20 st)")
    timed(True, 1024, 4096, 1024, 2, "causal bq1024 bkv4096 bkc1024 split2 (12 st)")
    timed(True, 1024, 8192, 1024, 2, "causal bq1024 bkv8192 bkc1024 split2 (8 st)")
    timed(True, 1024, 4096, 2048, 2, "causal bq1024 bkv4096 bkc2048 split2")
    timed(True, 2048, 4096, 1024, 2, "causal bq2048 bkv4096 bkc1024 split2")
    timed(True, 1024, 8192, 1024, 4, "causal bq1024 bkv8192 bkc1024 split4")
    print("== non-causal confirmations ==", flush=True)
    timed(False, 2048, 2048, 2048, 4, "noncau bq2048 bkv2048 split4 (rerun)")
    timed(False, 2048, 2048, 2048, 2, "noncau bq2048 bkv2048 split2")
    timed(False, 4096, 2048, 2048, 4, "noncau bq4096 bkv2048 split4")


if __name__ == "__main__":
    main()
