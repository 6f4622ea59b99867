"""Round-5: causal/non-causal block-geometry sweep for the S=8192 bf16 d=64
headlines (VERDICT r4 #1, #5).

probe_causal_r5.txt decomposed the causal gap (2.195 ms vs the 36-unit
ideal floor 36 x 52.2 us = 1.878 ms): mask 0.060 ms, bkv=1024 per-step
fixed cost 0.164 ms, tri bookkeeping + diagonal skew 0.092 ms.  The
per-step cost is geometry, not kernel code — so sweep geometries:
larger bq amortizes Q-side work per step, larger bkv cuts step count
(the measured 56.8 -> 52.2 us/unit gain from bkv 1024 -> 2048), and the
tri table supports rectangular (bq != bkv) pairs natively.

Each config is timed AND validated against the library's default-config
output (itself oracle-validated in tests), so a geometry that breaks
diagonal masking (e.g. bkv > bq straddles) reports FAIL, not a fake win.

Run: python scripts/probe_causal_geom.py   (needs the real chip)
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(causal, bq, bkv, split, label):
    code = f"""
import sys; sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import jax, jax.numpy as jnp
from flashattention_tpu.ops.flash import BlockSizes, flash_attention
from flashattention_tpu.utils.benchit import attention_flops, devtime_ms
from flashattention_tpu.utils.testing import make_random
ks = jax.random.split(jax.random.key(0), 3)
q, k, v = (make_random(kk, (16, 8192, 64), jnp.bfloat16) for kk in ks)
bs = BlockSizes({bq}, {bkv}, {bkv}, 1, {split})
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
        print(f"  {label:42s} TIMEOUT", flush=True)
        return
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    print(f"  {label:42s} {line[0][7:] if line else 'FAIL: ' + out.stderr[-250:]}",
          flush=True)


def main():
    print("== causal geometry sweep (bf16 S=8192 BH=16 d=64) ==", flush=True)
    timed(True, 1024, 1024, 2, "causal bq1024 bkv1024 split2 (fit)")
    timed(True, 1024, 1024, 4, "causal bq1024 bkv1024 split4")
    timed(True, 1024, 1024, 1, "causal bq1024 bkv1024 split1")
    timed(True, 2048, 1024, 2, "causal bq2048 bkv1024 split2")
    timed(True, 2048, 2048, 2, "causal bq2048 bkv2048 split2")
    timed(True, 2048, 2048, 4, "causal bq2048 bkv2048 split4")
    timed(True, 1024, 2048, 2, "causal bq1024 bkv2048 split2")
    timed(True, 512, 1024, 2, "causal bq512  bkv1024 split2")
    timed(True, 4096, 1024, 2, "causal bq4096 bkv1024 split2")
    print("== non-causal geometry sweep (same shape) ==", flush=True)
    timed(False, 1024, 2048, 4, "noncau bq1024 bkv2048 split4 (fit)")
    timed(False, 1024, 4096, 4, "noncau bq1024 bkv4096 split4")
    timed(False, 1024, 4096, 8, "noncau bq1024 bkv4096 split8")
    timed(False, 2048, 2048, 4, "noncau bq2048 bkv2048 split4")
    timed(False, 2048, 4096, 4, "noncau bq2048 bkv4096 split4")
    timed(False, 512, 2048, 4, "noncau bq512  bkv2048 split4")


if __name__ == "__main__":
    main()
