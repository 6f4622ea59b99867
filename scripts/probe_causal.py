"""Round-4: decompose the causal bf16 S=8192 headline gap (2.18 vs 1.85 ms).

Per-pair accounting from measurements/probe_pvsplit_d64.txt: the tri grid
runs 36 (1024x1024) pairs/head in 2.176 ms = 3.78 us/pair-equivalent, while
the non-causal kernel runs 64 equivalents in 3.227 ms = 3.15 us/pair at
bkv=2048.  The ~0.6 us/pair residual is some mix of
  (a) the unconditional vector-scalar mask chain (compare+select on every
      pair, though only 8/36 touch the diagonal),
  (b) the smaller per-step compute (1024 vs 2048 KV columns -> 2x the
      per-step fixed cost per FLOP),
  (c) tri-grid bookkeeping (prefetched table reads, init/epilogue ratio).
This probe separates them with timing-only runs:
  1. causal baseline (fit config)                   -> total
  2. causal, FA_MASK_SKIP=unsafe_none (WRONG results) -> total - mask cost
  3. non-causal at bq=1024 bkv=1024 split=2         -> per-step rate at the
     causal block geometry, no mask, no tri tables (64 pairs)
  4. non-causal at bkv=2048 split=4 (reference rate)
The gap between (3)'s rate and (4)'s rate prices (b); (1)-(2) prices (a);
what (2) still loses to (3) per pair prices (c) + diagonal skew.

Run: python scripts/probe_causal.py   (needs the real chip)
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(env_extra, causal, bq, bkv, split, label):
    code = f"""
import sys; sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import jax, jax.numpy as jnp
from flashattention_tpu.ops.flash import BlockSizes, flash_attention
from flashattention_tpu.utils.benchit import attention_flops, devtime_ms
from flashattention_tpu.utils.testing import make_random
ks = jax.random.split(jax.random.key(0), 3)
q, k, v = (make_random(kk, (16, 8192, 64), jnp.bfloat16) for kk in ks)
bs = BlockSizes({bq}, {bkv}, {bkv}, 1, {split})
ms = devtime_ms(lambda q, k, v: flash_attention(q, k, v, causal={causal}, block_sizes=bs), (q, k, v))
fl = attention_flops(16, 8192, 8192, 64, causal={causal})
print(f"RESULT {{ms:.4f}} ms  {{fl/ms/1e9:.1f}} TF/s")
"""
    env = dict(os.environ, **env_extra)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=2400,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    print(f"  {label:55s} {line[0][7:] if line else 'FAIL: ' + out.stderr[-300:]}",
          flush=True)


def main():
    print("== causal bf16 S=8192 decomposition (BH=16 d=64) ==", flush=True)
    timed({}, True, 1024, 1024, 2, "1. causal tri, mask always (baseline)")
    timed({"FA_MASK_SKIP": "unsafe_none"}, True, 1024, 1024, 2,
          "2. causal tri, mask OFF (timing-only, wrong diag)")
    timed({}, False, 1024, 1024, 2, "3. non-causal, same blocks (64 pairs)")
    timed({}, False, 1024, 2048, 4, "4. non-causal, bkv=2048 (reference rate)")


if __name__ == "__main__":
    main()
