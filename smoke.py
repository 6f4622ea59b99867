#!/usr/bin/env python
"""Standalone smoke/perf harness: deterministic inputs, one timed causal run.

TPU-native equivalent of the reference's no-torch harness ``test.cu``
(``/root/reference/test.cu:606-646``): batch=8, S=8192, d=64, Q=K=iota-derived,
V=ones, causal kernel, wall-clock printout.  Improvements over the reference
(which validates nothing and under-allocates its output buffer,
``test.cu:610``): with V = ones, softmax weights sum to 1, so every output
element must be exactly 1.0 — the run is self-checking.

Usage: python smoke.py [--batch 8] [--seq_len 8192] [--d 64]
"""

import argparse
import time

import jax
import jax.numpy as jnp

from flashattention_tpu.ops.flash import flash_attention
from flashattention_tpu.utils.benchit import attention_flops, devtime_ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq_len", type=int, default=8192)
    p.add_argument("--d", type=int, default=64)
    args = p.parse_args()
    b, s, d = args.batch, args.seq_len, args.d

    # Deterministic inputs (~ test.cu:615-631: K = Q = iota pattern, V = 1).
    # The reference scales its iota by 1e-5 to keep scores finite; same here.
    qk = (jnp.arange(s * d, dtype=jnp.float32) * 1e-5).reshape(1, s, d)
    q = jnp.broadcast_to(qk, (b, s, d))
    k = q
    v = jnp.ones((b, s, d), jnp.float32)

    fn = lambda q, k, v: flash_attention(q, k, v, causal=True)
    t0 = time.perf_counter()
    out = jax.block_until_ready(jax.jit(fn)(q, k, v))
    compile_and_run = time.perf_counter() - t0
    ms = devtime_ms(fn, (q, k, v))

    # Self-check: V = ones => O = softmax(QK^T) @ ones = 1 exactly.
    max_dev = float(jnp.max(jnp.abs(out - 1.0)))
    flops = attention_flops(b, s, s, d, causal=True)
    print(f"first call (compile+run): {compile_and_run:.3f} s")
    print(f"Time: {ms / 1e3:.6f} s  ({flops / ms / 1e9:.1f} TFLOP/s)")
    print(f"max |out - 1.0| = {max_dev:.2e}")
    if max_dev > 1e-5:
        raise SystemExit("FAIL: output deviates from the analytic result")
    print("PASS")


if __name__ == "__main__":
    main()
