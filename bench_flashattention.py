#!/usr/bin/env python
"""Benchmark + correctness harness vs the XLA eager reference.

TPU-native equivalent of the reference's primary entry point
(``/root/reference/bench_flashattention.py``), same flags (--batch_size,
--seq_len, --masking) and same contract: build (B*H, S, d) inputs with heads
folded into batch (``:31-33``), run the eager reference and the fused kernel,
time both, gate with allclose at atol=1e-1 (``:74-79``).  Kept quirks:
n_head=8 and d=64 fixed by default (``:22-24``), and scale omitted (=1.0) on
both sides (``:37,44``) — override with --scale/--d/--n_head.

Differences (consciously): device timing uses a chained-loop slope (per-call
wall clock is meaningless through remote-dispatch TPU tunnels), and results
print as structured JSON rows with TFLOP/s and roofline fraction.
"""

import argparse
import json

import jax
import jax.numpy as jnp

from flashattention_tpu.ops.dispatch import attention
from flashattention_tpu.ops.reference import attention_reference
from flashattention_tpu.utils.benchit import attention_flops, chip_peak, devtime_ms
from flashattention_tpu.utils.testing import make_random


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seq_len", type=int, default=1024)
    # NB: the reference's argparse bool quirk (any non-empty string is truthy)
    # is fixed here with a proper store_true flag.
    p.add_argument("--masking", action="store_true", help="causal masking")
    p.add_argument("--n_head", type=int, default=8)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument("--scale", type=float, default=1.0,
                   help="score scale; reference parity is 1.0 (no 1/sqrt(d))")
    p.add_argument("--repeats", type=int, default=9)
    p.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a jax.profiler trace (xprof/TensorBoard) of the kernel "
        "into DIR (~ the reference's torch.autograd.profiler tables, "
        "bench_flashattention.py:61-72)",
    )
    args = p.parse_args()

    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    bh = args.batch_size * args.n_head
    shape = (bh, args.seq_len, args.d)
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (make_random(kk, shape, dtype) for kk in ks)

    def ours(q, k, v):
        return attention(q, k, v, causal=args.masking, scale=args.scale)

    def ref(q, k, v):
        return attention_reference(q, k, v, causal=args.masking, scale=args.scale)

    out = jax.jit(ours)(q, k, v)
    want = jax.jit(ref)(q, k, v)
    ok = bool(
        jnp.allclose(
            out.astype(jnp.float32), want.astype(jnp.float32), rtol=0, atol=1e-1
        )
    )
    max_err = float(
        jnp.max(jnp.abs(out.astype(jnp.float32) - want.astype(jnp.float32)))
    )

    flops = attention_flops(bh, args.seq_len, args.seq_len, args.d, causal=args.masking)
    if args.profile:
        with jax.profiler.trace(args.profile):
            jax.block_until_ready(jax.jit(ours)(q, k, v))
        print(json.dumps({"profile_dir": args.profile}))
    ms_ours = devtime_ms(ours, (q, k, v), n_hi=args.repeats, trials=3)
    ms_ref = devtime_ms(ref, (q, k, v), n_hi=args.repeats, trials=3)
    peak = chip_peak(16 if dtype == jnp.bfloat16 else 32)

    for name, ms in (("xla_reference", ms_ref), ("flash_tpu", ms_ours)):
        row = {
            "impl": name,
            "batch_size": args.batch_size,
            "n_head": args.n_head,
            "seq_len": args.seq_len,
            "d": args.d,
            "dtype": args.dtype,
            "causal": args.masking,
            "ms": round(ms, 3),
            "tflops_per_s": round(flops / ms / 1e9, 2),
        }
        if peak:
            row["roofline_frac"] = round(flops / ms / 1e9 / peak[0], 3)
        print(json.dumps(row))
    print(
        json.dumps(
            {
                "speedup_vs_reference": round(ms_ref / ms_ours, 2),
                "max_abs_err": max_err,
                "allclose_atol_1e-1": ok,
            }
        )
    )
    if not ok:
        print("attention output incorrect (atol=1e-1 gate)")
        raise SystemExit(1)
    print("attention output correct")


if __name__ == "__main__":
    main()
