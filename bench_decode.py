#!/usr/bin/env python
"""Decode-attention benchmark: tokens/s over a paged KV cache.

The serving-side benchmark of the BASELINE.json north star ("decode tokens/s
with FP8 KV-cache"); the reference has no decode path to compare against
(SURVEY.md section 0), so the baseline here is the chip's HBM roofline —
decode attention is bandwidth-bound, and the metric that matters is the
fraction of peak HBM bandwidth the kernel sustains while streaming the KV
cache (v5e: ~98% in bf16 with head-major 128-token pages).

Prints one JSON row per KV dtype: step latency, decode tokens/s for the
batch, KV bytes moved, and HBM bandwidth utilization.
"""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from flashattention_tpu.ops.decode import paged_attention, paged_attention_reference
from flashattention_tpu.ops.quant import quantize
from flashattention_tpu.utils.benchit import chip_peak, devtime_ms
from flashattention_tpu.utils.testing import make_random

KV_DTYPES = ("bfloat16", "float32", "int8", "fp8")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--kv_heads", type=int, default=8)
    p.add_argument("--group", type=int, default=4, help="q heads per KV head (GQA)")
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--seq_len", type=int, default=2048, help="context length")
    p.add_argument("--page_size", type=int, default=256)
    p.add_argument(
        "--kv_dtypes", default="bfloat16,int8,fp8", help="comma list to sweep"
    )
    args = p.parse_args()

    b, kvh, g, d, s, ps = (
        args.batch, args.kv_heads, args.group, args.d, args.seq_len, args.page_size,
    )
    pps = s // ps
    total_pages = b * pps + 8
    ks = jax.random.split(jax.random.key(0), 4)
    q = make_random(ks[0], (b, kvh, g, d), jnp.float32)
    kf = make_random(ks[1], (total_pages, kvh, ps, d), jnp.float32)
    vf = make_random(ks[2], (total_pages, kvh, ps, d), jnp.float32)
    lengths = jnp.full((b,), s, jnp.int32)
    page_indices = jnp.asarray(
        np.arange(b * pps, dtype=np.int32).reshape(b, pps)
    )
    want = paged_attention_reference(q, kf, vf, lengths, page_indices)
    peak = chip_peak(16)

    for name in args.kv_dtypes.split(","):
        if name not in KV_DTYPES:
            raise SystemExit(f"unknown kv dtype {name!r}; choose from {KV_DTYPES}")
        if name in ("bfloat16", "float32"):
            dt = jnp.bfloat16 if name == "bfloat16" else jnp.float32
            kp, vp = kf.astype(dt), vf.astype(dt)
            extra = {}
            kv_bytes = 2 * b * kvh * s * d * kp.dtype.itemsize
            tol = 2e-2 if name == "bfloat16" else 1e-4
        else:
            kq, vq = quantize(kf, name), quantize(vf, name)
            kp, vp = kq.payload, vq.payload
            extra = dict(k_scales_pages=kq.scales, v_scales_pages=vq.scales)
            kv_bytes = 2 * b * kvh * s * (d * 1 + 4)  # payload + f32 scale
            tol = 5e-2 if name == "int8" else 2e-1  # e4m3: 3 mantissa bits

        fn = lambda q: paged_attention(
            q, kp, vp, lengths, page_indices, **extra
        )
        err = float(
            jnp.max(jnp.abs(jax.jit(fn)(q).astype(jnp.float32) - want))
        )
        ms = devtime_ms(fn, (q,), n_hi=257)
        gbps = kv_bytes / (ms * 1e-3) / 1e9
        row = {
            "kv_dtype": name,
            "batch": b,
            "kv_heads": kvh,
            "q_heads": kvh * g,
            "d": d,
            "seq_len": s,
            "page_size": ps,
            "step_ms": round(ms, 4),
            "decode_tokens_per_s": round(b / ms * 1e3),
            "kv_gb_per_s": round(gbps, 1),
            "max_abs_err": err,
            "valid": err <= tol,
        }
        if peak:
            row["hbm_frac"] = round(gbps / peak[1], 3)
        print(json.dumps(row))
        if err > tol:
            raise SystemExit(f"{name}: err {err} > tol {tol}")


if __name__ == "__main__":
    main()
