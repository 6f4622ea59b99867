"""Empirical MXU/VPU cost model for flash-attention kernel design (v5e).

Answers the machine-model questions that VERDICT.md round-1 items #1/#2 hinge
on, with streaming Pallas kernels shaped like the flash pipeline (grid over
blocks, fp32 accumulator scratch, operands streamed from HBM via BlockSpec):

  1. QK^T-like pass cost vs contraction width K (32 / 64 / 128): does a K=64
     contraction cost the same as K=128 (output-bound model) or ~half (depth-
     proportional model)?  Decides whether "pack heads into lanes" can ever pay.
  2. PV-like pass cost vs output width N (32 / 64 / 128): cost of idle output
     lanes.
  3. VPU softmax overhead: exp / max+exp added to the QK pass, and whether it
     overlaps the MXU or serializes.
  4. fp32-vs-bf16 streaming operand cost for the PV matmul (the p = exp(...)
     output is fp32; does Mosaic charge for the implicit cast?).

Usage:  python scripts/probe_mxu.py [qk|pv|exp|pcast|all]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattention_tpu.utils.benchit import devtime_ms

BQ = 512
BKV = 2048


def _qk_like(K: int, G: int, post: str):
    """acc += post(Q @ B_i^T-ish): Q fixed (BQ, K), B streams (K, BKV) per step."""

    def kernel(q_ref, b_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        s = jnp.dot(q_ref[...], b_ref[...], preferred_element_type=jnp.float32)
        if post == "exp":
            s = jnp.exp(s - 5.0)
        elif post == "maxexp":
            m = jnp.max(s, axis=1, keepdims=True)
            s = jnp.exp(s - m)
        elif post == "maxexp2":
            # two-stage: per-vreg-column max (cheap elementwise) then one
            # cross-lane reduce over 128 lanes only
            m128 = jnp.max(s.reshape(BQ, -1, 128), axis=1)
            m = jnp.max(m128, axis=1, keepdims=True)
            s = jnp.exp(s - m)
        elif post == "sum":
            s = jnp.exp(s - 5.0)
            acc_ref[...] += s
            acc_ref[0:1, 0:1] += jnp.sum(s, axis=1, keepdims=True)[0:1]
            return
        elif post == "sum2":
            s = jnp.exp(s - 5.0)
            acc_ref[...] += s
            s128 = jnp.sum(s.reshape(BQ, -1, 128), axis=1)
            acc_ref[0:1, 0:1] += jnp.sum(s128, axis=1, keepdims=True)[0:1]
            return
        acc_ref[...] += s

    @jax.jit
    def fn(q, b):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((BQ, K), lambda i: (0, 0)),
                pl.BlockSpec((K, BKV), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((BQ, BKV), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((BQ, BKV), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(q, b)

    q = jnp.ones((BQ, K), jnp.bfloat16)
    b = jnp.ones((K, G * BKV), jnp.bfloat16) * 0.01
    # Perturb q from the chain input so devtime_ms iterations can't be deduped.
    def chained(x, b):
        return fn(q + x[0, 0].astype(jnp.bfloat16), b)[:8, :128]

    x0 = jnp.zeros((8, 128), jnp.float32)
    ms = devtime_ms(chained, (x0, b), n_hi=65)
    flops = 2 * BQ * BKV * K * G
    return ms, flops / (ms * 1e-3) / 1e12


def _pv_like(N: int, G: int, p_dtype):
    """acc += P_i @ V: P streams (BQ, BKV) per step, V fixed (BKV, N)."""

    def kernel(p_ref, v_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jnp.dot(
            p_ref[...], v_ref[...], preferred_element_type=jnp.float32
        )

    @jax.jit
    def fn(p, v):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((BQ, BKV), lambda i: (i, 0)),
                pl.BlockSpec((BKV, N), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((BQ, N), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((BQ, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(p, v)

    p = jnp.ones((G * BQ, BKV), p_dtype) * 0.01
    v = jnp.ones((BKV, N), jnp.bfloat16)

    def chained(x, p):
        return fn(p + x[0, 0].astype(p_dtype), v)[:8, :N]

    x0 = jnp.zeros((8, min(N, 128)), jnp.float32)
    ms = devtime_ms(chained, (x0, p), n_hi=65)
    flops = 2 * BQ * BKV * N * G
    return ms, flops / (ms * 1e-3) / 1e12


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    results = {}
    if which in ("qk", "all"):
        for K in (32, 64, 128):
            ms, tf = _qk_like(K, G=64, post="none")
            results[f"qk K={K}"] = (ms, tf)
            print(f"qk  K={K:<4} G=64  {ms:8.3f} ms  {tf:7.1f} TF/s", flush=True)
    if which in ("exp", "all"):
        for K in (64, 128):
            for post in ("exp", "maxexp"):
                ms, tf = _qk_like(K, G=64, post=post)
                results[f"qk K={K} {post}"] = (ms, tf)
                print(
                    f"qk  K={K:<4} G=64 +{post:<7} {ms:8.3f} ms  {tf:7.1f} TF/s",
                    flush=True,
                )
    if which in ("red", "all2"):
        for K in (64,):
            for post in ("exp", "maxexp", "maxexp2", "sum", "sum2"):
                ms, tf = _qk_like(K, G=64, post=post)
                results[f"qk K={K} {post}"] = (ms, tf)
                print(
                    f"qk  K={K:<4} G=64 +{post:<7} {ms:8.3f} ms  {tf:7.1f} TF/s",
                    flush=True,
                )
    if which in ("pv", "all"):
        for N in (32, 64, 128):
            ms, tf = _pv_like(N, G=32, p_dtype=jnp.bfloat16)
            results[f"pv N={N}"] = (ms, tf)
            print(f"pv  N={N:<4} G=32  {ms:8.3f} ms  {tf:7.1f} TF/s", flush=True)
    if which in ("pcast", "all"):
        ms, tf = _pv_like(128, G=32, p_dtype=jnp.float32)
        results["pv N=128 p=f32"] = (ms, tf)
        print(f"pv  N=128 G=32 p=f32 {ms:8.3f} ms  {tf:7.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
