"""Round-4 probe 4: the TRANSPOSED schedule for d=128.

probe_peak2 isolated the structural cause of the d=128 gap: on v5e, a matmul
whose OUTPUT is only 128 lanes wide runs at ~half rate even under XLA
(N=128: 73-88 TF/s; N=256: 162; wide: 190+).  Attention's PV matmul has
output width d — at d=128 it is pinned to the slow shape, which matches the
in-kernel measurement (PV ~98.6 TF/s vs QK ~152).

The transposed schedule flips both matmuls into wide-output shapes:

    s_t (bkv, bq) = K (bkv, d) @ Q^T          N = bq  = 512   full rate
    softmax along axis 0 (sublanes)
    o_t (d, bq)   = V^T (d, bkv) @ p_t        N = bq  = 512   full rate,
                                              K = bkv = 2048  deep

Variants:
  base        current orientation (skeleton from probe_d128b)
  t_vt        transposed schedule, V pre-transposed in HBM (BH, d, S)
  t_vtk       transposed schedule + in-kernel V-tile transpose (V normal)
  t_full      t_vt + l row-sum + divide (full stateless softmax)
  t_o_norm    t_vt but output written back in NORMAL orientation via an
              in-kernel o_t transpose (512x128 fp32 per step)

Run: python scripts/probe_d128d.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattention_tpu.utils.benchit import attention_flops, devtime_ms
from flashattention_tpu.utils.testing import make_random

BH, S, D, BQ = 128, 2048, 128, 512
NT = (((1,), (1,)), ((), ()))
NN = (((1,), (0,)), ((), ()))


def build(variant):
    nq = S // BQ
    vt_in = variant in ("t_vt", "t_full", "t_o_norm")
    o_norm = variant in ("base", "t_o_norm")

    def kernel(q_ref, k_ref, v_ref, o_ref):
        q, k, v = q_ref[0], k_ref[0], v_ref[0]
        if variant == "base":
            s = jax.lax.dot_general(q, k, NT, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            o_ref[0] = jax.lax.dot_general(
                p, v, NN, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)
            return
        # Transposed schedule.
        s_t = jax.lax.dot_general(k, q, NT, preferred_element_type=jnp.float32)
        m = jnp.max(s_t, axis=0, keepdims=True)  # (1, bq): per-QUERY stats
        p_t = jnp.exp(s_t - m)
        v_t = v if vt_in else v.T
        o_t = jax.lax.dot_general(
            v_t, p_t, NN, preferred_element_type=jnp.float32
        )  # (d, bq)
        if variant == "t_full":
            l = jnp.sum(p_t, axis=0, keepdims=True, dtype=jnp.float32)
            o_t = o_t * jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (o_t.T if o_norm else o_t).astype(o_ref.dtype)

    @jax.jit
    def fn(q, k, v):
        return pl.pallas_call(
            kernel,
            grid=(BH, nq),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
                pl.BlockSpec(
                    (1, D, S) if vt_in else (1, S, D), lambda b, i: (b, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, BQ, D) if o_norm else (1, D, BQ),
                (lambda b, i: (b, i, 0)) if o_norm else (lambda b, i: (b, 0, i)),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (BH, S, D) if o_norm else (BH, D, S), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(q, k, v)

    return fn


def main():
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (make_random(kk, (BH, S, D), jnp.bfloat16) for kk in ks)
    vt = jnp.swapaxes(v, 1, 2).copy()
    fl = attention_flops(BH, S, S, D)
    # Correctness cross-check of the transposed math (tiny shape, interpret).
    for variant in ("base", "t_vt", "t_vtk", "t_full", "t_o_norm"):
        args = (q, k, vt if variant in ("t_vt", "t_full", "t_o_norm") else v)
        try:
            ms = devtime_ms(build(variant), args)
        except Exception as e:  # noqa: BLE001
            print(f"  {variant:9}: FAIL {type(e).__name__}: {e}", flush=True)
            continue
        print(f"  {variant:9}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
