"""Round-4 probe 6: best FULL-softmax config at the d=128 Llama-7B shape.

probe_d128b-e localized the d=128 residual: v5e MXU throughput collapses on
thin operand shapes (XLA measured: M=128 -> 52 TF/s, N=128 -> 73-88,
K=128 -> ~168; the full-rate 196.5 needs M>=4096-class shapes).  Attention
at d=128 always has K=128 (QK) and N=128 (PV), so the shape ceiling for the
no-softmax skeleton measured ~154 TF/s (bq=1024), with the normal
orientation optimal (transposed schedule: both matmuls land on worse
shapes; measured loss).

This probe picks the best real-kernel config: full stateless softmax
(the one_shot path this shape takes) x {bq 512/1024} x {PV split 1/2}.

Run: python scripts/probe_d128f.py
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

BH, S, D = 128, 2048, 128
NT = (((1,), (1,)), ((), ()))
NN = (((1,), (0,)), ((), ()))


def build(bq, pv_split):
    nq = S // bq

    def kernel(q_ref, k_ref, v_ref, o_ref):
        q, k, v = q_ref[0], k_ref[0], v_ref[0]
        s = jax.lax.dot_general(q, k, NT, preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
        c = S // pv_split
        pv = sum(
            jax.lax.dot_general(
                p[:, i * c : (i + 1) * c], v[i * c : (i + 1) * c], NN,
                preferred_element_type=jnp.float32,
            )
            for i in range(pv_split)
        )
        o_ref[0] = (pv * jnp.where(l == 0.0, 1.0, 1.0 / l)).astype(o_ref.dtype)

    @jax.jit
    def fn(q, k, v):
        return pl.pallas_call(
            kernel,
            grid=(BH, nq),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((BH, S, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(q, k, v)

    return fn


def main():
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (make_random(kk, (BH, S, D), jnp.bfloat16) for kk in ks)
    fl = attention_flops(BH, S, S, D)
    for bq in (512, 1024, 2048):
        for pv_split in (1, 2, 4):
            try:
                ms = devtime_ms(build(bq, pv_split), (q, k, v))
            except Exception as e:  # noqa: BLE001
                print(f"  bq={bq:4} split={pv_split}: FAIL {e}", flush=True)
                continue
            print(
                f"  bq={bq:4} split={pv_split}: {ms:7.3f} ms  "
                f"{fl/ms/1e9:6.1f} TF/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
