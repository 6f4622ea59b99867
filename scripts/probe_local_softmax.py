"""Round-5: local-softmax (dependency-shortened) recurrence probe.

probe_causal_r5.txt priced the per-recurrence-update cost at ~9 us; the
chain-split fix (probe_chain.py) failed because pl.when-predicated state
selection serializes.  This tests a branch-free restructuring: exponentiate
against the LOCAL block max (independent of carried state), then fold the
correction scalar into the accumulator update:

    standard:  m_next = max(m_prev, rowmax(s)); p = exp(s - m_next)
               acc = acc * exp(m_prev - m_next) + p @ v
    local:     m_curr = rowmax(s);  p = exp(s - m_curr)     <- NO m_prev dep
               m_next = max(m_prev, m_curr)
               acc = acc * exp(m_prev - m_next)
                   + exp(m_curr - m_next) * (p @ v)         <- row-scalar mult

The 134M-element exp (and the QK/PV matmuls feeding/consuming it) leaves
the cross-step critical path; only the per-row rescals remain serial.
Cost: one extra (bq, d) row-scalar multiply per step.  If the 9 us/step is
dependency stall, `local` recovers it; if it is Mosaic per-step latency,
both variants time the same.

Run: python scripts/probe_local_softmax.py   (needs the real chip)
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

BH, S, D = 16, 8192, 64


def build(variant, bq, bkv):
    nq, nkv = S // bq, S // bkv
    dims_nt = (((1,), (1,)), ((), ()))
    dims_nn = (((1,), (0,)), ((), ()))

    def kernel(q_ref, k_ref, v_ref, o_ref, m_sc, l_sc, acc_sc):
        kv_idx = pl.program_id(2)

        @pl.when(kv_idx == 0)
        def _init():
            m_sc[...] = jnp.full_like(m_sc, -jnp.inf)
            l_sc[...] = jnp.zeros_like(l_sc)
            acc_sc[...] = jnp.zeros_like(acc_sc)

        q, k, v = q_ref[0], k_ref[0], v_ref[0]
        s = jax.lax.dot_general(
            q, k, dims_nt, preferred_element_type=jnp.float32
        )
        if variant == "standard":
            m_prev = m_sc[:, 0:1]
            m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v, dims_nn,
                preferred_element_type=jnp.float32,
            )
            l_next = alpha * l_sc[:, 0:1] + jnp.sum(
                p, axis=1, keepdims=True, dtype=jnp.float32
            )
            m_sc[...] = jnp.broadcast_to(m_next, m_sc.shape)
            l_sc[...] = jnp.broadcast_to(l_next, l_sc.shape)
            acc_sc[...] = acc_sc[...] * alpha + pv
        else:  # local
            m_curr = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m_curr)          # no dependency on carried state
            l_curr = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v, dims_nn,
                preferred_element_type=jnp.float32,
            )
            m_prev = m_sc[:, 0:1]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            beta = jnp.exp(m_curr - m_next)
            l_next = alpha * l_sc[:, 0:1] + beta * l_curr
            m_sc[...] = jnp.broadcast_to(m_next, m_sc.shape)
            l_sc[...] = jnp.broadcast_to(l_next, l_sc.shape)
            acc_sc[...] = acc_sc[...] * alpha + beta * pv

        @pl.when(kv_idx == nkv - 1)
        def _epilogue():
            l = l_sc[:, 0:1]
            o_ref[0] = (
                acc_sc[...] / jnp.where(l == 0.0, 1.0, l)
            ).astype(o_ref.dtype)

    @jax.jit
    def fn(q, k, v):
        return pl.pallas_call(
            kernel,
            interpret=bool(os.environ.get("FA_PROBE_INTERPRET")),
            grid=(BH, nq, nkv),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, bkv, D), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, bkv, D), lambda b, i, j: (b, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((BH, S, D), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(q, k, v)

    return fn


def main():
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (make_random(kk, (BH, S, D), jnp.bfloat16) for kk in ks)
    fl = attention_flops(BH, S, S, D)
    ref = None
    for variant, bq, bkv in (
        ("standard", 1024, 1024),
        ("local", 1024, 1024),
        ("standard", 1024, 2048),
        ("local", 1024, 2048),
    ):
        fn = build(variant, bq, bkv)
        out = fn(q, k, v)
        if ref is None:
            ref = out.astype(jnp.float32)
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        ms = devtime_ms(fn, (q, k, v))
        print(
            f"  {variant:8s} bq{bq} bkv{bkv}: {ms:7.3f} ms  "
            f"{fl/ms/1e9:6.1f} TF/s  err={err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
