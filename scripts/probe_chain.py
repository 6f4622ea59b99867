"""Round-5: cross-step softmax-chain dependency probe (causal task #1 root).

probe_causal_r5.txt algebra: with bq=1024 fixed, a bkv=1024 grid step costs
56.75 us (1 pair-unit) and a bkv=2048 step 104.4 us (2 units) -> solving
step = work*units + fixed gives work = 47.6 us/unit, fixed = 9.1 us/step.
9.1 us is ~750 KB of DMA or ~2 MFLOP of VPU — far beyond what a step's
bookkeeping plausibly costs, so the suspect is the SERIAL dependency: each
step's (m, l, acc) rescale reads the previous step's state, so the pipeline
cannot overlap consecutive steps' VPU phases.

Test: same grid/DMA, online-softmax recurrence with
  1chain   the production recurrence (state_{j} <- state_{j-1})
  2chain   alternating steps update INDEPENDENT states (state A on even kv
           steps, B on odd), merged once at the epilogue -> dependency
           distance 2, consecutive steps free to overlap
  4chain   distance 4
If 2chain recovers most of the 9.1 us/step, the production kernel gets a
chains knob; if it moves nothing, the fixed cost is Mosaic per-step latency
and the causal 1.9 ms target gets a measured refutation instead.

Run: python scripts/probe_chain.py   (needs the real chip)
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


def build(chains, bq, bkv):
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

        def update(c):
            m_prev = m_sc[c, :, 0:1]
            m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            m_sc[c] = jnp.broadcast_to(m_next, m_sc.shape[1:])
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v, dims_nn,
                preferred_element_type=jnp.float32,
            )
            l_next = alpha * l_sc[c, :, 0:1] + jnp.sum(
                p, axis=1, keepdims=True, dtype=jnp.float32
            )
            l_sc[c] = jnp.broadcast_to(l_next, l_sc.shape[1:])
            acc_sc[c] = acc_sc[c] * alpha + pv

        if chains == 1:
            update(0)
        else:
            for c in range(chains):
                @pl.when(kv_idx % chains == c)
                def _u(c=c):
                    update(c)

        @pl.when(kv_idx == nkv - 1)
        def _epilogue():
            m = m_sc[0, :, 0:1]
            for c in range(1, chains):
                m = jnp.maximum(m, m_sc[c, :, 0:1])
            l = jnp.zeros_like(l_sc[0, :, 0:1])
            acc = jnp.zeros_like(acc_sc[0])
            for c in range(chains):
                w = jnp.exp(m_sc[c, :, 0:1] - m)
                l = l + w * l_sc[c, :, 0:1]
                acc = acc + w * acc_sc[c]
            o_ref[0] = (acc / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)

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
                pltpu.VMEM((chains, bq, 128), jnp.float32),
                pltpu.VMEM((chains, bq, 128), jnp.float32),
                pltpu.VMEM((chains, bq, D), jnp.float32),
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
    for chains, bq, bkv in (
        (1, 1024, 1024),
        (2, 1024, 1024),
        (4, 1024, 1024),
        (1, 1024, 2048),
        (2, 1024, 2048),
    ):
        fn = build(chains, bq, bkv)
        out = fn(q, k, v)
        if ref is None:
            ref = out.astype(jnp.float32)
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        ms = devtime_ms(fn, (q, k, v))
        print(
            f"  {chains}chain bq{bq} bkv{bkv}: {ms:7.3f} ms  "
            f"{fl/ms/1e9:6.1f} TF/s  err={err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
