"""Round-4 follow-up to probe_d128 pipeline_decomposition.

Round-4 measured context (v5e, BH=128 S=2048 D=128 bf16, measurements/
probe_d128_pipeline.txt): the NO-SOFTMAX skeleton runs 1.840 ms (149.3 TF/s,
76% of peak) and the real kernel 1.92 ms — so the d=128 gap lives in the
matmul pipeline itself, not the online softmax.  This probe isolates WHERE:

  skeleton      baseline from probe_d128 (s fp32 into PV)
  pcast         p cast to bf16 before PV — if Mosaic runs the fp32-LHS PV as
                a multi-pass matmul, this alone recovers the gap
  qk_heavy      full QK^T, PV contracts only 128 kv rows → isolates QK pass
  pv_heavy      QK over only 128 kv rows (tiled up), full PV → isolates PV
  bq{256,1024,2048}  block_q sensitivity at fixed whole-S KV block
  bh2           two heads per grid step (block (2, BQ, D) DMAs)

Each variant repeats the same grid/DMA shape as the tuned kernel at the
Llama-7B shape; outputs are fp32 like probe_d128's so rows are comparable.

Run: python scripts/probe_d128b.py
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


def build(variant, bq=512, bh_blk=1):
    nq = S // bq
    dims_nt = (((1,), (1,)), ((), ()))
    dims_nn = (((1,), (0,)), ((), ()))

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for h in range(bh_blk):
            q, k, v = q_ref[h], k_ref[h], v_ref[h]
            if variant == "pv_heavy":
                # 1/16th of QK work: contract only the first 128 kv rows,
                # then tile the (bq, 128) tile up to the full score width so
                # PV still contracts all of S.
                s_small = jax.lax.dot_general(
                    q, k[:128], dims_nt, preferred_element_type=jnp.float32
                )
                s = jnp.tile(s_small, (1, S // 128))
            else:
                s = jax.lax.dot_general(
                    q, k, dims_nt, preferred_element_type=jnp.float32
                )
            p = s.astype(jnp.bfloat16) if variant == "pcast" else s
            if variant == "qk_heavy":
                # 1/16th of PV work: contract only the first 128 kv rows.
                pv = jax.lax.dot_general(
                    p[:, :128], v[:128], dims_nn,
                    preferred_element_type=jnp.float32,
                )
            else:
                pv = jax.lax.dot_general(
                    p, v, dims_nn, preferred_element_type=jnp.float32
                )
            o_ref[h] = pv.astype(o_ref.dtype)

    @jax.jit
    def fn(q, k, v):
        return pl.pallas_call(
            kernel,
            grid=(BH // bh_blk, nq),
            in_specs=[
                pl.BlockSpec((bh_blk, bq, D), lambda b, i: (b, i, 0)),
                pl.BlockSpec((bh_blk, S, D), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((bh_blk, S, D), lambda b, i: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((bh_blk, bq, D), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((BH, S, D), jnp.float32),
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
    rows = [
        ("skeleton", dict()),
        ("skeleton2", dict()),  # repeat: measurement variance
        ("pcast", dict()),
        ("qk_heavy", dict()),
        ("pv_heavy", dict()),
        ("bq256", dict(bq=256)),
        ("bq1024", dict(bq=1024)),
        ("bq2048", dict(bq=2048)),
        ("bh2", dict(bh_blk=2)),
        ("pcast_bq1024", dict(bq=1024)),
        ("pcast_bh2", dict(bh_blk=2)),
    ]
    for name, kw in rows:
        variant = (
            "pcast" if name.startswith("pcast")
            else name if name in ("qk_heavy", "pv_heavy")
            else "skeleton"
        )
        try:
            fn = build(variant, **kw)
            ms = devtime_ms(fn, (q, k, v))
        except Exception as e:  # noqa: BLE001 — sweep must survive bad configs
            print(f"  {name:13}: FAIL {type(e).__name__}: {e}", flush=True)
            continue
        print(f"  {name:13}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
