"""Round-4 probe 3: the PV matmul half-rate at d=128.

probe_d128b measured (v5e, BH=128 S=2048 D=128 bf16): QK^T (nt-form, 64
independent output tiles) runs ~152 TF/s but PV (nn-form, 4 output tiles,
16-chunk accumulation) runs ~98.6 TF/s — half the MXU nameplate.  Two
candidate causes, each with a distinct fix:

  (a) nn-form contraction (p lanes x v SUBLANES) makes Mosaic transpose V
      tiles on the fly -> fix: stream V transposed (BH, D, S) and use the
      nt-form like QK^T does.
  (b) one 128-lane output tile accumulated over 16 serial chunks stalls the
      systolic pipeline -> fix: split PV into independent partial sums.

Variants (full QK + full PV unless noted; all write fp32 like probe_d128):

  base        nn-form PV (probe_d128b skeleton)
  pv_split2/4 PV as 2/4 independent partial dots + VPU adds
  vt          V streamed transposed (BH, D, S); PV via nt-form
  vt_split2   both
  qk_nn       QK^T via k streamed transposed (BH, D, S) in nn-form — the
              mirror experiment: if nn is the poison, QK should DROP to half
  ones        PV against an all-ones V — rules out data-dependent clocking

Run: python scripts/probe_d128c.py
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
NT = (((1,), (1,)), ((), ()))  # contract lanes x lanes
NN = (((1,), (0,)), ((), ()))  # contract lanes x sublanes


def build(variant):
    nq = S // BQ
    v_transposed = variant.startswith("vt")

    def kernel(q_ref, k_ref, v_ref, o_ref):
        q, k, v = q_ref[0], k_ref[0], v_ref[0]
        if variant == "qk_nn":
            # k arrives transposed (D, S); contraction over q lanes x k_t
            # sublanes = the nn form, mirroring PV's shape exactly.
            s = jax.lax.dot_general(q, k, NN, preferred_element_type=jnp.float32)
        else:
            s = jax.lax.dot_general(q, k, NT, preferred_element_type=jnp.float32)
        p = s
        if variant == "ones":
            v = jnp.ones_like(v)
        if v_transposed:
            halves = 2 if variant == "vt_split2" else 1
            c = S // halves
            pv = sum(
                jax.lax.dot_general(
                    p[:, i * c : (i + 1) * c],
                    v[:, i * c : (i + 1) * c],
                    NT,
                    preferred_element_type=jnp.float32,
                )
                for i in range(halves)
            )
        elif variant in ("pv_split2", "pv_split4"):
            halves = int(variant[-1])
            c = S // halves
            pv = sum(
                jax.lax.dot_general(
                    p[:, i * c : (i + 1) * c],
                    v[i * c : (i + 1) * c],
                    NN,
                    preferred_element_type=jnp.float32,
                )
                for i in range(halves)
            )
        else:
            pv = jax.lax.dot_general(p, v, NN, preferred_element_type=jnp.float32)
        o_ref[0] = pv.astype(o_ref.dtype)

    kt = variant == "qk_nn"

    @jax.jit
    def fn(q, k, v):
        return pl.pallas_call(
            kernel,
            grid=(BH, nq),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, D, S) if kt else (1, S, D), lambda b, i: (b, 0, 0)),
                pl.BlockSpec(
                    (1, D, S) if v_transposed else (1, S, D), lambda b, i: (b, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0)),
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
    kt = jnp.swapaxes(k, 1, 2).copy()
    vt = jnp.swapaxes(v, 1, 2).copy()
    fl = attention_flops(BH, S, S, D)
    for variant in ("base", "pv_split2", "pv_split4", "vt", "vt_split2",
                    "qk_nn", "ones"):
        args = (
            q,
            kt if variant == "qk_nn" else k,
            vt if variant.startswith("vt") else v,
        )
        try:
            ms = devtime_ms(build(variant), args)
        except Exception as e:  # noqa: BLE001
            print(f"  {variant:10}: FAIL {type(e).__name__}: {e}", flush=True)
            continue
        print(f"  {variant:10}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
