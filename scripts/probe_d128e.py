"""Round-4 probe 5: is the d=128 PV penalty about min(M, N) = 128?

probe_d128d showed the transposed schedule (PV output N=512 but M=128)
LOSES — so the slow-shape predicate is not "N=128" alone.  This probe
finishes the decomposition:

  pallas t_qk_heavy   full s_t, o_t over only 128 kv rows -> s_t rate
  pallas t_pv_heavy   tiny s_t tiled up, full o_t         -> o_t (M=128) rate
  pallas pv_bf16out   normal skeleton, PV emits bf16      -> output-dtype test
  xla    M=128 wide   (128,2048)@(2048,4096)              -> XLA's M=128 rate
  xla    M=128 o_t    (128,2048)@(2048,512)
  xla    M=256        (256,2048)@(2048,4096)

If both M=128 and N=128 halve the rate, the v5e MXU needs BOTH output dims
>= 256 for full throughput, and attention at d=128 is structurally capped:
PV's output is (bq, d) or (d, bq) — one dim is always 128.  ceiling_frac
accounting then gets a measured shape ceiling, like the round-2 d=64
refutation.

Run: python scripts/probe_d128e.py
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

    def kernel(q_ref, k_ref, v_ref, o_ref):
        q, k, v = q_ref[0], k_ref[0], v_ref[0]
        if variant == "pv_bf16out":
            s = jax.lax.dot_general(q, k, NT, preferred_element_type=jnp.float32)
            p = jnp.exp(s - 5.0)
            o_ref[0] = jax.lax.dot_general(
                p, v, NN, preferred_element_type=jnp.bfloat16
            ).astype(o_ref.dtype)
            return
        # Transposed-schedule decomposition; v arrives (D, S).
        if variant == "t_qk_heavy":
            s_t = jax.lax.dot_general(k, q, NT, preferred_element_type=jnp.float32)
            o_t = jax.lax.dot_general(
                v[:, :128], s_t[:128], NN, preferred_element_type=jnp.float32
            )
        else:  # t_pv_heavy: 1/16 of the s_t work, tiled to full height
            s_small = jax.lax.dot_general(
                k[:128], q, NT, preferred_element_type=jnp.float32
            )
            s_t = jnp.tile(s_small, (S // 128, 1))
            o_t = jax.lax.dot_general(v, s_t, NN, preferred_element_type=jnp.float32)
        o_ref[0] = o_t.astype(o_ref.dtype)

    bf16out = variant == "pv_bf16out"

    @jax.jit
    def fn(q, k, v):
        return pl.pallas_call(
            kernel,
            grid=(BH, nq),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
                pl.BlockSpec(
                    (1, S, D) if bf16out else (1, D, S), lambda b, i: (b, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, BQ, D) if bf16out else (1, D, BQ),
                (lambda b, i: (b, i, 0)) if bf16out else (lambda b, i: (b, 0, i)),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (BH, S, D) if bf16out else (BH, D, S),
                jnp.float32,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(q, k, v)

    return fn


def xla_m(name, sa, sb):
    k1, k2 = jax.random.split(jax.random.key(3))
    a = make_random(k1, sa, jnp.bfloat16)
    b = make_random(k2, sb, jnp.bfloat16)
    fl = 2 * sa[0] * sa[1] * sb[1]

    @jax.jit
    def fn(a, b):
        out = jax.lax.dot_general(a, b, NN, preferred_element_type=jnp.float32)
        if out.shape[1] >= a.shape[1]:
            out = out.reshape(a.shape[0], -1, a.shape[1]).sum(1)
        else:
            out = jnp.tile(out, (1, a.shape[1] // out.shape[1]))
        return out.astype(a.dtype)

    ms = devtime_ms(fn, (a, b))
    print(f"  xla {name}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s", flush=True)


def main():
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (make_random(kk, (BH, S, D), jnp.bfloat16) for kk in ks)
    vt = jnp.swapaxes(v, 1, 2).copy()
    fl = attention_flops(BH, S, S, D)
    for variant in ("t_qk_heavy", "t_pv_heavy", "pv_bf16out"):
        args = (q, k, v if variant == "pv_bf16out" else vt)
        try:
            ms = devtime_ms(build(variant), args)
        except Exception as e:  # noqa: BLE001
            print(f"  {variant:11}: FAIL {type(e).__name__}: {e}", flush=True)
            continue
        print(f"  {variant:11}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s", flush=True)
    xla_m("M=128 (128,2048)@(2048,4096)", (128, 2048), (2048, 4096))
    xla_m("M=128 (128,2048)@(2048,512) ", (128, 2048), (2048, 512))
    xla_m("M=256 (256,2048)@(2048,4096)", (256, 2048), (2048, 4096))
    xla_m("M=512 (512,2048)@(2048,4096)", (512, 2048), (2048, 4096))


if __name__ == "__main__":
    main()
