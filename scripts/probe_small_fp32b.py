"""Round-5: small-shape fp32 (lane-packed) ceiling decomposition (VERDICT #3).

The round-4 sweep (measurements/probe_small_fp32.txt) found the winning
config for the reference's best-win shape (BH=128, S=1024, d=64, fp32):
bq=512 / block_h=8 / pv_split=4 -> 1.285 ms (26.7 TF/s logical).  This probe
does the D128_CEILING-style algebra: mini-kernels with the packed path's
EXACT machine matmuls (2-pass QK on [hi|lo] lanes + 2-pass PV fold, ones
lane) at the same grid/DMA geometry, adding softmax stages one at a time.

  skeleton   2-pass QK + 2-pass PV fold only   (MXU + DMA floor)
  exp        + p = exp(s - 5)                  (exp cost alone)
  full       + one-shot softmax (m, l, divide)
  bf16_skel  single-pass bf16 QK+PV at the same geometry (the native-MXU
             comparison point; packed should cost ~2x this MXU-side)

Machine work per head: QK 2 passes (512,128)@(128,1024), PV 2 passes
(512,1024)@(1024,129) -> nominal 34.4 GF logical, 68.7 GF bf16-machine.

Run: python scripts/probe_small_fp32b.py   (needs the real chip)
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

BH, S, D, BQ, BHF = 128, 1024, 64, 512, 8  # BHF heads folded per grid step
NQ = S // BQ


def pack2(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=-1)


def build(variant):
    dims_nt = (((1,), (1,)), ((), ()))
    dims_nn = (((1,), (0,)), ((), ()))
    packed = variant != "bf16_skel"

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for h in range(BHF):
            q, k, v = q_ref[h], k_ref[h], v_ref[h]
            if packed:
                k_swap = jnp.concatenate([k[:, D:], k[:, :D]], axis=1)
                s = jax.lax.dot_general(
                    q, k, dims_nt, preferred_element_type=jnp.float32
                ) + jax.lax.dot_general(
                    q, k_swap, dims_nt, preferred_element_type=jnp.float32
                )
            else:
                s = jax.lax.dot_general(
                    q, k, dims_nt, preferred_element_type=jnp.float32
                )
            if variant in ("skeleton", "bf16_skel"):
                p = s
            elif variant == "exp":
                p = jnp.exp(s - 5.0)
            else:  # full
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
            if packed:
                ph = p.astype(jnp.bfloat16)
                plo = (p - ph.astype(jnp.float32)).astype(jnp.bfloat16)
                out = jax.lax.dot_general(
                    ph, v, dims_nn, preferred_element_type=jnp.float32
                ) + jax.lax.dot_general(
                    plo, v, dims_nn, preferred_element_type=jnp.float32
                )
                acc = out[:, :D] + out[:, D : 2 * D]
                l = out[:, 2 * D : 2 * D + 1]
            else:
                out = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), v, dims_nn,
                    preferred_element_type=jnp.float32,
                )
                acc = out[:, :D]
                l = out[:, D : D + 1]
            if variant == "full":
                acc = acc / jnp.where(l == 0.0, 1.0, l)
            if packed:
                # devtime_ms chains the output through args[0] (the packed
                # q), so the out block mirrors its (BQ, 2d) width.
                o_ref[h] = jnp.concatenate([acc, acc], axis=-1)
            else:
                o_ref[h] = acc

    w = 2 * D + 1 if packed else D + 1

    @jax.jit
    def fn(q, k, v):
        return pl.pallas_call(
            kernel,
            interpret=bool(os.environ.get("FA_PROBE_INTERPRET")),
            grid=(BH // BHF, NQ),
            in_specs=[
                pl.BlockSpec((BHF, BQ, 2 * D if packed else D),
                             lambda b, i: (b, i, 0)),
                pl.BlockSpec((BHF, S, 2 * D if packed else D),
                             lambda b, i: (b, 0, 0)),
                pl.BlockSpec((BHF, S, w), lambda b, i: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (BHF, BQ, 2 * D if packed else D), lambda b, i: (b, i, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (BH, S, 2 * D if packed else D), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(q, k, v)

    return fn


def main():
    ks = jax.random.split(jax.random.key(0), 3)
    qf, kf, vf = (make_random(kk, (BH, S, D), jnp.float32) for kk in ks)
    fl = attention_flops(BH, S, S, D)
    print(f"== packed fp32 decomposition BH={BH} S={S} d={D} "
          f"bq={BQ} bh={BHF} ==", flush=True)
    for variant in ("skeleton", "exp", "full"):
        q, k = pack2(qf), pack2(kf)
        v = jnp.concatenate(
            [pack2(vf), jnp.ones((BH, S, 1), jnp.bfloat16)], axis=-1
        )
        ms = devtime_ms(build(variant), (q, k, v))
        print(f"  {variant:9}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s (logical)",
              flush=True)
    qb, kb = qf.astype(jnp.bfloat16), kf.astype(jnp.bfloat16)
    vb = jnp.concatenate(
        [vf.astype(jnp.bfloat16), jnp.ones((BH, S, 1), jnp.bfloat16)], axis=-1
    )
    ms = devtime_ms(build("bf16_skel"), (qb, kb, vb))
    print(f"  bf16_skel: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s (logical)",
          flush=True)


if __name__ == "__main__":
    main()
