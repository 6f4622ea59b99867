"""Block-config sweep for the d=128 (Llama-7B-shape) prefill gap (round 3).

VERDICT r2 #1: the BH=128, d=128, S=2048 bf16 row runs at 139 TF/s (71% of
v5e peak) with no structural excuse.  Hypotheses probed here:

1. ``BlockSizes.fit`` ignores head_dim — the d=128 config space was never
   swept (scripts/tune_flash.py only sweeps d=64 shapes).
2. ``block_kv_compute == block_kv`` leaves one sub-tile per grid step, so
   QK^T (MXU) -> max/exp (VPU) -> PV (MXU) is a single serial dependency
   chain; bkc < bkv gives the VLIW scheduler independent chains from
   adjacent sub-tiles to overlap MXU and VPU work.

Run: python scripts/probe_d128.py [sweep|d64|causal]
"""

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flashattention_tpu.ops.flash import BlockSizes, flash_attention
from flashattention_tpu.utils.benchit import attention_flops, devtime_ms
from flashattention_tpu.utils.testing import make_random


def sweep(bh, s, d, dtype, causal=False, configs=None):
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (make_random(kk, (bh, s, d), dtype) for kk in ks)
    fl = attention_flops(bh, s, s, d, causal=causal)
    print(f"== BH={bh} d={d} S={s} {dtype.__name__} causal={causal} ==", flush=True)
    if configs is None:
        configs = [
            (bq, bkv, bkc)
            for bq, bkv, bkc in itertools.product(
                (256, 512, 1024), (512, 1024, 2048), (256, 512, 1024, 2048)
            )
            if bkc <= bkv and bkv % bkc == 0 and bq <= s and bkv <= s
        ]
    best = None
    for cfg in configs:
        bq, bkv, bkc = cfg[:3]
        bs = BlockSizes(bq, bkv, bkc, 1, cfg[3] if len(cfg) > 3 else 1)
        try:
            ms = devtime_ms(
                lambda q, k, v, bs=bs: flash_attention(
                    q, k, v, block_sizes=bs, causal=causal
                ),
                (q, k, v),
            )
        except Exception as e:
            print(f"  {bq:4}/{bkv:5}/{bkc:5}: FAIL {type(e).__name__}: {e}", flush=True)
            continue
        tag = ""
        if best is None or ms < best[0]:
            best = (ms, bs)
            tag = "  <-- best"
        print(
            f"  {bq:4}/{bkv:5}/{bkc:5}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s{tag}",
            flush=True,
        )
    if best is not None:
        print(f"  BEST: {best[1]} -> {best[0]:.3f} ms  {fl/best[0]/1e9:.1f} TF/s")


def pipeline_decomposition(BH=128, S=2048, BQ=512, variants=None):
    """Cost decomposition of the d=128 Llama-7B-shape step (round 3).

    The tuned kernel runs 1.92 ms (143 TF/s, 73% peak) at BH=128, S=2048,
    d=128, bq=512 with ONE kv block per q block.  Mini-kernels with the same
    grid/DMA shape isolate where the other 27% goes:

      skeleton  s = q@k^T; o += s@v          (MXU + DMA roofline, no VPU)
      exp       + p = exp(s - 5)             (exp cost alone)
      maxexp    + m = rowmax(s)              (+ cross-lane max reduce)
      full      + l = rowsum(p); o = pv/l    (one-shot softmax, no scratch)
      scratch   full online-softmax recurrence with VMEM scratch + alpha
                rescale (what the real kernel does even for 1 kv block)
      split2    two INDEPENDENT (m,l,acc) chains over kv halves merged at
                the end — no serial scratch dependency between sub-tiles
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = 128
    nq = S // BQ
    print(f"== pipeline decomposition BH={BH} S={S} d=128 bq={BQ} ==", flush=True)

    def build(variant):
        def kernel(q_ref, k_ref, v_ref, o_ref):
            q, k, v = q_ref[0], k_ref[0], v_ref[0]
            dims_nt = (((1,), (1,)), ((), ()))
            dims_nn = (((1,), (0,)), ((), ()))

            def chain(kk, vv):
                s = jax.lax.dot_general(
                    q, kk, dims_nt, preferred_element_type=jnp.float32
                )
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
                acc = jax.lax.dot_general(
                    p, vv, dims_nn, preferred_element_type=jnp.float32
                )
                return m, l, acc

            if variant == "split2":
                h = S // 2
                m0, l0, a0 = chain(k[:h], v[:h])
                m1, l1, a1 = chain(k[h:], v[h:])
                m = jnp.maximum(m0, m1)
                w0, w1 = jnp.exp(m0 - m), jnp.exp(m1 - m)
                l = w0 * l0 + w1 * l1
                o_ref[0] = ((w0 * a0 + w1 * a1) / l).astype(o_ref.dtype)
                return

            s = jax.lax.dot_general(
                q, k, dims_nt, preferred_element_type=jnp.float32
            )
            if variant == "skeleton":
                p = s
            elif variant == "exp":
                p = jnp.exp(s - 5.0)
            elif variant == "maxexp":
                p = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
            elif variant in ("full", "scratch"):
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
            pv = jax.lax.dot_general(
                p, v, dims_nn, preferred_element_type=jnp.float32
            )
            if variant == "full":
                l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
                pv = pv / jnp.where(l == 0.0, 1.0, l)
            o_ref[0] = pv.astype(o_ref.dtype)

        def kernel_scratch(q_ref, k_ref, v_ref, o_ref, m_sc, l_sc, acc_sc):
            # Mimic the real kernel's recurrence exactly (1 kv block).
            m_sc[...] = jnp.full_like(m_sc, -jnp.inf)
            acc_sc[...] = jnp.zeros_like(acc_sc)
            l_sc[...] = jnp.zeros_like(l_sc)
            q, k, v = q_ref[0], k_ref[0], v_ref[0]
            dims_nt = (((1,), (1,)), ((), ()))
            dims_nn = (((1,), (0,)), ((), ()))
            s = jax.lax.dot_general(
                q, k, dims_nt, preferred_element_type=jnp.float32
            )
            m_prev = m_sc[:, 0:1]
            m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            m_sc[...] = jnp.broadcast_to(m_next, m_sc.shape)
            pv = jax.lax.dot_general(
                p, v, dims_nn, preferred_element_type=jnp.float32
            )
            l_next = alpha * l_sc[:, 0:1] + jnp.sum(
                p, axis=1, keepdims=True, dtype=jnp.float32
            )
            l_sc[...] = jnp.broadcast_to(l_next, l_sc.shape)
            acc_sc[...] = acc_sc[...] * alpha + pv
            l = l_sc[:, 0:1]
            o_ref[0] = (
                acc_sc[...] * jnp.where(l == 0.0, 1.0, 1.0 / l)
            ).astype(o_ref.dtype)

        scratch = (
            [pltpu.VMEM((BQ, 128), jnp.float32)] * 2
            + [pltpu.VMEM((BQ, D), jnp.float32)]
            if variant == "scratch"
            else []
        )

        @jax.jit
        def fn(q, k, v):
            return pl.pallas_call(
                kernel_scratch if variant == "scratch" else kernel,
                grid=(BH, nq),
                in_specs=[
                    pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0)),
                    pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
                    pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0)),
                out_shape=jax.ShapeDtypeStruct((BH, S, D), jnp.float32),
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                    vmem_limit_bytes=96 * 1024 * 1024,
                ),
            )(q, k, v)

        return fn

    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (make_random(kk, (BH, S, D), jnp.bfloat16) for kk in ks)
    fl = attention_flops(BH, S, S, D)
    for variant in (variants or ("skeleton", "exp", "maxexp", "full", "scratch", "split2")):
        fn = build(variant)
        ms = devtime_ms(fn, (q, k, v))
        print(
            f"  {variant:9}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s", flush=True
        )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    if which == "sweep":
        sweep(128, 2048, 128, jnp.bfloat16)
    elif which == "d64":
        # The bf16 d=64 headline (VERDICT #3): does sub-tiling move it?
        sweep(
            16, 8192, 64, jnp.bfloat16,
            configs=[
                (512, 2048, 2048), (512, 2048, 1024), (512, 2048, 512),
                (1024, 2048, 2048), (1024, 2048, 1024),
                (512, 4096, 4096), (512, 4096, 2048), (512, 4096, 1024),
                (1024, 4096, 2048), (1024, 8192, 2048), (1024, 8192, 1024),
            ],
        )
    elif which == "causal":
        # Causal headline (VERDICT #2): tri grid + sub-stripe predication.
        sweep(
            16, 8192, 64, jnp.bfloat16, causal=True,
            configs=[
                (512, 1024, 1024), (512, 1024, 512), (512, 2048, 1024),
                (512, 2048, 512), (1024, 1024, 1024), (1024, 2048, 1024),
                (1024, 2048, 512), (256, 1024, 1024), (1024, 1024, 512),
                (512, 2048, 2048), (1024, 2048, 2048),
            ],
        )
    elif which == "pipeline":
        pipeline_decomposition()
    elif which == "s4096":
        # Round 5: the pipeline2 mini-kernels showed the d=128 ceiling rises
        # to ~173 TF/s when the KV step widens to 4096 — test whether the
        # REAL kernel harvests it at S=4096 (VMEM permitting).
        sweep(
            64, 4096, 128, jnp.bfloat16,
            configs=[
                (1024, 2048, 2048, 4), (512, 2048, 2048, 4),
                (1024, 4096, 4096, 4), (512, 4096, 4096, 4),
                (1024, 4096, 4096, 8), (1024, 4096, 2048, 4),
            ],
        )
    elif which == "pipeline2":
        # Round 5 (VERDICT r4 #8): confirm the ~154 TF/s d=128 shape ceiling
        # at a second shape (S=4096, BH=64) and a second block schedule —
        # the Llama-7B ceiling_frac claim rests on it transferring.
        pipeline_decomposition(64, 4096, 512, variants=("skeleton", "full"))
        pipeline_decomposition(64, 4096, 1024, variants=("skeleton", "full"))
        pipeline_decomposition(128, 2048, 1024, variants=("skeleton", "full"))
    else:
        raise SystemExit(f"unknown probe {which!r}")


if __name__ == "__main__":
    main()
