"""Training-step throughput benchmark (single chip).

The reference is forward-only; training is framework scope (SURVEY.md §0).
This measures the end-to-end sharded training step — fused flash forward +
custom-VJP backward + SGD update — on a Llama-7B-geometry 2-layer slice:
tokens/s, model TFLOP/s, and MFU against the v5e bf16 peak.

FLOP accounting (standard 6ND + attention): per step,
``6 * N_matmul * tokens`` for the parameter matmuls (fwd 2ND + bwd 4ND)
plus ``3.5 * L * attn_fwd`` for attention (the two-pass backward re-does
the forward's two matmuls and adds three more: ~2.5x fwd).

Timing: params-fed-back chained loop under one jit (each iteration's
updated params drive the next — no dedup/overlap), scalar readback, and a
two-point slope, same methodology as utils.benchit.devtime_ms (per-call
wall clock is meaningless through the TPU tunnel).
"""

import dataclasses
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashattention_tpu.models import transformer
from flashattention_tpu.models.train import make_train_step, shard_params
from flashattention_tpu.utils.benchit import attention_flops

V5E_BF16_PEAK = 197.0  # TF/s


def step_time_ms(step, params, tokens, n_lo=1, n_hi=9, trials=5):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(params, tokens, n):
        def body(_, p):
            _, p2 = step(p, tokens)
            return p2

        p = jax.lax.fori_loop(0, n, body, params)
        return jnp.sum(p["final_norm"].astype(jnp.float32))

    def run(n):
        return float(loop(params, tokens, n))

    run(n_lo), run(n_hi)  # compile
    t_lo, t_hi = [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        run(n_lo)
        t_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(n_hi)
        t_hi.append(time.perf_counter() - t0)
    window = min(t_hi) - min(t_lo)
    if window <= 0:
        raise RuntimeError("non-positive timing window; raise n_hi")
    return window / (n_hi - n_lo) * 1e3


def matmul_params(cfg):
    """Matmul-participating parameter count (embed lookup excluded,
    lm_head included — the 6ND convention)."""
    per_layer = (
        cfg.d_model * cfg.num_q_heads * cfg.head_dim  # wq
        + 2 * cfg.d_model * cfg.num_kv_heads * cfg.head_dim  # wk, wv
        + cfg.num_q_heads * cfg.head_dim * cfg.d_model  # wo
        + 3 * cfg.d_model * cfg.intermediate  # gate, up, down
    )
    return cfg.num_layers * per_layer + cfg.d_model * cfg.vocab_size


def main():
    smoke = "--smoke" in sys.argv  # CPU-runnable logic check, tiny shapes
    cfg = transformer.ModelConfig.mistral7b(num_layers=2)
    cfg = dataclasses.replace(cfg, dtype="bfloat16", sliding_window=None)
    b, s = 8, 2048
    if smoke:
        cfg = dataclasses.replace(
            cfg, vocab_size=128, d_model=64, num_q_heads=4, num_kv_heads=2,
            head_dim=32, intermediate=64, dtype="float32",
        )
        b, s = 2, 128
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "tp"))
    params = shard_params(
        transformer.init_params(jax.random.key(0), cfg), mesh, cfg
    )
    tokens = jax.device_put(
        jax.random.randint(jax.random.key(1), (b, s), 0, cfg.vocab_size),
        NamedSharding(mesh, P("dp", None)),
    )

    tokens_per_step = b * s
    attn_fwd = cfg.num_layers * attention_flops(
        b * cfg.num_q_heads, s, s, cfg.head_dim, causal=True
    )
    step_flops = 6 * matmul_params(cfg) * tokens_per_step + 3.5 * attn_fwd

    rows = []
    for remat in (False, True):
        step = make_train_step(mesh, cfg, lr=1e-3, remat=remat)
        ms = step_time_ms(step, params, tokens)
        tf = step_flops / ms / 1e9
        rows.append(
            {
                "metric": "train_step"
                + ("_remat" if remat else "")
                + f"_mistral7b_slice_L{cfg.num_layers}_B{b}_S{s}_bf16",
                "value": round(ms, 2),
                "unit": "ms",
                "tokens_per_s": round(tokens_per_step / ms * 1e3),
                "model_tflops_per_s": round(tf, 1),
                "mfu_vs_v5e_bf16_peak": round(tf / V5E_BF16_PEAK, 3),
            }
        )
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
