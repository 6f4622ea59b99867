"""Seeded randomized differential sweep: the safety net across the config grid.

Samples shape/dtype/causal/GQA/ragged/quantization combinations the
hand-written tests don't enumerate and checks the public API against the jnp
oracle at the appropriate tolerance class. Seeds are fixed — failures are
reproducible by case index.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_tpu.ops.dispatch import attention
from flashattention_tpu.ops.quant import attention_quantized, quantize_kv
from flashattention_tpu.ops.reference import attention_reference
from flashattention_tpu.utils.testing import make_random, max_abs_err

CASES = list(range(12))


def sample_config(rng):
    b = int(rng.integers(1, 4))
    hkv = int(rng.choice([1, 2, 4]))
    g = int(rng.choice([1, 1, 2, 4]))
    hq = hkv * g
    d = int(rng.choice([32, 64, 80, 128]))
    s_q = int(rng.integers(16, 400))
    cross = rng.random() < 0.3
    s_kv = int(rng.integers(s_q, 512)) if cross else s_q
    causal = bool(rng.random() < 0.6)
    dtype = jnp.float32 if rng.random() < 0.5 else jnp.bfloat16
    scale = float(rng.choice([1.0, d**-0.5]))
    # Round-2 dims: sliding window (causal only) and logit softcap.
    window = int(rng.integers(8, s_kv + 1)) if causal and rng.random() < 0.4 else None
    cap = float(rng.choice([20.0, 50.0])) if rng.random() < 0.3 else None
    return b, hq, hkv, d, s_q, s_kv, causal, dtype, scale, window, cap


@pytest.mark.parametrize("case", CASES)
def test_fuzz_attention_vs_oracle(case):
    rng = np.random.default_rng(1000 + case)
    b, hq, hkv, d, s_q, s_kv, causal, dtype, scale, window, cap = sample_config(rng)
    ks = jax.random.split(jax.random.key(case), 3)
    q = make_random(ks[0], (b, hq, s_q, d), dtype)
    k = make_random(ks[1], (b, hkv, s_kv, d), dtype)
    v = make_random(ks[2], (b, hkv, s_kv, d), dtype)

    o = attention(
        q, k, v, causal=causal, scale=scale, window=window, logit_softcap=cap
    )

    gq = hq // hkv
    kr = jnp.repeat(k, gq, axis=1).reshape(b * hq, s_kv, d)
    vr = jnp.repeat(v, gq, axis=1).reshape(b * hq, s_kv, d)
    want = attention_reference(
        q.reshape(b * hq, s_q, d), kr, vr, causal=causal, scale=scale,
        q_offset=s_kv - s_q if causal else 0, window=window, logit_softcap=cap,
    )
    tol = 1e-3 if dtype == jnp.float32 else 5e-2
    err = max_abs_err(o.astype(jnp.float32).reshape(b * hq, s_q, d), want)
    assert err <= tol, (
        f"case {case}: b={b} hq={hq} hkv={hkv} d={d} s_q={s_q} s_kv={s_kv} "
        f"causal={causal} dtype={dtype.__name__} scale={scale} "
        f"window={window} cap={cap}: err={err}"
    )


@pytest.mark.parametrize("case", range(6))
def test_fuzz_quantized_vs_oracle(case):
    rng = np.random.default_rng(2000 + case)
    bh = int(rng.integers(1, 6))
    d = int(rng.choice([32, 64, 128]))
    s = int(rng.integers(16, 300))
    causal = bool(rng.random() < 0.5)
    qdtype = "int8" if rng.random() < 0.7 else "fp8"
    ks = jax.random.split(jax.random.key(case + 77), 3)
    q = make_random(ks[0], (bh, s, d))
    k = make_random(ks[1], (bh, s, d))
    v = make_random(ks[2], (bh, s, d))
    kq, vq = quantize_kv(k, v, qdtype)
    o = attention_quantized(q, kq, vq, causal=causal)
    want = attention_reference(q, k, v, causal=causal)
    tol = 5e-2 if qdtype == "int8" else 2e-1
    err = max_abs_err(o.astype(jnp.float32), want)
    assert err <= tol, (
        f"case {case}: bh={bh} d={d} s={s} causal={causal} {qdtype}: err={err}"
    )
