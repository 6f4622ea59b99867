"""L2 quantized-KV differential tests."""

import jax
import jax.numpy as jnp
import pytest

from flashattention_tpu.ops.flash import BlockSizes
from flashattention_tpu.ops.quant import (
    attention_quantized,
    dequantize,
    quantize,
    quantize_kv,
)
from flashattention_tpu.ops.reference import attention_reference
from flashattention_tpu.utils.testing import make_random, max_abs_err, validate_result

BLOCKS = BlockSizes(128, 128, 128)


def qkv(shape, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    return tuple(make_random(k, shape) for k in ks)


@pytest.mark.parametrize("dtype", ["int8", "fp8"])
@pytest.mark.parametrize("granularity", ["token", "head"])
def test_quantize_roundtrip(dtype, granularity):
    x = make_random(jax.random.key(0), (2, 64, 32), lo=-3.0, hi=3.0)
    qt = quantize(x, dtype, granularity=granularity)
    back = dequantize(qt)
    # int8: absolute error <= scale/2.  fp8 e4m3: *relative* error <= 2^-4,
    # so worst absolute error <= absmax * 6.25% = scale * 448 * 0.0625.
    bound = float(jnp.max(qt.scales)) * (0.51 if dtype == "int8" else 29.0)
    assert max_abs_err(back, x) <= bound, (max_abs_err(back, x), bound)


def test_quantize_zero_tensor():
    x = jnp.zeros((1, 16, 8))
    qt = quantize(x, "int8")
    validate_result(dequantize(qt), x, 0.0)


@pytest.mark.parametrize("dtype", ["int8", "fp8"])
@pytest.mark.parametrize("causal", [False, True])
def test_attention_quantized_vs_dequantized_oracle(dtype, causal):
    # The kernel's fused dequant must match attention over the explicitly
    # dequantized KV *exactly-ish* (same effective inputs -> tight tol).
    q, k, v = qkv((2, 256, 64), seed=1)
    kq, vq = quantize_kv(k, v, dtype)
    o = attention_quantized(q, kq, vq, causal=causal, block_sizes=BLOCKS)
    want = attention_reference(
        q, dequantize(kq), dequantize(vq), causal=causal
    )
    # bf16 matmul path inside the quant kernel: bf16-class tolerance.
    validate_result(o, want, 2e-2)


@pytest.mark.parametrize("dtype", ["int8", "fp8"])
def test_attention_quantized_vs_fp_attention(dtype):
    # End-to-end quantization error vs the unquantized oracle stays within
    # the BASELINE.json accuracy budget (1e-2-class for normalized inputs).
    q, k, v = qkv((2, 256, 64), seed=2)
    kq, vq = quantize_kv(k, v, dtype)
    o = attention_quantized(q, kq, vq, block_sizes=BLOCKS)
    want = attention_reference(q, k, v)
    # int8 (127 levels) is tight; fp8 e4m3 carries ~6% relative payload error
    # through the softmax, the documented accuracy/bandwidth trade.
    validate_result(o, want, 3e-2 if dtype == "int8" else 1.5e-1)


def test_quantized_residuals():
    """(l, m) from the quantized kernel == running the plain kernel on the
    dequantized KV (same effective inputs) — ring attention and the backward
    pass consume these, so values matter, not just shapes."""
    from flashattention_tpu.ops.flash import flash_attention
    from flashattention_tpu.ops.quant import dequantize

    q, k, v = qkv((1, 128, 32), seed=3)
    kq, vq = quantize_kv(k, v, "int8")
    o, l, m = attention_quantized(
        q, kq, vq, block_sizes=BLOCKS, save_residuals=True
    )
    assert l.shape == (1, 128) and m.shape == (1, 128)
    _, want_l, want_m = flash_attention(
        q, dequantize(kq), dequantize(vq), block_sizes=BLOCKS,
        save_residuals=True, precision="bf16",
    )
    validate_result(m, want_m, 1e-2, name="m")
    validate_result(l / want_l, jnp.ones_like(l), 1e-2, name="l-ratio")


def test_bad_dtype_raises():
    x = jnp.zeros((1, 16, 8))
    with pytest.raises(ValueError):
        quantize(x, "int4")


def test_attention_quantized_unaligned_lengths():
    """attention_quantized pads ragged sequence lengths like dispatch does."""
    from flashattention_tpu.ops.quant import attention_quantized, quantize_kv
    from flashattention_tpu.ops.reference import attention_reference

    bh, s, d = 4, 300, 64  # not a multiple of any block size
    ks = jax.random.split(jax.random.key(3), 3)
    q = make_random(ks[0], (bh, s, d))
    k = make_random(ks[1], (bh, s, d))
    v = make_random(ks[2], (bh, s, d))
    kq, vq = quantize_kv(k, v, "int8")
    o = attention_quantized(q, kq, vq, causal=True)
    want = attention_reference(q, k, v, causal=True)
    assert o.shape == q.shape
    assert max_abs_err(o.astype(jnp.float32), want) <= 5e-2


def test_attention_quantized_gqa_fold_unaligned_segment():
    """Folded-GQA (q_seq_len) inputs whose segments are NOT block multiples
    pad per-segment (ADVICE r1: previously raised a divisibility error)."""
    bh, seg, groups, d = 2, 200, 2, 32  # 200 is not a block_q multiple
    ks = jax.random.split(jax.random.key(7), 3)
    q = make_random(ks[0], (bh, seg * groups, d))
    k = make_random(ks[1], (bh, seg, d))
    v = make_random(ks[2], (bh, seg, d))
    kq, vq = quantize_kv(k, v, "int8")
    o, l, m = attention_quantized(
        q, kq, vq, causal=True, q_seq_len=seg, save_residuals=True
    )
    assert o.shape == q.shape and l.shape == m.shape == (bh, seg * groups)
    kd, vd = dequantize(kq), dequantize(vq)
    for g in range(groups):
        want = attention_reference(
            q[:, g * seg : (g + 1) * seg], kd, vd, causal=True
        )
        validate_result(
            o[:, g * seg : (g + 1) * seg], want, 2e-2, name=f"group{g}"
        )


# ── weight-only quantization (round 3) ───────────────────────────────────


def test_quantized_weight_matmul_identity():
    """(x @ p) * s == x @ (p * s) exactly in the per-output-channel layout,
    and the quantization error is the expected absmax/127 grid."""
    from flashattention_tpu.ops.quant import (
        dequantize_weight, quantize_weight,
    )

    w = jax.random.normal(jax.random.key(0), (64, 128))
    x = jax.random.normal(jax.random.key(1), (8, 64))
    qw = quantize_weight(w)
    a = x @ dequantize_weight(qw)
    b = (x @ qw.payload.astype(jnp.float32)) * qw.scales
    assert float(jnp.max(jnp.abs(a - b))) < 1e-4
    # Grid error bound: half a quantization step per element.
    step = jnp.max(jnp.abs(w), axis=0) / 127.0
    assert float(
        jnp.max(jnp.abs(w - dequantize_weight(qw)) - step[None, :] / 2)
    ) < 1e-6


@pytest.mark.parametrize("wdtype", ["int8", "fp8"])
def test_weight_only_prefill_and_decode_match_dequantized(wdtype):
    """quantize_weights(params) serves through the UNCHANGED prefill and
    decode paths; outputs == running the explicitly dequantized params
    (reassociation-only difference), with int8/fp8 actually at rest."""
    from flashattention_tpu.models import transformer
    from flashattention_tpu.ops.quant import (
        QUANT_DTYPES, QuantizedWeight, dequantize_weight, quantize_weights,
    )

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    qparams = quantize_weights(params, wdtype)
    assert isinstance(qparams["lm_head"], QuantizedWeight)
    assert qparams["lm_head"].payload.dtype == QUANT_DTYPES[wdtype][0]
    assert qparams["layers"][0]["attn_norm"].dtype == jnp.float32  # skipped
    dqparams = jax.tree.map(
        lambda x: dequantize_weight(x) if isinstance(x, QuantizedWeight) else x,
        qparams,
        is_leaf=lambda x: isinstance(x, QuantizedWeight),
    )

    tokens = jax.random.randint(jax.random.key(1), (2, 128), 0, cfg.vocab_size)
    lq, kq, vq = transformer.prefill(qparams, tokens, cfg=cfg)
    ld, kd, vd = transformer.prefill(dqparams, tokens, cfg=cfg)
    assert float(jnp.max(jnp.abs(lq - ld))) < 1e-3

    # MoE variant: expert stacks quantize per (E, d_out) and serve too.
    cfg_moe = transformer.ModelConfig(
        vocab_size=64, num_layers=1, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
        num_experts=4, experts_per_token=2,
    )
    pm = transformer.init_params(jax.random.key(2), cfg_moe)
    qm = quantize_weights(pm)
    assert not isinstance(qm["layers"][0]["router"], QuantizedWeight)
    dm = jax.tree.map(
        lambda x: dequantize_weight(x) if isinstance(x, QuantizedWeight) else x,
        qm,
        is_leaf=lambda x: isinstance(x, QuantizedWeight),
    )
    lq2, _, _ = transformer.prefill(qm, tokens, cfg=cfg_moe)
    ld2, _, _ = transformer.prefill(dm, tokens, cfg=cfg_moe)
    assert float(jnp.max(jnp.abs(lq2 - ld2))) < 1e-3


def test_weight_only_engine_end_to_end():
    """The serving engine runs unmodified on weight-quantized params and
    generates the same tokens as the dequantized model (greedy)."""
    from flashattention_tpu.models import transformer
    from flashattention_tpu.ops.quant import (
        QuantizedWeight, dequantize_weight, quantize_weights,
    )
    from flashattention_tpu.runtime.engine import Engine, EngineConfig
    from flashattention_tpu.runtime.kvcache import CacheConfig

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    qparams = quantize_weights(params)
    dqparams = jax.tree.map(
        lambda x: dequantize_weight(x) if isinstance(x, QuantizedWeight) else x,
        qparams,
        is_leaf=lambda x: isinstance(x, QuantizedWeight),
    )
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    ccfg = CacheConfig(
        num_layers=cfg.num_layers, num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, page_size=8, num_pages=64, dtype="float32",
    )

    def gen(p):
        eng = Engine(
            p, cfg, ccfg, EngineConfig(max_batch=2, pages_per_seq=8)
        )
        rid = eng.add_request(prompt, max_new_tokens=6)
        return eng.run()[rid]

    assert gen(qparams) == gen(dqparams)


def test_lora_merge_then_quantize_serves():
    """Deployment composition: fine-tuned adapters merge into the base
    (merge_lora), the merged tree quantizes to int8 weight-only, and the
    engine serves it — generation == the dequantized merged model."""
    from flashattention_tpu.models import transformer
    from flashattention_tpu.models.train import init_lora, merge_lora
    from flashattention_tpu.ops.quant import (
        QuantizedWeight, dequantize_weight, quantize_weights,
    )
    from flashattention_tpu.runtime.engine import Engine, EngineConfig
    from flashattention_tpu.runtime.kvcache import CacheConfig

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    base = transformer.init_params(jax.random.key(0), cfg)
    lora = init_lora(jax.random.key(1), base, rank=4, targets=("wq", "wv"))
    lora = jax.tree.map(lambda a: a + 0.02, lora)  # non-trivial adapters
    merged = merge_lora(base, lora)
    qmerged = quantize_weights(merged)
    dq = jax.tree.map(
        lambda x: dequantize_weight(x) if isinstance(x, QuantizedWeight) else x,
        qmerged,
        is_leaf=lambda x: isinstance(x, QuantizedWeight),
    )
    ccfg = CacheConfig(
        num_layers=cfg.num_layers, num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, page_size=8, num_pages=64, dtype="float32",
    )

    def gen(p):
        eng = Engine(p, cfg, ccfg, EngineConfig(max_batch=2, pages_per_seq=8))
        rid = eng.add_request([5, 4, 3, 2, 1], max_new_tokens=6)
        return eng.run()[rid]

    assert gen(qmerged) == gen(dq)
