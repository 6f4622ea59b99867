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
