"""One public entry point (round 4; VERDICT #7): every kernel capability is
reachable from ``ops.dispatch.attention`` — the single-op contract of the
reference binding (``/root/reference/src/main.cpp:5-7``) as a superset.

One test per kwarg, each exercising the DISPATCH plumbing (folding, padding,
GQA) rather than re-testing the kernels (tests/test_flash.py etc. own that):
the dispatch result must equal the hand-plumbed low-level call or oracle.
"""

import jax
import jax.numpy as jnp
import pytest

import flashattention_tpu.ops.flash as F
from flashattention_tpu.ops.dispatch import attention, sdpa
from flashattention_tpu.ops.flash import flash_attention
from flashattention_tpu.ops.quant import quantize_kv
from flashattention_tpu.ops.reference import attention_reference
from flashattention_tpu.utils.testing import make_random, validate_result


def qkv(shape, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    return tuple(make_random(kk, shape, dtype) for kk in ks)


def test_dispatch_dropout_matches_low_level():
    q, k, v = qkv((4, 256, 64))
    got = attention(q, k, v, causal=True, dropout_rate=0.2, dropout_seed=9)
    want = flash_attention(
        q, k, v, causal=True, dropout_rate=0.2, dropout_seed=9,
        block_sizes=F.BlockSizes(256, 256, 256),
    )
    validate_result(got, want, 1e-6)


def test_dispatch_dropout_keeps_mass():
    """Inverted dropout: row means stay near the undropped output."""
    q, k, v = qkv((4, 512, 64))
    base = attention(q, k, v, causal=True)
    drop = attention(q, k, v, causal=True, dropout_rate=0.1, dropout_seed=3)
    assert float(jnp.mean(jnp.abs(drop - base))) < 0.2
    assert float(jnp.max(jnp.abs(drop - base))) > 0.0  # actually dropped


def test_dispatch_segments_2d_broadcast_and_padding():
    """(B, S) ids broadcast across heads AND survive non-block-multiple pads."""
    b, h, s, d = 2, 4, 384, 64  # 384: forces padding to the 128-block grid
    q, k, v = qkv((b, h, s, d))
    seg = jnp.concatenate(
        [jnp.zeros((b, s // 3), jnp.int32),
         jnp.ones((b, s // 3), jnp.int32),
         jnp.full((b, s - 2 * (s // 3)), 2, jnp.int32)], axis=1,
    )
    got = attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)
    # Oracle: per-(b, h) dense attention restricted to same-segment keys.
    segb = jnp.repeat(seg[:, None, :], h, 1).reshape(b * h, s)
    mask = segb[:, :, None] == segb[:, None, :]
    from flashattention_tpu.ops.reference import DEFAULT_MASK_VALUE
    qf = q.reshape(b * h, s, d).astype(jnp.float32)
    kf = k.reshape(b * h, s, d).astype(jnp.float32)
    vf = v.reshape(b * h, s, d).astype(jnp.float32)
    sc = jnp.einsum("bqd,bkd->bqk", qf, kf, precision="highest")
    sc = jnp.where(mask, sc, DEFAULT_MASK_VALUE)
    want = jnp.einsum(
        "bqk,bkd->bqd", jax.nn.softmax(sc, -1), vf, precision="highest"
    ).reshape(b, h, s, d)
    validate_result(got, want, 2e-5)


def test_dispatch_segments_with_gqa_fold():
    b, hq, hkv, s, d = 1, 8, 2, 256, 64
    q, _, _ = qkv((b, hq, s, d))
    _, k, v = qkv((b, hkv, s, d), seed=1)
    seg = jnp.zeros((b, s), jnp.int32).at[:, s // 2:].set(1)
    got = attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)
    # Unfolded oracle: repeat KV heads, per-head segment attention.
    kr = jnp.repeat(k, hq // hkv, 1)
    vr = jnp.repeat(v, hq // hkv, 1)
    want = attention(q, kr, vr, q_segment_ids=seg, kv_segment_ids=seg)
    validate_result(got, want, 2e-5)


@pytest.mark.parametrize("qdtype", ["int8", "fp8"])
def test_dispatch_quantized_kv(qdtype):
    b, h, s, d = 2, 4, 256, 64
    q, k, v = qkv((b, h, s, d))
    kq, vq = quantize_kv(k.reshape(b * h, s, d), v.reshape(b * h, s, d), qdtype)
    got = attention(
        q,
        kq.payload.reshape(b, h, s, d),
        vq.payload.reshape(b, h, s, d),
        k_scales=kq.scales.reshape(b, h, s),
        v_scales=vq.scales.reshape(b, h, s),
        causal=True,
    )
    want = flash_attention(
        q.reshape(b * h, s, d), kq.payload, vq.payload, kq.scales, vq.scales,
        causal=True, block_sizes=F.BlockSizes(256, 256, 256),
    ).reshape(b, h, s, d)
    validate_result(got, want, 1e-6)


def test_dispatch_quantized_kv_ragged():
    """Quantized KV + non-block-multiple lengths: scales pad alongside."""
    bh, s, d = 4, 320, 64
    q, k, v = qkv((bh, s, d))
    kq, vq = quantize_kv(k, v, "int8")
    got = attention(
        q, kq.payload, vq.payload, k_scales=kq.scales, v_scales=vq.scales
    )
    want = attention(
        q,
        (kq.payload.astype(jnp.float32) * kq.scales[..., None]),
        (vq.payload.astype(jnp.float32) * vq.scales[..., None]),
    )
    validate_result(got, want, 3e-2)  # int8 payload noise


def test_dispatch_traced_kv_len():
    """One compiled program serves every chunked-prefill KV length."""
    bh, s, d = 2, 512, 64
    q, k, v = qkv((bh, s, d))

    @jax.jit
    def run(kv_len):
        return attention(q, k, v, kv_len=kv_len)

    for live in (128, 300, 512):
        got = run(jnp.int32(live))
        want = attention_reference(q, k[:, :live], v[:, :live])
        validate_result(got[:, :, :], want, 2e-5)


def test_dispatch_traced_q_offset():
    """Chunked causal prefill: explicit q_offset places the chunk."""
    bh, s_kv, d, chunk = 2, 512, 64, 128
    q, k, v = qkv((bh, s_kv, d))
    full = attention(q, k, v, causal=True)
    for c0 in (0, 128, 256):
        got = attention(
            q[:, c0 : c0 + chunk], k, v, causal=True,
            q_offset=jnp.int32(c0), kv_len=jnp.int32(c0 + chunk),
        )
        validate_result(got, full[:, c0 : c0 + chunk], 2e-5)


def test_dispatch_save_residuals_with_dropout():
    """Residuals stay the UNdropped stats (what backward needs)."""
    q, k, v = qkv((2, 256, 64))
    _, l0, m0 = attention(q, k, v, causal=True, save_residuals=True)
    _, l1, m1 = attention(
        q, k, v, causal=True, save_residuals=True,
        dropout_rate=0.3, dropout_seed=1,
    )
    validate_result(l1, l0, 1e-6)
    validate_result(m1, m0, 1e-6)


def test_sdpa_passes_new_kwargs():
    q, k, v = qkv((2, 256, 64))
    seg = jnp.zeros((2, 256), jnp.int32)
    got = sdpa(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)
    want = attention(q, k, v, scale=64**-0.5)
    validate_result(got, want, 2e-5)


def test_attention_is_differentiable():
    """jax.grad through the public attention() (round 5): the dispatch
    pallas branch routes through attention_vjp, so pad/fold/slice plumbing
    differentiates — including at unaligned shapes (the kv_len tail-mask
    path, newly threaded through the custom VJP)."""
    from flashattention_tpu.ops.reference import attention_reference

    q, k, v = qkv((4, 300, 64))  # unaligned: exercises pad + kv_len

    def loss(q, k, v):
        o = attention(q, k, v, causal=True, scale=0.125)
        return (o.astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, causal=True, scale=0.125)
        return (o ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gr):
        validate_result(a, b, 2e-4, name=f"d{name}")


def test_sdpa_gqa_is_differentiable():
    import jax.random as jr

    ks = jr.split(jr.key(5), 3)
    q = jr.normal(ks[0], (2, 8, 256, 64), jnp.float32)
    k = jr.normal(ks[1], (2, 2, 256, 64), jnp.float32)
    v = jr.normal(ks[2], (2, 2, 256, 64), jnp.float32)

    def loss(q, k, v):
        return (sdpa(q, k, v, causal=True).astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        kr = jnp.repeat(k, 4, axis=1).reshape(16, 256, 64)
        vr = jnp.repeat(v, 4, axis=1).reshape(16, 256, 64)
        from flashattention_tpu.ops.reference import attention_reference
        o = attention_reference(
            q.reshape(16, 256, 64), kr, vr, causal=True, scale=64**-0.5
        )
        return (o ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gr):
        # dK/dV accumulate over the 4 query groups -> 4x the bf16_3x
        # accumulation-order error of the plain case.
        validate_result(a, b.reshape(a.shape), 8e-4, name=f"d{name}")
