"""Paged decode-attention differential tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_tpu.ops.decode import paged_attention, paged_attention_reference
from flashattention_tpu.utils.testing import TOL_FP32, make_random, validate_result


def make_paged(seed, b, kvh, g, d, page_size, pages_per_seq, total_pages):
    ks = jax.random.split(jax.random.key(seed), 4)
    q = make_random(ks[0], (b, kvh, g, d))
    # Head-major page pool: (P, KVH, page_size, d).
    k_pages = make_random(ks[1], (total_pages, kvh, page_size, d))
    v_pages = make_random(ks[2], (total_pages, kvh, page_size, d))
    # Random non-overlapping page assignment per request.
    rng = np.random.default_rng(seed)
    perm = rng.permutation(total_pages)[: b * pages_per_seq]
    page_indices = jnp.asarray(perm.reshape(b, pages_per_seq), jnp.int32)
    return q, k_pages, v_pages, page_indices


def test_reference_matches_dense_gather():
    b, kvh, g, d, ps, pps = 2, 2, 4, 16, 8, 4
    q, kp, vp, pi = make_paged(0, b, kvh, g, d, ps, pps, 16)
    lengths = jnp.array([13, 29], jnp.int32)
    o = paged_attention_reference(q, kp, vp, lengths, pi)
    # Manual: gather rows for request 0, dense attention over first 13.
    from flashattention_tpu.ops.reference import attention_reference

    rows = (
        np.asarray(kp)[np.asarray(pi)[0]]
        .transpose(1, 0, 2, 3)
        .reshape(kvh, pps * ps, d)[:, :13]
    )
    vrows = (
        np.asarray(vp)[np.asarray(pi)[0]]
        .transpose(1, 0, 2, 3)
        .reshape(kvh, pps * ps, d)[:, :13]
    )
    want = attention_reference(
        np.asarray(q)[0], jnp.asarray(rows), jnp.asarray(vrows)
    )
    validate_result(o[0], want, 1e-5)


@pytest.mark.parametrize("pages_per_block", [1, 2, 4])
def test_paged_attention_vs_reference(pages_per_block):
    b, kvh, g, d, ps, pps = 3, 2, 4, 32, 16, 4
    q, kp, vp, pi = make_paged(1, b, kvh, g, d, ps, pps, 24)
    lengths = jnp.array([17, 64, 40], jnp.int32)
    o = paged_attention(
        q, kp, vp, lengths, pi, pages_per_compute_block=pages_per_block
    )
    want = paged_attention_reference(q, kp, vp, lengths, pi)
    validate_result(o, want, TOL_FP32)


def test_paged_attention_gqa_groups():
    # G=8 (8 query heads per KV head), KVH=4 -> 32 q heads.
    b, kvh, g, d, ps, pps = 2, 4, 8, 64, 16, 4
    q, kp, vp, pi = make_paged(2, b, kvh, g, d, ps, pps, 16)
    lengths = jnp.array([30, 64], jnp.int32)
    o = paged_attention(q, kp, vp, lengths, pi, pages_per_compute_block=2)
    want = paged_attention_reference(q, kp, vp, lengths, pi)
    validate_result(o, want, TOL_FP32)


def test_paged_attention_single_token_length():
    b, kvh, g, d, ps, pps = 2, 1, 4, 32, 8, 2
    q, kp, vp, pi = make_paged(3, b, kvh, g, d, ps, pps, 8)
    lengths = jnp.array([1, 5], jnp.int32)
    o = paged_attention(q, kp, vp, lengths, pi, pages_per_compute_block=1)
    want = paged_attention_reference(q, kp, vp, lengths, pi)
    validate_result(o, want, TOL_FP32)


def test_paged_attention_full_pages():
    # Lengths exactly filling all pages.
    b, kvh, g, d, ps, pps = 2, 2, 4, 32, 8, 4
    q, kp, vp, pi = make_paged(4, b, kvh, g, d, ps, pps, 16)
    lengths = jnp.array([32, 32], jnp.int32)
    o = paged_attention(q, kp, vp, lengths, pi, pages_per_compute_block=2)
    want = paged_attention_reference(q, kp, vp, lengths, pi)
    validate_result(o, want, TOL_FP32)


def test_paged_attention_quantized():
    from flashattention_tpu.ops.quant import quantize

    b, kvh, g, d, ps, pps = 2, 2, 4, 32, 16, 4
    q, kp, vp, pi = make_paged(5, b, kvh, g, d, ps, pps, 16)
    lengths = jnp.array([25, 60], jnp.int32)
    # Per-token quantization of the page pools (quantize reduces over the
    # last axis, so the 4D head-major layout quantizes directly).
    kq = quantize(kp, "int8")
    vq = quantize(vp, "int8")
    o = paged_attention(
        q,
        kq.payload,
        vq.payload,
        lengths,
        pi,
        k_scales_pages=kq.scales,
        v_scales_pages=vq.scales,
        pages_per_compute_block=2,
    )
    want = paged_attention_reference(q, kp, vp, lengths, pi)
    validate_result(o, want, 3e-2)


def test_paged_attention_scale():
    b, kvh, g, d, ps, pps = 1, 1, 4, 32, 8, 2
    q, kp, vp, pi = make_paged(6, b, kvh, g, d, ps, pps, 4)
    lengths = jnp.array([11], jnp.int32)
    sc = d**-0.5
    o = paged_attention(q, kp, vp, lengths, pi, scale=sc, pages_per_compute_block=1)
    want = paged_attention_reference(q, kp, vp, lengths, pi, scale=sc)
    validate_result(o, want, TOL_FP32)


def test_mismatched_pages_raises():
    b, kvh, g, d, ps, pps = 1, 1, 4, 32, 8, 3
    q, kp, vp, pi = make_paged(7, b, kvh, g, d, ps, pps, 4)
    with pytest.raises(ValueError):
        paged_attention(q, kp, vp[:, :, :, :16], jnp.array([1], jnp.int32), pi)


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_prefill_attention_vs_oracle(quantized):
    """Chunked-prefill attention DIRECTLY over shuffled pool pages (round 2):
    GQA folded q, capacity-padded tables with garbage pages masked by the
    traced ctx_len, causal offset = context minus chunk."""
    from flashattention_tpu.ops.decode import paged_prefill_attention
    from flashattention_tpu.ops.quant import quantize
    from flashattention_tpu.ops.reference import attention_reference

    ps, kvh, g, d = 8, 2, 2, 32
    for ctx, chunk in [(24, 8), (32, 16), (24, 24)]:
        ks = jax.random.split(jax.random.key(ctx), 3)
        kd = make_random(ks[0], (kvh, ctx, d))
        vd = make_random(ks[1], (kvh, ctx, d))
        cap = -(-ctx // ps) + 2  # capacity-padded table (garbage tail pages)
        total = cap + 3
        perm = np.random.RandomState(1).permutation(total)[:cap]
        kp = make_random(jax.random.key(99), (total, kvh, ps, d))
        vp = make_random(jax.random.key(98), (total, kvh, ps, d))
        for t in range(ctx):
            pg, sl = perm[t // ps], t % ps
            kp = kp.at[pg, :, sl].set(kd[:, t])
            vp = vp.at[pg, :, sl].set(vd[:, t])
        extra, tol = {}, 1e-4
        kref, vref = kd, vd
        if quantized:
            kq, vq = quantize(kp, "int8"), quantize(vp, "int8")
            kp, vp = kq.payload, vq.payload
            extra = dict(k_scales_pages=kq.scales, v_scales_pages=vq.scales)
            tol = 5e-2
            deq = lambda qt, t_: qt.payload[perm[t_ // ps], :, t_ % ps].astype(
                jnp.float32
            ) * qt.scales[perm[t_ // ps], :, t_ % ps][:, None]
            kref = jnp.stack([deq(kq, t_) for t_ in range(ctx)], axis=1)
            vref = jnp.stack([deq(vq, t_) for t_ in range(ctx)], axis=1)
        q = make_random(ks[2], (kvh, g * chunk, d))
        o = paged_prefill_attention(
            q, kp, vp, jnp.asarray(perm, jnp.int32), jnp.int32(ctx),
            chunk=chunk, seg=chunk, block_q=8, **extra,
        )
        for h in range(kvh):
            for gi in range(g):
                sl_ = slice(gi * chunk, (gi + 1) * chunk)
                want = attention_reference(
                    q[h, sl_][None], kref[h][None], vref[h][None],
                    causal=True, q_offset=ctx - chunk,
                )
                err = float(jnp.max(jnp.abs(o[h, sl_][None] - want)))
                assert err < tol, (ctx, chunk, h, gi, err)


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_prefill_batched_matches_per_request(quantized):
    """Round 3: the batched chunked-prefill kernel is bit-identical to N
    per-request dispatches (per-request ctx anchors and page tables ride
    scalar prefetch); dummy rows (ctx=0) are skipped entirely."""
    from flashattention_tpu.ops.decode import (
        paged_prefill_attention,
        paged_prefill_attention_batched,
    )
    from flashattention_tpu.ops.quant import quantize

    kvh, d, ps, pps, chunk, P, B = 2, 64, 16, 8, 32, 32, 3
    ks = jax.random.split(jax.random.key(3), 3)
    kp = make_random(ks[0], (P, kvh, ps, d))
    vp = make_random(ks[1], (P, kvh, ps, d))
    q = make_random(ks[2], (B, kvh, chunk, d))
    ksc = vsc = None
    if quantized:
        kq, vq = quantize(kp, "int8"), quantize(vp, "int8")
        kp, ksc = kq.payload, kq.scales
        vp, vsc = vq.payload, vq.scales
    # Ragged contexts: 16-token prefix + chunk, chunk only, and a dummy row.
    ctx = jnp.array([48, 32, 0], jnp.int32)
    pi = (jnp.arange(B * pps, dtype=jnp.int32).reshape(B, pps) * 3) % P
    kw = dict(chunk=chunk, scale=0.5, window=20, logit_softcap=15.0)
    ob = paged_prefill_attention_batched(
        q, kp, vp, pi, ctx, k_scales_pages=ksc, v_scales_pages=vsc, **kw
    )
    for b in range(2):
        o1 = paged_prefill_attention(
            q[b], kp, vp, pi[b], ctx[b],
            k_scales_pages=ksc, v_scales_pages=vsc, **kw,
        )
        assert jnp.array_equal(ob[b], o1), ("row", b, quantized)
