"""Compiled-kernel differential gate (round 3; VERDICT #9).

Every differential test in ``tests/`` runs the Pallas *interpreter* on the
8-CPU virtual mesh (tests/conftest.py) — the identical kernel code, but not
the Mosaic compiler.  Interpreter-vs-Mosaic divergence (layout, clamping,
scalar-prefetch edge cases) is a real bug class that suite cannot catch, so
this module re-runs a compact battery of the same kernel-vs-oracle checks
**compiled** (``interpret=False``) on whatever accelerator is present.

Two entry points:

- ``run(verbose=...)`` → ``(passed, failed, failures)`` — called by
  ``bench.py`` on every driver bench run, so a compiled-mode pass is recorded
  in each round's ``BENCH_r{N}.json`` (the ``compiled_selftest`` key).
- ``tests/test_compiled.py`` wraps each check as a pytest test marked
  ``tpu`` (``pytest tests -m tpu`` on a TPU host runs them; the CPU CI suite
  deselects them because compiled Pallas needs the accelerator backend).

Checks mirror the strict interpreter-suite tolerances (utils/testing.py:
TOL_FP32=1e-4 kernel-lab gate, ~``/root/reference/src/llm.c/attention_forward.cu:1262``;
TOL_BF16=2e-2 BASELINE.json gate) — NOT the loose atol=1e-1 allclose the
reference's public harness uses (``/root/reference/bench_flashattention.py:74``),
which until round 3 was the only compiled-path gate here.

Shapes are kept small (S<=1024) so the whole battery is a handful of ~20-40 s
remote compiles; correctness coverage, not perf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flashattention_tpu.utils.testing import (
    TOL_BF16,
    TOL_FP32,
    make_random,
    validate_result,
)

__all__ = ["run", "CHECKS"]


def _qkv(shape, dtype=jnp.float32, seed=0, n=3):
    ks = jax.random.split(jax.random.key(seed), n)
    return tuple(make_random(k, shape, dtype) for k in ks[:n])


def check_fwd_fp32_default():
    """fp32 default precision (bf16_3x 3-pass emulation), non-causal."""
    from flashattention_tpu.ops.flash import flash_attention
    from flashattention_tpu.ops.reference import attention_reference

    q, k, v = _qkv((4, 1024, 64), seed=1)
    o = flash_attention(q, k, v, interpret=False)
    validate_result(o, attention_reference(q, k, v), TOL_FP32)


def check_fwd_bf16_causal():
    """Native bf16, causal (triangular pair grid on the compiled path)."""
    from flashattention_tpu.ops.flash import flash_attention
    from flashattention_tpu.ops.reference import attention_reference

    q, k, v = _qkv((4, 1024, 64), jnp.bfloat16, seed=2)
    o = flash_attention(q, k, v, causal=True, interpret=False)
    validate_result(o, attention_reference(q, k, v, causal=True), TOL_BF16)


def check_fwd_window_softcap_gqa():
    """Sliding window + logit softcap + GQA row folding, one kernel."""
    from flashattention_tpu.ops.flash import flash_attention
    from flashattention_tpu.ops.reference import attention_reference

    b, kvh, g, s, d = 1, 2, 2, 512, 64
    q = make_random(jax.random.key(3), (b * kvh, g * s, d))
    k, v = _qkv((b * kvh, s, d), seed=4, n=2)
    o = flash_attention(
        q, k, v, causal=True, window=200, logit_softcap=30.0,
        q_seq_len=s, interpret=False,
    )
    # Unfold and compare per group segment against the dense oracle.
    want = attention_reference(
        q.reshape(b * kvh * g, s, d),
        jnp.repeat(k, g, axis=0),
        jnp.repeat(v, g, axis=0),
        causal=True, window=200, logit_softcap=30.0,
    )
    validate_result(o.reshape(b * kvh * g, s, d), want, TOL_FP32)


def check_fwd_traced_offsets():
    """Traced q_offset + kv_len (scalar-prefetch) with poisoned padding."""
    from flashattention_tpu.ops.flash import flash_attention
    from flashattention_tpu.ops.reference import attention_reference

    q, k, v = _qkv((2, 512, 64), seed=5)
    kv_len, q_offset = 700, 444
    kbad = k.at[:, kv_len:].set(jnp.nan)
    vbad = v.at[:, kv_len:].set(jnp.nan)
    o = flash_attention(
        q[:, :256], kbad, vbad, causal=True,
        q_offset=jnp.int32(q_offset), kv_len=jnp.int32(kv_len),
        interpret=False,
    )
    want = attention_reference(
        q[:, :256], k[:, :kv_len], v[:, :kv_len],
        causal=True, q_offset=q_offset,
    )
    validate_result(o, want, TOL_FP32)


def check_fwd_lane_packed_d32():
    """Lane-packed fp32 (hi/lo pairs in idle MXU lanes) at d=32 (4-group)."""
    from flashattention_tpu.ops.flash import flash_attention
    from flashattention_tpu.ops.reference import attention_reference

    q, k, v = _qkv((4, 1024, 32), seed=6)
    o = flash_attention(q, k, v, interpret=False)
    validate_result(o, attention_reference(q, k, v), TOL_FP32)


def check_fwd_block_h_batched():
    """block_h head batching (small-S overhead amortization, VERDICT r2 #4).

    ``BlockSizes.fit`` auto-picks block_h > 1 at small S, so the compiled
    path must agree with the unbatched kernel bit-for-bit (same per-head
    compute, disjoint scratch bands)."""
    from flashattention_tpu.ops.flash import BlockSizes, flash_attention
    from flashattention_tpu.ops.reference import attention_reference

    q, k, v = _qkv((16, 512, 64), seed=10)
    bsh = BlockSizes(256, 512, 512, block_h=8)
    o = flash_attention(q, k, v, block_sizes=bsh, interpret=False)
    validate_result(o, attention_reference(q, k, v), TOL_FP32)
    o1 = flash_attention(
        q, k, v, block_sizes=BlockSizes(256, 512, 512), interpret=False
    )
    assert jnp.array_equal(o, o1), "block_h=8 diverged from block_h=1"


def check_fwd_windowed_tri_grid():
    """Sliding-window causal on the triangular pair grid (round 3): the
    pair table starts each q row at its first in-window KV block and the
    scratch init must fire there on the compiled path too."""
    from flashattention_tpu.ops.flash import BlockSizes, flash_attention
    from flashattention_tpu.ops.reference import attention_reference

    q, k, v = _qkv((2, 1024, 64), seed=11)
    bs = BlockSizes(128, 128, 128)
    o = flash_attention(
        q, k, v, causal=True, window=256, block_sizes=bs, interpret=False
    )
    want = attention_reference(q, k, v, causal=True, window=256)
    validate_result(o, want, TOL_FP32)


def check_fwd_dropout():
    """Attention dropout (round 3): the compiled hash must match the jnp
    oracle mask bit-for-bit (u32 mul/xor/shift legalization under Mosaic)."""
    from flashattention_tpu.ops.flash import dropout_keep_mask, flash_attention

    q, k, v = _qkv((4, 512, 64), seed=13)
    rate, seed = 0.2, 77
    o = flash_attention(
        q, k, v, causal=True, dropout_rate=rate, dropout_seed=seed,
        interpret=False,
    )
    # precision="highest": on TPU the f32 einsum default is bf16 passes
    # (~1e-2 error) — the oracle must be true fp32 for the 1e-4 gate.
    s_ = jnp.einsum("bqd,bkd->bqk", q, k, precision="highest")
    mask = jnp.arange(512)[:, None] >= jnp.arange(512)[None, :]
    s_ = jnp.where(mask[None], s_, -1e30)
    p = jax.nn.softmax(s_, axis=-1)
    keeps = jnp.stack([
        dropout_keep_mask(seed, b, 0, 0, (512, 512), rate) for b in range(4)
    ])
    z = jnp.where(keeps, p, 0.0) / (1 - rate)
    validate_result(
        o, jnp.einsum("bqk,bkd->bqd", z, v, precision="highest"), TOL_FP32
    )


def check_fwd_segments():
    """Packed-sequence segment masking (round 3) on the compiled path:
    packed row slices == each document attended alone."""
    from flashattention_tpu.ops.flash import flash_attention

    q, k, v = _qkv((2, 512, 64), seed=14)
    seg = jnp.concatenate(
        [jnp.zeros(256, jnp.int32), jnp.ones(256, jnp.int32)]
    )
    segs = jnp.broadcast_to(seg, (2, 512))
    packed = flash_attention(
        q, k, v, causal=True, q_segment_ids=segs, kv_segment_ids=segs,
        interpret=False,
    )
    for sl in (slice(0, 256), slice(256, 512)):
        solo = flash_attention(
            q[:, sl], k[:, sl], v[:, sl], causal=True, interpret=False
        )
        validate_result(packed[:, sl], solo, TOL_FP32, name=f"slice {sl}")


def check_backward_dropout_segments():
    """Backward kernels regenerate the dropout mask and segment mask on the
    compiled path: grads vs autodiff of the explicit-mask oracle."""
    from flashattention_tpu.ops.backward import attention_vjp
    from flashattention_tpu.ops.flash import BlockSizes, dropout_keep_mask

    s, d, rate, seed = 256, 64, 0.15, 5
    q, k, v = _qkv((2, s, d), seed=15)
    t = make_random(jax.random.key(16), (2, s, d))
    seg = jnp.concatenate([jnp.zeros(128, jnp.int32), jnp.ones(128, jnp.int32)])
    segs = jnp.broadcast_to(seg, (2, s))
    keeps = jnp.stack([
        dropout_keep_mask(seed, b, 0, 0, (s, s), rate) for b in range(2)
    ])
    bs = BlockSizes(128, 128, 128)

    def loss_fa(q, k, v):
        o = attention_vjp(
            q, k, v, True, 1.0, bs, None, False, None, None, None,
            rate, seed, segs, segs,
        )
        return jnp.sum(o * t)

    def loss_or(q, k, v):
        # precision="highest": TPU f32 einsum default is bf16 (see
        # check_fwd_dropout) and grads inherit the forward precision.
        sc = jnp.einsum("bqd,bkd->bqk", q, k, precision="highest")
        m = (seg[:, None] == seg[None, :]) & (
            jnp.arange(s)[:, None] >= jnp.arange(s)[None, :]
        )
        sc = jnp.where(m[None], sc, -1e30)
        p = jax.nn.softmax(sc, axis=-1)
        z = jnp.where(keeps, p, 0.0) / (1 - rate)
        return jnp.sum(
            jnp.einsum("bqk,bkd->bqd", z, v, precision="highest") * t
        )

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_or = jax.grad(loss_or, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), g_fa, g_or):
        validate_result(a, b, 5e-4, name=name)


def check_backward():
    """Two-pass backward dQ/dK/dV vs oracle autodiff, causal fp32."""
    from flashattention_tpu.ops.backward import flash_attention_bwd
    from flashattention_tpu.ops.flash import flash_attention
    from flashattention_tpu.ops.reference import attention_reference

    q, k, v = _qkv((2, 512, 64), seed=7)
    t = make_random(jax.random.key(8), (2, 512, 64))
    o, l, m = flash_attention(
        q, k, v, causal=True, save_residuals=True, interpret=False
    )
    lse = m + jnp.log(l)
    dq, dk, dv = flash_attention_bwd(
        q, k, v, o, lse, t, causal=True, interpret=False
    )
    want = jax.grad(
        lambda q, k, v: jnp.sum(attention_reference(q, k, v, causal=True) * t),
        argnums=(0, 1, 2),
    )(q, k, v)
    validate_result(dq, want[0], 5e-4, name="dq")
    validate_result(dk, want[1], 5e-4, name="dk")
    validate_result(dv, want[2], 5e-4, name="dv")


def check_paged_prefill_batched():
    """Batched chunked-prefill kernel == per-request dispatches (the serving
    engine routes ALL chunked prefills through the batched path, round 3)."""
    from flashattention_tpu.ops.decode import (
        paged_prefill_attention,
        paged_prefill_attention_batched,
    )

    kvh, d, ps, pps, chunk, P = 2, 64, 64, 4, 128, 16
    ks = jax.random.split(jax.random.key(12), 3)
    kp = make_random(ks[0], (P, kvh, ps, d), jnp.bfloat16)
    vp = make_random(ks[1], (P, kvh, ps, d), jnp.bfloat16)
    q = make_random(ks[2], (3, kvh, chunk, d), jnp.bfloat16)
    ctx = jnp.array([256, 128, 0], jnp.int32)  # prefix+chunk, chunk, dummy
    pi = (jnp.arange(3 * pps, dtype=jnp.int32).reshape(3, pps) * 5) % P
    ob = paged_prefill_attention_batched(
        q, kp, vp, pi, ctx, chunk=chunk, scale=0.5, interpret=False
    )
    for b in range(2):
        o1 = paged_prefill_attention(
            q[b], kp, vp, pi[b], ctx[b], chunk=chunk, scale=0.5,
            interpret=False,
        )
        assert jnp.array_equal(ob[b], o1), f"batched row {b} diverged"


def check_paged_decode_int8():
    """Paged decode with fused int8 dequant vs the dense paged oracle."""
    from flashattention_tpu.ops.decode import (
        paged_attention,
        paged_attention_reference,
    )
    from flashattention_tpu.ops.quant import dequantize, quantize

    b, kvh, g, d, ps, pps = 2, 2, 2, 128, 256, 2
    ks = jax.random.split(jax.random.key(9), 3)
    q = make_random(ks[0], (b, kvh, g, d))
    kq = quantize(make_random(ks[1], (b * pps + 1, kvh, ps, d)), "int8")
    vq = quantize(make_random(ks[2], (b * pps + 1, kvh, ps, d)), "int8")
    lengths = jnp.array([ps * pps, ps + 17], jnp.int32)
    pi = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
    o = paged_attention(
        q, kq.payload, vq.payload, lengths, pi,
        k_scales_pages=kq.scales, v_scales_pages=vq.scales,
    )
    want = paged_attention_reference(q, dequantize(kq), dequantize(vq), lengths, pi)
    validate_result(o, want, 5e-2)


def check_fwd_tri_grid_deep():
    """Triangular pair grid at depth (S=4096, round 4; VERDICT #6): until now
    the tri grid compiled under Mosaic only inside benchmarks, where wrong
    numbers pass silently.  BH kept small so the oracle einsum stays cheap."""
    from flashattention_tpu.ops.flash import flash_attention
    from flashattention_tpu.ops.reference import attention_reference

    q, k, v = _qkv((2, 4096, 64), jnp.bfloat16, seed=20)
    o = flash_attention(q, k, v, causal=True, interpret=False)
    want = attention_reference(q, k, v, causal=True)
    validate_result(o, want, TOL_BF16)


def check_backward_d128():
    """Backward at the flagship head_dim (d=128, round 4; VERDICT #5/#6):
    the bwd block fit differs from d=64 (VMEM pressure), so the compiled
    path needs its own gate."""
    from flashattention_tpu.ops.backward import flash_attention_bwd
    from flashattention_tpu.ops.flash import flash_attention
    from flashattention_tpu.ops.reference import attention_reference

    q, k, v = _qkv((2, 512, 128), seed=21)
    t = make_random(jax.random.key(22), (2, 512, 128))
    o, l, m = flash_attention(
        q, k, v, causal=True, save_residuals=True, interpret=False
    )
    lse = m + jnp.log(l)
    dq, dk, dv = flash_attention_bwd(
        q, k, v, o, lse, t, causal=True, interpret=False
    )
    want = jax.grad(
        lambda q, k, v: jnp.sum(attention_reference(q, k, v, causal=True) * t),
        argnums=(0, 1, 2),
    )(q, k, v)
    validate_result(dq, want[0], 5e-4, name="dq")
    validate_result(dk, want[1], 5e-4, name="dk")
    validate_result(dv, want[2], 5e-4, name="dv")


def check_fwd_block_mask():
    """Block-sparse pair grid (round 4; VERDICT #8): prefix-LM family with
    partial blocks — pair tables, per-q-block init/epilogue triggers, and the
    in-kernel mask_fn re-evaluation all under Mosaic."""
    from flashattention_tpu.ops.flash import BlockMask, flash_attention
    from flashattention_tpu.ops.reference import DEFAULT_MASK_VALUE

    def prefix_lm(r, c):
        return (c < 192) | (c <= r)

    q, k, v = _qkv((2, 512, 64), seed=23)
    bm = BlockMask.from_mask_fn(prefix_lm, 512, 512, block_q=128, block_kv=128)
    o = flash_attention(q, k, v, block_mask=bm, interpret=False)
    sc = jnp.einsum("bqd,bkd->bqk", q, k, precision="highest")
    rows = jnp.arange(512)[:, None]
    cols = jnp.arange(512)[None, :]
    sc = jnp.where(prefix_lm(rows, cols)[None], sc, DEFAULT_MASK_VALUE)
    want = jnp.einsum(
        "bqk,bkd->bqd", jax.nn.softmax(sc, -1), v, precision="highest"
    )
    validate_result(o, want, TOL_FP32)


def check_fwd_quantized_kv():
    """int8 KV with fused in-kernel dequant == attention over dequantized KV
    (the scale folding into score columns / p rows under Mosaic)."""
    from flashattention_tpu.ops.flash import flash_attention
    from flashattention_tpu.ops.quant import dequantize, quantize_kv
    from flashattention_tpu.ops.reference import attention_reference

    q, k, v = _qkv((2, 512, 64), seed=24)
    kq, vq = quantize_kv(k, v, "int8")
    o = flash_attention(
        q, kq.payload, vq.payload, kq.scales, vq.scales, causal=True,
        interpret=False,
    )
    want = attention_reference(q, dequantize(kq), dequantize(vq), causal=True)
    validate_result(o, want, 5e-2)  # int8 payload noise dominates


def check_fwd_one_shot_stateless():
    """One-shot stateless path (single KV block, round 3): no scratch, direct
    store — must equal both the oracle and the scratch-recurrence path."""
    from flashattention_tpu.ops.flash import BlockSizes, flash_attention
    from flashattention_tpu.ops.reference import attention_reference

    q, k, v = _qkv((4, 1024, 64), jnp.bfloat16, seed=25)
    one = flash_attention(
        q, k, v, block_sizes=BlockSizes(512, 1024, 1024), interpret=False
    )
    validate_result(one, attention_reference(q, k, v), TOL_BF16)
    scratch = flash_attention(
        q, k, v, block_sizes=BlockSizes(512, 512, 512), interpret=False
    )
    # Different reduction orders (direct store vs alpha-rescale recurrence)
    # round differently in the bf16 output: agree to ~1 ULP, not bitwise.
    validate_result(one, scratch, TOL_BF16, name="one_shot vs scratch")


def check_fwd_lane_packed_d64():
    """Lane-packed fp32 at d=64 — the 2-pass [hi|lo] packing branch (d=32's
    4-group single pass is covered separately) with the packed MXU row sum."""
    from flashattention_tpu.ops.flash import flash_attention
    from flashattention_tpu.ops.reference import attention_reference_with_stats

    q, k, v = _qkv((4, 1024, 64), seed=26)
    o, l, m = flash_attention(q, k, v, save_residuals=True, interpret=False)
    want, lw, mw = attention_reference_with_stats(q, k, v)
    validate_result(o, want, TOL_FP32)
    validate_result(l, lw, 1e-3, name="l")
    validate_result(m, mw, 1e-4, name="m")


def check_decode_bf16():
    """Paged decode, unquantized bf16 (the int8 check covers fused dequant;
    this pins the plain payload path + GQA head layout under Mosaic)."""
    from flashattention_tpu.ops.decode import (
        paged_attention,
        paged_attention_reference,
    )

    b, kvh, g, d, ps, pps = 2, 2, 4, 128, 256, 2
    ks = jax.random.split(jax.random.key(27), 3)
    q = make_random(ks[0], (b, kvh, g, d), jnp.bfloat16)
    kp = make_random(ks[1], (b * pps + 1, kvh, ps, d), jnp.bfloat16)
    vp = make_random(ks[2], (b * pps + 1, kvh, ps, d), jnp.bfloat16)
    lengths = jnp.array([ps * pps, ps + 31], jnp.int32)
    pi = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
    o = paged_attention(q, kp, vp, lengths, pi)
    want = paged_attention_reference(q, kp, vp, lengths, pi)
    validate_result(o, want, TOL_BF16)


def check_fwd_large_head_dim():
    """d=256 (wide-head tuned path, round 3 #10): two MXU lane tiles per
    output row under Mosaic."""
    from flashattention_tpu.ops.flash import flash_attention
    from flashattention_tpu.ops.reference import attention_reference

    q, k, v = _qkv((2, 512, 256), jnp.bfloat16, seed=28)
    o = flash_attention(q, k, v, causal=True, interpret=False)
    validate_result(o, attention_reference(q, k, v, causal=True), TOL_BF16)


CHECKS = [
    check_fwd_fp32_default,
    check_fwd_bf16_causal,
    check_fwd_window_softcap_gqa,
    check_fwd_traced_offsets,
    check_fwd_lane_packed_d32,
    check_fwd_block_h_batched,
    check_fwd_windowed_tri_grid,
    check_fwd_dropout,
    check_fwd_segments,
    check_backward_dropout_segments,
    check_backward,
    check_paged_prefill_batched,
    check_paged_decode_int8,
    # Round 4 (VERDICT #6): the tuned paths previously compiled only inside
    # benchmarks, plus the new block-sparse grid.
    check_fwd_tri_grid_deep,
    check_backward_d128,
    check_fwd_block_mask,
    check_fwd_quantized_kv,
    check_fwd_one_shot_stateless,
    check_fwd_lane_packed_d64,
    check_decode_bf16,
    check_fwd_large_head_dim,
]


def run(verbose: bool = True):
    """Run the battery; returns (passed, failed, [(name, error), ...])."""
    passed, failures = 0, []
    for fn in CHECKS:
        name = fn.__name__
        try:
            fn()
            passed += 1
            if verbose:
                print(f"  selftest {name}: PASS", flush=True)
        except Exception as e:  # noqa: BLE001 — report, don't mask, any failure
            failures.append((name, f"{type(e).__name__}: {e}"))
            if verbose:
                print(f"  selftest {name}: FAIL {type(e).__name__}: {e}", flush=True)
    return passed, len(failures), failures


if __name__ == "__main__":
    import sys

    p, f, errs = run()
    print(f"compiled selftest: {p} passed, {f} failed")
    sys.exit(1 if f else 0)
