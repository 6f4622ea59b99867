"""L1 differential tests: Pallas flash kernel vs the jnp oracle.

Mirrors the reference's two-oracle strategy (SURVEY.md section 4): the llm.c
multi-config sweep (``attention_forward.cu:1253-1275``, tol 1e-4 fp32) and the
public-API randomized gate (``bench_flashattention.py:74``, atol 1e-1).
Runs in Pallas interpreter mode on CPU; identical code compiles on TPU.
"""

import jax
import jax.numpy as jnp
import pytest

from flashattention_tpu.ops.dispatch import attention, sdpa
from flashattention_tpu.ops.flash import BlockSizes, flash_attention, flash_attention_naive
from flashattention_tpu.ops.reference import (
    attention_reference,
    attention_reference_with_stats,
)
from flashattention_tpu.utils.testing import (
    TOL_BF16,
    TOL_FP32,
    make_random,
    validate_result,
)


def qkv(shape, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(seed), 3)
    return tuple(make_random(k, shape, dtype) for k in ks)


# ~ llm.c block-size sweep: validate across kernel configs at fp32/1e-4.
@pytest.mark.parametrize(
    "blocks",
    [
        BlockSizes(128, 128, 128),
        BlockSizes(128, 256, 128),
        BlockSizes(256, 256, 256),
        BlockSizes(128, 512, 256),
    ],
)
@pytest.mark.parametrize("causal", [False, True])
def test_block_size_sweep(blocks, causal):
    q, k, v = qkv((2, 512, 64), seed=1)
    o = flash_attention(q, k, v, causal=causal, block_sizes=blocks)
    want = attention_reference(q, k, v, causal=causal)
    validate_result(o, want, TOL_FP32)


@pytest.mark.parametrize("d", [32, 64, 128])
@pytest.mark.parametrize("causal", [False, True])
def test_head_dims(d, causal):
    q, k, v = qkv((3, 256, d), seed=2)
    o = flash_attention(q, k, v, causal=causal, block_sizes=BlockSizes(128, 128, 128))
    want = attention_reference(q, k, v, causal=causal)
    validate_result(o, want, TOL_FP32)


def test_scale():
    q, k, v = qkv((2, 256, 64), seed=3)
    scale = 64**-0.5
    o = flash_attention(q, k, v, scale=scale, block_sizes=BlockSizes(128, 128, 128))
    want = attention_reference(q, k, v, scale=scale)
    validate_result(o, want, TOL_FP32)


def test_bf16():
    q, k, v = qkv((2, 256, 64), seed=4, dtype=jnp.bfloat16)
    o = flash_attention(q, k, v, causal=True, block_sizes=BlockSizes(128, 128, 128))
    want = attention_reference(q, k, v, causal=True)
    validate_result(o, want, TOL_BF16)


def test_residuals_match_reference():
    q, k, v = qkv((2, 256, 32), seed=5)
    o, l, m = flash_attention(
        q, k, v, save_residuals=True, block_sizes=BlockSizes(128, 128, 128)
    )
    want_o, want_l, want_m = attention_reference_with_stats(q, k, v)
    validate_result(o, want_o, TOL_FP32)
    validate_result(m, want_m, TOL_FP32, name="m")
    # l is sum(exp(s - m)); compare in log space for stability.
    validate_result(jnp.log(l), jnp.log(want_l), 1e-3, name="log_l")


def test_kv_len_ragged_tail():
    # Padded KV columns must not pollute the softmax (the reference bug the
    # build consciously fixes; SURVEY.md "behavioral contracts").
    q, k, v = qkv((2, 128, 64), seed=6)
    kp = jnp.pad(k, ((0, 0), (0, 128), (0, 0)), constant_values=7.0)
    vp = jnp.pad(v, ((0, 0), (0, 128), (0, 0)), constant_values=7.0)
    o = flash_attention(
        q, kp, vp, kv_len=128, block_sizes=BlockSizes(128, 128, 128)
    )
    want = attention_reference(q, k, v)
    validate_result(o, want, TOL_FP32)


def test_cross_attention_shapes():
    # S_q != S_kv.
    q = make_random(jax.random.key(20), (2, 128, 64))
    k = make_random(jax.random.key(21), (2, 384, 64))
    v = make_random(jax.random.key(22), (2, 384, 64))
    o = flash_attention(q, k, v, block_sizes=BlockSizes(128, 128, 128))
    want = attention_reference(q, k, v)
    validate_result(o, want, TOL_FP32)


def test_q_offset_decode_alignment():
    # Suffix queries against full KV with causal masking (decode convention).
    q = make_random(jax.random.key(23), (2, 128, 64))
    k = make_random(jax.random.key(24), (2, 256, 64))
    v = make_random(jax.random.key(25), (2, 256, 64))
    o = flash_attention(
        q, k, v, causal=True, q_offset=128, block_sizes=BlockSizes(128, 128, 128)
    )
    want = attention_reference(q, k, v, causal=True, q_offset=128)
    validate_result(o, want, TOL_FP32)


def test_naive_kernel_matches():
    q, k, v = qkv((2, 256, 64), seed=7)
    for causal in (False, True):
        o = flash_attention_naive(q, k, v, causal=causal)
        want = attention_reference(q, k, v, causal=causal)
        validate_result(o, want, TOL_FP32)


# ── public dispatch API ──────────────────────────────────────────────────────


def test_attention_4d_and_3d_agree():
    b, h, s, d = 2, 3, 128, 32
    q4 = make_random(jax.random.key(30), (b, h, s, d))
    k4 = make_random(jax.random.key(31), (b, h, s, d))
    v4 = make_random(jax.random.key(32), (b, h, s, d))
    o4 = attention(q4, k4, v4, causal=True)
    o3 = attention(
        q4.reshape(b * h, s, d), k4.reshape(b * h, s, d), v4.reshape(b * h, s, d),
        causal=True,
    )
    validate_result(o4, o3.reshape(b, h, s, d), 1e-6)
    assert o4.shape == (b, h, s, d)


@pytest.mark.parametrize("s", [100, 128, 200, 384])
def test_attention_unaligned_lengths(s):
    # Public API pads internally; any sequence length must work.
    q, k, v = qkv((2, s, 64), seed=8)
    for causal in (False, True):
        o = attention(q, k, v, causal=causal)
        want = attention_reference(q, k, v, causal=causal)
        validate_result(o, want, TOL_FP32)


def test_attention_xla_fallback():
    q, k, v = qkv((2, 100, 64), seed=9)
    o = attention(q, k, v, causal=True, implementation="xla")
    want = attention_reference(q, k, v, causal=True)
    validate_result(o, want, 1e-6)


def test_sdpa_applies_scale():
    q, k, v = qkv((2, 128, 64), seed=10)
    o = sdpa(q, k, v)
    want = attention_reference(q, k, v, scale=64**-0.5)
    validate_result(o, want, TOL_FP32)


def test_attention_save_residuals_shape():
    b, h, s, d = 2, 2, 150, 32
    q = make_random(jax.random.key(40), (b, h, s, d))
    k = make_random(jax.random.key(41), (b, h, s, d))
    v = make_random(jax.random.key(42), (b, h, s, d))
    o, l, m = attention(q, k, v, causal=True, save_residuals=True)
    assert o.shape == (b, h, s, d)
    assert l.shape == (b, h, s)
    assert m.shape == (b, h, s)
    _, want_l, want_m = attention_reference_with_stats(
        q.reshape(b * h, s, d), k.reshape(b * h, s, d), v.reshape(b * h, s, d),
        causal=True,
    )
    validate_result(m, want_m.reshape(b, h, s), TOL_FP32, name="m")
    # l is the ring-attention merge state: padded KV columns must not leak in.
    validate_result(
        l / want_l.reshape(b, h, s), jnp.ones_like(l), 1e-4, name="l-ratio"
    )


# ── grouped-query attention (GQA row folding) ───────────────────────────────


@pytest.mark.parametrize(
    "b,hq,hkv,s,skv,causal",
    [
        (2, 8, 2, 256, 256, True),
        (2, 8, 2, 256, 256, False),
        (2, 6, 2, 200, 200, True),  # ragged segments
        (1, 4, 2, 64, 192, True),  # decode-suffix alignment
    ],
)
def test_gqa_matches_repeated_kv(b, hq, hkv, s, skv, causal):
    """GQA folding == materialized repeated-KV run at identical precision."""
    d = 64
    ks = jax.random.split(jax.random.key(b * 100 + hq), 3)
    q = make_random(ks[0], (b, hq, s, d))
    k = make_random(ks[1], (b, hkv, skv, d))
    v = make_random(ks[2], (b, hkv, skv, d))
    o = attention(q, k, v, causal=causal)
    g = hq // hkv
    kr = jnp.repeat(k, g, axis=1)
    vr = jnp.repeat(v, g, axis=1)
    want = attention(q, kr, vr, causal=causal)
    validate_result(o, want, 1e-6)


def test_gqa_matches_oracle_exact():
    """GQA vs the jnp oracle at exact fp32 precision (logic, not rounding)."""
    b, hq, hkv, s, d = 2, 8, 2, 256, 64
    ks = jax.random.split(jax.random.key(7), 3)
    q = make_random(ks[0], (b, hq, s, d))
    k = make_random(ks[1], (b, hkv, s, d))
    v = make_random(ks[2], (b, hkv, s, d))
    o = attention(q, k, v, causal=True, precision="float32")
    g = hq // hkv
    want = attention(
        q,
        jnp.repeat(k, g, axis=1),
        jnp.repeat(v, g, axis=1),
        causal=True,
        implementation="xla",
    )
    validate_result(o, want, 1e-5)


# ── lane-packed fp32 emulation (round-2: VERDICT #1/#2) ─────────────────────


@pytest.mark.parametrize("d", [32, 48, 64])
@pytest.mark.parametrize("causal", [False, True])
def test_packed_fp32_more_accurate_than_bf16(d, causal):
    """The packed [hi|lo] schedule (auto for fp32, d<=64) must stay within
    the kernel-lab tolerance AND beat bf16-rounded inputs by >=10x (i.e. it
    genuinely recovers fp32 operand precision, like bf16_3x did)."""
    q, k, v = qkv((2, 256, d), seed=11)
    scale = d**-0.5
    want = attention_reference(q, k, v, causal=causal, scale=scale)
    bs = BlockSizes(128, 128, 128)
    o = flash_attention(q, k, v, causal=causal, scale=scale, block_sizes=bs)
    o1 = flash_attention(
        q.astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        causal=causal,
        scale=scale,
        block_sizes=bs,
    )
    err = float(jnp.max(jnp.abs(o - want)))
    err1 = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - want)))
    assert err <= TOL_FP32, err
    assert err * 10 <= err1, (err, err1)


def test_packed_fp32_residuals_and_gqa():
    """Packed path: (l, m) residuals and GQA row folding stay correct."""
    d, seg, groups = 64, 128, 2
    q, _, _ = qkv((2, seg * groups, d), seed=12)
    _, k, v = qkv((2, seg, d), seed=13)
    bs = BlockSizes(128, 128, 128)
    o, l, m = flash_attention(
        q, k, v, causal=True, q_seq_len=seg, save_residuals=True, block_sizes=bs
    )
    for g in range(groups):
        sl = slice(g * seg, (g + 1) * seg)
        want, lw, mw = attention_reference_with_stats(q[:, sl], k, v, causal=True)
        validate_result(o[:, sl], want, TOL_FP32, name=f"o{g}")
        validate_result(l[:, sl] / lw, jnp.ones_like(lw), 1e-4, name=f"l{g}")
        validate_result(m[:, sl], mw, 1e-4, name=f"m{g}")


@pytest.mark.parametrize("d", [192, 256])
def test_large_head_dims(d):
    """d > 128 (e.g. 256-dim heads): no tuned lane tricks apply, but the
    kernel must stay correct (round-2 coverage; VERDICT missing #2).  The
    SDPA scale keeps score magnitudes O(1) so the fp32-emulation tolerance
    is meaningful across d."""
    q, k, v = qkv((2, 256, d), seed=21)
    scale = d**-0.5
    for causal in (False, True):
        o = flash_attention(
            q, k, v, causal=causal, scale=scale,
            block_sizes=BlockSizes(128, 128, 128),
        )
        want = attention_reference(q, k, v, causal=causal, scale=scale)
        validate_result(o, want, TOL_FP32)


def test_triangular_grid_engages_with_explicit_zero_offset():
    """The triangular causal grid must activate for q_offset passed as a
    concrete 0 (the public dispatch path always names the kwarg) — the
    eligibility check lives OUTSIDE the jit boundary (round-2 review)."""
    q, k, v = qkv((2, 1024, 64), seed=30)
    bs = BlockSizes(256, 256, 256)  # nq = 4 -> 10 below-diagonal pairs
    for fn in (
        lambda: flash_attention(q, k, v, causal=True, block_sizes=bs),
        lambda: flash_attention(q, k, v, causal=True, q_offset=0, block_sizes=bs),
    ):
        text = str(jax.make_jaxpr(fn)())
        assert "i32[10]" in text, "pair tables absent: tri grid not engaged"
    # ...and must NOT activate for a traced offset (falls back cleanly).
    text = str(
        jax.make_jaxpr(
            lambda off: flash_attention(
                q, k, v, causal=True, q_offset=off, block_sizes=bs
            )
        )(jnp.int32(0))
    )
    assert "i32[10]" not in text


# ── sliding-window attention + logit softcap (round 2) ──────────────────────


@pytest.mark.parametrize("window,cap", [(160, None), (None, 25.0), (160, 25.0)])
def test_window_and_softcap_forward(window, cap):
    """Sliding window (Mistral-style) and logit softcap (Gemma-2-style) vs
    the oracle, incl. the combined case and a decode-suffix offset."""
    q, k, v = qkv((2, 512, 64), seed=41)
    bs = BlockSizes(128, 128, 128)
    kw = dict(causal=True, scale=0.125, window=window, logit_softcap=cap)
    o = flash_attention(q, k, v, block_sizes=bs, **kw)
    want = attention_reference(q, k, v, **kw)
    validate_result(o, want, TOL_FP32)
    o2 = flash_attention(q[:, :128], k, v, q_offset=384, block_sizes=bs, **kw)
    want2 = attention_reference(q[:, :128], k, v, q_offset=384, **kw)
    validate_result(o2, want2, TOL_FP32)


def test_window_softcap_dispatch_and_gqa():
    """Public API: 4D GQA + window + softcap against the repeated-KV oracle."""
    b, hq, hkv, s, d = 2, 4, 2, 300, 64
    ks = jax.random.split(jax.random.key(42), 3)
    q = make_random(ks[0], (b, hq, s, d))
    k = make_random(ks[1], (b, hkv, s, d))
    v = make_random(ks[2], (b, hkv, s, d))
    kw = dict(causal=True, scale=d**-0.5, window=130, logit_softcap=40.0)
    o = attention(q, k, v, **kw)
    want = attention(q, k, v, implementation="xla", **kw)
    validate_result(o, want, TOL_FP32)


def test_window_softcap_gradients_match_oracle_autodiff():
    from flashattention_tpu.ops.backward import attention_vjp

    q, k, v = qkv((2, 256, 32), seed=43)
    do = make_random(jax.random.key(44), q.shape)
    bs = BlockSizes(128, 128, 128)
    f = lambda q, k, v: (
        attention_vjp(q, k, v, True, 0.125, bs, None, None, None, 140, 25.0) * do
    ).sum()
    fr = lambda q, k, v: (
        attention_reference(
            q, k, v, causal=True, scale=0.125, window=140, logit_softcap=25.0
        )
        * do
    ).sum()
    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("dq dk dv".split(), g, gr):
        validate_result(a, b, 5e-4, name=name)


@pytest.mark.parametrize("block_h", [2, 8])
def test_block_h_matches_unbatched(block_h):
    """Head batching (block_h, VERDICT #4) is bit-identical to block_h=1:
    heads are independent and the per-head compute/order is unchanged."""
    q, k, v = qkv((16, 512, 64), seed=7)
    for kw in (
        {},
        {"causal": True},
        {"save_residuals": True},
        {"kv_len": jnp.int32(300)},
        {"causal": True, "window": 200},
    ):
        bs1 = BlockSizes(256, 256, 256)
        bsh = BlockSizes(256, 256, 256, block_h=block_h)
        a = flash_attention(q, k, v, block_sizes=bsh, **kw)
        b = flash_attention(q, k, v, block_sizes=bs1, **kw)
        a = a if isinstance(a, tuple) else (a,)
        b = b if isinstance(b, tuple) else (b,)
        for x, y in zip(a, b):
            assert jnp.array_equal(x, y), kw


def test_block_h_fit_triggers_small_s_only():
    assert BlockSizes.fit(1024, 1024, 64, n_heads=128).block_h == 8
    assert BlockSizes.fit(8192, 8192, 64, n_heads=16).block_h == 1
    assert BlockSizes.fit(1024, 1024, 64).block_h == 1
    # non-dividing head counts degrade gracefully
    assert BlockSizes.fit(1024, 1024, 64, n_heads=7).block_h == 7
    assert BlockSizes.fit(1024, 1024, 64, n_heads=13).block_h == 1


def test_fit_small_packed_fp32_regime():
    # Round 5 (VERDICT r4 #3): the lane-packed fp32 small-shape winner from
    # measurements/probe_small_fp32.txt — bq=512 with the full 8-head fold —
    # must be what fit() picks at the reference's BH=128 S=1024 d=64 shape.
    bs = BlockSizes.fit(1024, 1024, 64, "bf16_3x", False, n_heads=128)
    assert (bs.block_q, bs.block_h, bs.pv_split) == (512, 8, 4)
    # d=32 measured the opposite (bq=1024 wins); bf16 and causal unaffected.
    assert BlockSizes.fit(1024, 1024, 32, "bf16_3x", False, n_heads=128).block_q == 1024
    assert BlockSizes.fit(1024, 1024, 64, "bf16", False, n_heads=128).block_q == 1024
    assert BlockSizes.fit(1024, 1024, 64, "bf16_3x", True, n_heads=128).block_q == 1024
    # the backward's fit calls never pass n_heads: untouched
    assert BlockSizes.fit(1024, 1024, 64, "bf16_3x", False).block_q == 1024


def test_fit_wide_dma_substripe_d128_regime():
    # Round 5 (probe_d128_s4096.txt): d=128 long-S non-causal bf16 runs
    # 4096-wide KV DMA blocks computed in 2048 substripes (160.6 vs 141
    # TF/s); explicit caller caps and other shapes keep bkc == bkv.
    bs = BlockSizes.fit(4096, 4096, 128, "bf16", False, n_heads=64)
    assert (bs.block_kv, bs.block_kv_compute) == (4096, 2048)
    assert BlockSizes.fit(2048, 2048, 128, "bf16", False).block_kv == 2048
    bwd = BlockSizes.fit(4096, 4096, 128, "bf16", False,
                         max_block_q=1024, max_block_kv=1024)
    assert (bwd.block_kv, bwd.block_kv_compute) == (1024, 1024)
    caus = BlockSizes.fit(4096, 4096, 128, "bf16", True)
    assert caus.block_kv == caus.block_kv_compute


def test_block_h_must_divide_heads():
    q, k, v = qkv((6, 256, 64), seed=8)
    with pytest.raises(ValueError, match="block_h"):
        flash_attention(q, k, v, block_sizes=BlockSizes(256, 256, 256, block_h=4))


def test_windowed_triangular_grid():
    """Sliding-window causal runs use the triangular pair grid too (round 3):
    pairs fully before the window band never enter the pipeline, and the
    scratch init fires at each q row's FIRST in-window kv block."""
    q, k, v = qkv((2, 1024, 64), seed=31)
    bs = BlockSizes(128, 128, 128)  # nq = 8
    # window=256: row i needs kv blocks [max(0, (128i-255)//128), i] — count
    # them to pin the expected pair-table length.
    expect = sum(i - max(0, (128 * i - 255) // 128) + 1 for i in range(8))
    text = str(
        jax.make_jaxpr(
            lambda: flash_attention(q, k, v, causal=True, window=256, block_sizes=bs)
        )()
    )
    assert f"i32[{expect}]" in text, "windowed tri grid not engaged"
    o = flash_attention(q, k, v, causal=True, window=256, block_sizes=bs)
    r = attention_reference(q, k, v, causal=True, window=256)
    validate_result(o, r, TOL_FP32)
    # Window larger than S degenerates to plain causal: same table as no-window.
    o = flash_attention(q, k, v, causal=True, window=5000, block_sizes=bs)
    r = attention_reference(q, k, v, causal=True, window=5000)
    validate_result(o, r, TOL_FP32)
