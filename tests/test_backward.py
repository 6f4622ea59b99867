"""Backward-pass differential tests: Pallas flash backward vs jnp autodiff."""

import jax
import jax.numpy as jnp
import pytest

from flashattention_tpu.ops.backward import attention_vjp, flash_attention_bwd
from flashattention_tpu.ops.flash import BlockSizes
from flashattention_tpu.ops.reference import attention_reference
from flashattention_tpu.utils.testing import make_random, validate_result

BLOCKS = BlockSizes(128, 128, 128)
TOL = 5e-4  # grad accumulation tolerance, fp32


def qkv(shape, seed=0):
    ks = jax.random.split(jax.random.key(seed), 4)
    return tuple(make_random(k, shape) for k in ks)


def loss_ref(q, k, v, causal, scale, t):
    o = attention_reference(q, k, v, causal=causal, scale=scale)
    return jnp.sum(o * t)


def loss_flash(q, k, v, causal, scale, t):
    o = attention_vjp(q, k, v, causal, scale, BLOCKS)
    return jnp.sum(o * t)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("scale", [1.0, 0.125])
def test_grads_match_autodiff(causal, scale):
    q, k, v, t = qkv((2, 256, 64), seed=1)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v, causal, scale, t)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v, causal, scale, t)
    for name, a, b in zip("qkv", g_fl, g_ref):
        validate_result(a, b, TOL, name=f"d{name}")


@pytest.mark.parametrize("split", [2, 4])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_bwd_acc_split_parity(dtype, split):
    # acc_split (round 4): splitting the dQ/dK/dV accumulation chains into
    # independent partial sums must be numerically benign — same split-level
    # tolerance story as the forward's pv_split.  fp32 inputs resolve to the
    # lane-packed path, so the fp32 x split>1 cases cover the
    # _csplit + _packed_fold combination (round-4 advisor finding); the bf16
    # cases cover the unpacked _dot_g combination.
    from flashattention_tpu.ops.flash import flash_attention

    ks = jax.random.split(jax.random.key(7), 4)
    q, k, v, do = (make_random(kk, (2, 512, 64), dtype) for kk in ks)
    blocks = BlockSizes(256, 256, 256)
    o, l, m = flash_attention(
        q, k, v, causal=True, save_residuals=True, block_sizes=blocks
    )
    lse = m + jnp.log(jnp.where(l == 0.0, 1.0, l))
    ref = flash_attention_bwd(
        q, k, v, o, lse, do, causal=True, block_sizes=blocks
    )
    # Block shape must admit the split on BOTH axes (the dq kernels split
    # block_kv, the dkv kernels split block_q — advisor r4 finding).
    b = 128 * split
    split_bs = BlockSizes(b, b, b, 1, split)
    out = flash_attention_bwd(
        q, k, v, o, lse, do, causal=True, block_sizes=split_bs
    )
    tol = TOL if dtype == jnp.float32 else 2e-2
    for name, a, b in zip(("dq", "dk", "dv"), out, ref):
        validate_result(a, b, tol, name=name)


def test_grads_head_dim_32():
    q, k, v, t = qkv((3, 128, 32), seed=2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v, True, 1.0, t)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v, True, 1.0, t)
    for name, a, b in zip("qkv", g_fl, g_ref):
        validate_result(a, b, TOL, name=f"d{name}")


def test_bwd_kernel_direct():
    # Exercise flash_attention_bwd directly against autodiff of the oracle.
    from flashattention_tpu.ops.flash import flash_attention

    q, k, v, t = qkv((2, 128, 64), seed=3)
    o, l, m = flash_attention(
        q, k, v, causal=True, save_residuals=True, block_sizes=BLOCKS
    )
    lse = m + jnp.log(l)
    do = t
    dq, dk, dv = flash_attention_bwd(
        q, k, v, o, lse, do, causal=True, block_sizes=BLOCKS
    )
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v, True, 1.0, t)
    validate_result(dq, g_ref[0], TOL, name="dq")
    validate_result(dk, g_ref[1], TOL, name="dk")
    validate_result(dv, g_ref[2], TOL, name="dv")


def test_value_and_grad_bf16():
    ks = jax.random.split(jax.random.key(4), 4)
    q, k, v, t = (make_random(kk, (2, 256, 64), jnp.bfloat16) for kk in ks)
    val, grads = jax.value_and_grad(loss_flash, argnums=(0, 1, 2))(
        q, k, v, True, 0.125, t
    )
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v, True, 0.125, t)
    for name, a, b in zip("qkv", grads, g_ref):
        validate_result(
            a.astype(jnp.float32), b.astype(jnp.float32), 5e-2, name=f"d{name}"
        )


def test_vjp_gqa_fold_matches_repeated_kv():
    """Grads through the GQA row fold == grads through repeated-KV heads.

    s=256 with 128-wide blocks gives q_seq_blocks=2 and 2 KV blocks, so the
    rem-based causal block skip and intra-segment q_pos masking both
    exercise their non-degenerate paths.
    """
    bhkv, g, s, d = 2, 4, 256, 32
    ks = jax.random.split(jax.random.key(11), 3)
    q = make_random(ks[0], (bhkv, g * s, d))
    k = make_random(ks[1], (bhkv, s, d))
    v = make_random(ks[2], (bhkv, s, d))

    def loss_fold(q, k, v):
        o = attention_vjp(q, k, v, True, d**-0.5, BLOCKS, None, None, s)
        return jnp.sum(o * o)

    def loss_rep(q, k, v):
        # Expand each KV head g times; q rows regroup to (bhkv*g, s, d).
        qr = q.reshape(bhkv, g, s, d).reshape(bhkv * g, s, d)
        kr = jnp.repeat(k[:, None], g, 1).reshape(bhkv * g, s, d)
        vr = jnp.repeat(v[:, None], g, 1).reshape(bhkv * g, s, d)
        o = attention_vjp(qr, kr, vr, True, d**-0.5, BLOCKS, None, None, None)
        return jnp.sum(o * o)

    g1 = jax.grad(loss_fold, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_rep, argnums=(0, 1, 2))(q, k, v)
    # dq reshapes; dk/dv of the repeated run sum over the g copies.
    validate_result(g1[0], g2[0].reshape(bhkv, g * s, d), TOL)
    validate_result(g1[1], g2[1], TOL)
    validate_result(g1[2], g2[2], TOL)


def test_bwd_default_blocks_non_power_of_two_seq():
    """S=768 fits a 768-wide forward block; the backward's 512 cap must
    re-fit (not naively clamp) or the divisibility check explodes."""
    q, k, v, t = qkv((2, 768, 32), seed=3)
    o = attention_vjp(q, k, v, True, 1.0, None)  # default blocks end-to-end
    assert o.shape == q.shape
    g = jax.grad(lambda q: jnp.sum(attention_vjp(q, k, v, True, 1.0, None) * t))(q)
    assert g.shape == q.shape


def test_fused_bwd_matches_two_pass():
    """The one-pass fused backward == the two-pass kernels exactly-ish
    (same matmul precision, different accumulation order), incl. GQA fold
    and causal q_offset (round 2; VERDICT #7)."""
    import jax
    import jax.numpy as jnp

    from flashattention_tpu.ops.flash import flash_attention
    from flashattention_tpu.ops.backward import flash_attention_bwd
    from flashattention_tpu.utils.testing import make_random, validate_result

    for (bh, sq, skv, d, seg, off) in [
        (2, 256, 256, 64, None, 0),
        (2, 512, 256, 64, 256, 0),  # GQA fold: 2 groups
        (1, 128, 256, 32, None, 128),  # decode-suffix offset
    ]:
        ks = jax.random.split(jax.random.key(bh * sq + d), 4)
        q = make_random(ks[0], (bh, sq, d))
        k = make_random(ks[1], (bh, skv, d))
        v = make_random(ks[2], (bh, skv, d))
        do = make_random(ks[3], (bh, sq, d))
        o, l, m = flash_attention(
            q, k, v, causal=True, q_offset=off, q_seq_len=seg,
            save_residuals=True,
        )
        lse = m + jnp.log(jnp.where(l == 0.0, 1.0, l))
        kw = dict(causal=True, q_offset=off, q_seq_len=seg)
        g_fused = flash_attention_bwd(q, k, v, o, lse, do, fused=True, **kw)
        g_two = flash_attention_bwd(q, k, v, o, lse, do, fused=False, **kw)
        for name, a, b in zip("dq dk dv".split(), g_fused, g_two):
            # 5e-5 not 1e-5: at d <= 64 the two-pass kernels run the lane-
            # packed schedule (round 3), which keeps the lo*lo term bf16_3x
            # (still used by the fused kernel) drops — a small one-sided
            # precision improvement, not an accumulation-order artifact.
            validate_result(a, b, 5e-5, name=f"{name}@{(bh,sq,skv,d,seg,off)}")
