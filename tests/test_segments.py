"""Packed-sequence (segment-ids) attention: forward + VJP.

Training frameworks pack short documents into fixed-length rows; attention
must not cross document boundaries.  Design under test (round 3): per-row
q/kv segment ids stream into the kernels as a (bq, 1) sublane column and a
(1, bkv) lane row, so the same-segment mask is one broadcast compare —
no O(S^2) mask in HBM, composing with causal (the triangular pair grid),
dropout, and the precision ladder.  The reference has no packing (single
dense sequence per launch); this is framework scope.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flashattention_tpu.ops.flash as F
from flashattention_tpu.ops.backward import attention_vjp

BS = F.BlockSizes(128, 128, 128)


def seg_pattern(s):
    """Three packed docs: 100 + 156 + the rest."""
    out = np.zeros(s, np.int32)
    out[100:] = 1
    if s > 256:
        out[256:] = 2
    return jnp.asarray(out)


def oracle(q, k, v, seg_q, seg_kv, *, causal, scale):
    s_q, s_kv = q.shape[1], k.shape[1]
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s * scale
    m = seg_q[:, None] == seg_kv[None, :]
    if causal:
        m = m & (np.arange(s_q)[:, None] >= np.arange(s_kv)[None, :])
    s = jnp.where(m[None], s, -1e30)
    return jnp.einsum(
        "bqk,bkd->bqd", jax.nn.softmax(s, axis=-1), v.astype(jnp.float32)
    )


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_segment_oracle(causal, dtype):
    bh, s, d = 4, 256, 64
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(kk, (bh, s, d)).astype(dtype) for kk in ks)
    seg = seg_pattern(s)
    segs = jnp.broadcast_to(seg, (bh, s))
    o = F.flash_attention(
        q, k, v, causal=causal, scale=d**-0.5, block_sizes=BS,
        q_segment_ids=segs, kv_segment_ids=segs,
    )
    want = oracle(q, k, v, seg, seg, causal=causal, scale=d**-0.5)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    assert float(jnp.max(jnp.abs(o.astype(jnp.float32) - want))) < tol


@pytest.mark.parametrize("causal", [False, True])
def test_vjp_matches_segment_oracle_grads(causal):
    bh, s, d = 4, 256, 64
    ks = jax.random.split(jax.random.key(2), 4)
    q, k, v = (jax.random.normal(kk, (bh, s, d)) for kk in ks[:3])
    do = jax.random.normal(ks[3], (bh, s, d))
    seg = seg_pattern(s)
    segs = jnp.broadcast_to(seg, (bh, s))
    scale = d**-0.5

    def loss_or(q, k, v):
        return jnp.sum(oracle(q, k, v, seg, seg, causal=causal, scale=scale) * do)

    def loss_fa(q, k, v):
        o = attention_vjp(
            q, k, v, causal, scale, BS, "float32", None, None, None, None,
            None, 0, segs, segs,
        )
        return jnp.sum(o * do)

    g_or = jax.grad(loss_or, argnums=(0, 1, 2))(q, k, v)
    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_or, g_fa):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4, name


def test_packed_equals_separate_docs():
    """THE packing contract: a packed row computes, per document, exactly the
    attention each document gets when run alone (causal, absolute positions
    shift both rows and cols equally, so the mask is translation-invariant
    within a segment)."""
    bh, d = 2, 64
    la, lb = 128, 128
    ks = jax.random.split(jax.random.key(5), 3)
    q, k, v = (jax.random.normal(kk, (bh, la + lb, d)) for kk in ks)
    seg = jnp.asarray(np.r_[np.zeros(la, np.int32), np.ones(lb, np.int32)])
    segs = jnp.broadcast_to(seg, (bh, la + lb))
    packed = F.flash_attention(
        q, k, v, causal=True, scale=d**-0.5, block_sizes=BS,
        q_segment_ids=segs, kv_segment_ids=segs,
    )
    for sl in (slice(0, la), slice(la, la + lb)):
        solo = F.flash_attention(
            q[:, sl], k[:, sl], v[:, sl], causal=True, scale=d**-0.5,
            block_sizes=BS,
        )
        err = float(jnp.max(jnp.abs(packed[:, sl] - solo)))
        assert err < 1e-5, (sl, err)


def test_padding_segment_does_not_leak():
    """A trailing pad segment (unique id) never contributes to real rows."""
    bh, s, d = 2, 256, 64
    real = 200
    ks = jax.random.split(jax.random.key(7), 3)
    q, k, v = (jax.random.normal(kk, (bh, s, d)) for kk in ks)
    seg = jnp.asarray(
        np.r_[np.zeros(real, np.int32), np.full(s - real, -1, np.int32)]
    )
    segs = jnp.broadcast_to(seg, (bh, s))
    o = F.flash_attention(
        q, k, v, causal=True, scale=d**-0.5, block_sizes=BS,
        q_segment_ids=segs, kv_segment_ids=segs,
    )
    # Poison the pad K/V: real rows must not change.
    kp = k.at[:, real:].set(1e4)
    vp = v.at[:, real:].set(-1e4)
    o2 = F.flash_attention(
        q, kp, vp, causal=True, scale=d**-0.5, block_sizes=BS,
        q_segment_ids=segs, kv_segment_ids=segs,
    )
    assert float(jnp.max(jnp.abs(o[:, :real] - o2[:, :real]))) < 1e-6


def test_segments_compose_with_dropout():
    bh, s, d = 2, 256, 64
    rate, seed = 0.2, 31
    scale = d**-0.5
    ks = jax.random.split(jax.random.key(9), 4)
    q, k, v = (jax.random.normal(kk, (bh, s, d)) for kk in ks[:3])
    do = jax.random.normal(ks[3], (bh, s, d))
    seg = seg_pattern(s)
    segs = jnp.broadcast_to(seg, (bh, s))
    keeps = jnp.stack([
        F.dropout_keep_mask(seed, b, 0, 0, (s, s), rate) for b in range(bh)
    ])

    def loss_or(q, k, v):
        sc = jnp.einsum("bqd,bkd->bqk", q, k) * scale
        m = (seg[:, None] == seg[None, :]) & (
            np.arange(s)[:, None] >= np.arange(s)[None, :]
        )
        sc = jnp.where(m[None], sc, -1e30)
        p = jax.nn.softmax(sc, axis=-1)
        z = jnp.where(keeps, p, 0.0) / (1 - rate)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", z, v) * do)

    def loss_fa(q, k, v):
        o = attention_vjp(
            q, k, v, True, scale, BS, "float32", None, None, None, None,
            rate, seed, segs, segs,
        )
        return jnp.sum(o * do)

    g_or = jax.grad(loss_or, argnums=(0, 1, 2))(q, k, v)
    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_or, g_fa):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4, name


def test_segment_validation():
    bh, s, d = 2, 256, 64
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(kk, (bh, s, d)) for kk in ks)
    segs = jnp.zeros((bh, s), jnp.int32)
    with pytest.raises(ValueError, match="together"):
        F.flash_attention(q, k, v, block_sizes=BS, q_segment_ids=segs)
    with pytest.raises(ValueError, match="q_segment_ids"):
        F.flash_attention(
            q, k, v, block_sizes=BS,
            q_segment_ids=segs[:, :128], kv_segment_ids=segs,
        )


# ── packed training step ─────────────────────────────────────────────────────


def _mesh11():
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "tp"))


def _tiny_cfg():
    from flashattention_tpu.models import transformer

    return transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )


def test_packed_positions():
    from flashattention_tpu.models.train import packed_positions

    seg = jnp.asarray([[0, 0, 0, 1, 1, 2, 2, 2], [5, 5, 5, 5, -1, -1, -1, -1]])
    pos = packed_positions(seg)
    want = [[0, 1, 2, 0, 1, 0, 1, 2], [0, 1, 2, 3, 0, 1, 2, 3]]
    assert pos.tolist() == want


def test_packed_train_step_equals_padded_rows():
    """One row packing [docA | docB] produces the same loss as two rows
    [docA | pad] + [docB | pad]: same valid-token set, same per-doc RoPE
    positions, no cross-document attention."""
    from flashattention_tpu.models import transformer
    from flashattention_tpu.models.train import (
        make_train_step_packed, shard_params,
    )

    cfg = _tiny_cfg()
    params = transformer.init_params(jax.random.key(0), cfg)
    mesh = _mesh11()
    params = shard_params(params, mesh, cfg)
    step = make_train_step_packed(mesh, cfg, lr=1e-2)

    ka, kb = jax.random.split(jax.random.key(1))
    doc_a = jax.random.randint(ka, (128,), 0, cfg.vocab_size)
    doc_b = jax.random.randint(kb, (128,), 0, cfg.vocab_size)

    packed_tokens = jnp.concatenate([doc_a, doc_b])[None]  # (1, 256)
    packed_seg = jnp.concatenate(
        [jnp.zeros(128, jnp.int32), jnp.ones(128, jnp.int32)]
    )[None]

    pad = jnp.zeros(128, jnp.int32)
    row_tokens = jnp.stack(
        [jnp.concatenate([doc_a, pad]), jnp.concatenate([doc_b, pad])]
    )  # (2, 256)
    row_seg = jnp.stack([
        jnp.concatenate([jnp.zeros(128, jnp.int32), jnp.full(128, -1, jnp.int32)]),
        jnp.concatenate([jnp.ones(128, jnp.int32), jnp.full(128, -2, jnp.int32)]),
    ])

    loss_packed, _ = step(params, packed_tokens, packed_seg)
    loss_rows, _ = step(params, row_tokens, row_seg)
    assert float(loss_packed) == pytest.approx(float(loss_rows), rel=1e-6)


def test_packed_train_step_learns_with_dropout():
    from flashattention_tpu.models import transformer
    from flashattention_tpu.models.train import (
        make_train_step_packed, shard_params,
    )

    cfg = _tiny_cfg()
    params = transformer.init_params(jax.random.key(0), cfg)
    mesh = _mesh11()
    params = shard_params(params, mesh, cfg)
    step = make_train_step_packed(mesh, cfg, lr=5e-2, attn_dropout=0.1)
    tokens = jax.random.randint(jax.random.key(2), (2, 256), 0, cfg.vocab_size)
    seg = jnp.broadcast_to(
        jnp.concatenate([jnp.zeros(128, jnp.int32), jnp.ones(128, jnp.int32)]),
        (2, 256),
    )
    losses = []
    for i in range(5):
        loss, params = step(params, tokens, seg, i)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


# ── document packing utility ─────────────────────────────────────────────────


def test_pack_documents_roundtrip_and_train():
    from flashattention_tpu.models.train import (
        make_train_step_packed, shard_params,
    )
    from flashattention_tpu.models import transformer
    from flashattention_tpu.utils.packing import PAD_SEGMENT, pack_documents

    rng = np.random.default_rng(0)
    docs = [list(rng.integers(1, 60, size=n)) for n in (100, 60, 90, 30, 120, 56)]
    tokens, segs = pack_documents(docs, 128)
    assert tokens.shape == segs.shape and tokens.shape[1] == 128
    # Every document appears exactly once, contiguously, with one segment id.
    found = []
    for r in range(tokens.shape[0]):
        for seg in np.unique(segs[r]):
            if seg == PAD_SEGMENT:
                continue
            sel = segs[r] == seg
            idx = np.flatnonzero(sel)
            assert np.array_equal(idx, np.arange(idx[0], idx[-1] + 1))
            found.append(list(tokens[r][sel]))
    assert sorted(map(tuple, found)) == sorted(map(tuple, docs))
    # Padding is a contiguous tail, marked with the invalid segment id.
    for r in range(segs.shape[0]):
        pad = np.flatnonzero(segs[r] == PAD_SEGMENT)
        if len(pad):
            assert pad[0] + len(pad) == segs.shape[1]  # tail only
    # And the packed rows train end-to-end.
    cfg = _tiny_cfg()
    params = transformer.init_params(jax.random.key(0), cfg)
    mesh = _mesh11()
    params = shard_params(params, mesh, cfg)
    step = make_train_step_packed(mesh, cfg, lr=1e-2)
    loss, _ = step(params, jnp.asarray(tokens), jnp.asarray(segs))
    assert np.isfinite(float(loss))


def test_pack_documents_overflow():
    from flashattention_tpu.utils.packing import pack_documents

    with pytest.raises(ValueError, match="truncate"):
        pack_documents([list(range(300))], 128)
    toks, segs = pack_documents([list(range(300))], 128, truncate=True)
    assert toks.shape == (1, 128)
    assert list(toks[0]) == list(range(128))


# ── packed sequences through the SP ring (round 3) ───────────────────────────

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashattention_tpu.models import transformer


def test_packed_sp_matches_packed_single_device():
    """Packed rows on the DP x SP ring (kv-segment chunks rotate with their
    KV) == the packed single-device step: same masked loss and update, with
    documents crossing shard boundaries."""
    from flashattention_tpu.models.train import (
        make_train_step_packed, make_train_step_sp, shard_params,
    )

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    b, s = 2, 4 * 128
    tokens = jax.random.randint(jax.random.key(1), (b, s), 0, cfg.vocab_size)
    # Document boundaries deliberately NOT aligned to the 128-token shards,
    # plus a padding tail.
    seg = np.zeros((b, s), np.int32)
    seg[:, 200:] = 1
    seg[:, 390:] = 2
    seg[:, 480:] = -1
    segs = jnp.asarray(seg)

    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "tp"))
    p1 = shard_params(params, mesh1, cfg)
    t1 = jax.device_put(tokens, NamedSharding(mesh1, P("dp", None)))
    s1 = jax.device_put(segs, NamedSharding(mesh1, P("dp", None)))
    loss1, new1 = make_train_step_packed(mesh1, cfg, lr=1e-2)(p1, t1, s1)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    t4 = jax.device_put(
        jnp.concatenate([tokens, tokens]), NamedSharding(mesh, P("dp", "sp"))
    )
    s4 = jax.device_put(
        jnp.concatenate([segs, segs]), NamedSharding(mesh, P("dp", "sp"))
    )
    step = make_train_step_sp(mesh, cfg, lr=1e-2, packed=True)
    loss4, new4 = step(params, t4, s4)

    # Duplicated batch halves double both the masked sum and the count; the
    # global masked mean and its grads are identical.
    assert float(loss4) == pytest.approx(float(loss1), rel=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5
        ),
        new4, new1,
    )


def test_packed_sp_rejects_zigzag_and_supports_dropout():
    from flashattention_tpu.models.train import make_train_step_sp

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=1, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    with pytest.raises(ValueError, match="plain ring"):
        make_train_step_sp(mesh, cfg, packed=True, zigzag=True)

    params = transformer.init_params(jax.random.key(0), cfg)
    b, s = 2, 4 * 128
    tokens = jax.device_put(
        jax.random.randint(jax.random.key(1), (2 * b, s), 0, cfg.vocab_size),
        NamedSharding(mesh, P("dp", "sp")),
    )
    seg = np.zeros((2 * b, s), np.int32)
    seg[:, 300:] = 1
    segs = jax.device_put(jnp.asarray(seg), NamedSharding(mesh, P("dp", "sp")))
    step = make_train_step_sp(mesh, cfg, lr=5e-2, packed=True, attn_dropout=0.1)
    l0a, _ = step(params, tokens, segs, 0)
    l0b, _ = step(params, tokens, segs, 0)
    l1, _ = step(params, tokens, segs, 1)
    assert float(l0a) == float(l0b)
    assert float(l0a) != float(l1)
    p = params
    for i in range(3):
        loss, p = step(p, tokens, segs, i)
        assert np.isfinite(float(loss))
