"""Attention dropout: regenerated-mask flash dropout, forward + VJP + train.

The reference has no dropout (forward-only harness); this is framework scope.
Design under test (round 3): the keep mask is a counter-based hash of the
ABSOLUTE (seed, head, row, col) coordinates (ops.flash.dropout_keep_mask) —
never materialized in HBM — and both backward kernels regenerate it bitwise,
so these tests build the oracle from the SAME hash and check the kernels
against plain-jnp attention with that explicit mask (including grads via
jax.grad through the oracle).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import flashattention_tpu.ops.flash as F
from flashattention_tpu.models import transformer
from flashattention_tpu.models.train import make_train_step, shard_params
from flashattention_tpu.ops.backward import attention_vjp

BS = F.BlockSizes(128, 128, 128)


def make_qkv(bh, s, d, dtype=jnp.float32, key=0):
    ks = jax.random.split(jax.random.key(key), 4)
    q, k, v = (jax.random.normal(kk, (bh, s, d)).astype(dtype) for kk in ks[:3])
    do = jax.random.normal(ks[3], (bh, s, d), jnp.float32)
    return q, k, v, do


def oracle(q, k, v, keeps, rate, *, causal, scale, q_seq_len=None,
           window=None):
    """Plain-jnp attention applying the explicit keep mask post-softmax."""
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    s_kv = k.shape[1]
    s = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    if causal:
        rows = jnp.arange(q.shape[1])
        if q_seq_len is not None:
            rows = rows % q_seq_len  # GQA fold: position is row % segment
        cols = jnp.arange(s_kv)[None, :]
        m = rows[:, None] >= cols
        if window is not None:
            m &= cols > rows[:, None] - window
        s = jnp.where(m[None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    z = jnp.where(keeps, p, 0.0) / (1 - rate)
    return jnp.einsum("bqk,bkd->bqd", z, v)


def keep_stack(seed, bh, s_q, s_kv, rate):
    return jnp.stack(
        [F.dropout_keep_mask(seed, b, 0, 0, (s_q, s_kv), rate) for b in range(bh)]
    )


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_masked_oracle(causal, dtype):
    bh, s, d = 4, 256, 64
    rate, seed = 0.2, 42
    q, k, v, _ = make_qkv(bh, s, d, dtype)
    o = F.flash_attention(
        q, k, v, causal=causal, scale=d**-0.5, block_sizes=BS,
        dropout_rate=rate, dropout_seed=seed,
    )
    want = oracle(
        q, k, v, keep_stack(seed, bh, s, s, rate), rate,
        causal=causal, scale=d**-0.5,
    )
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-4
    assert float(jnp.max(jnp.abs(o.astype(jnp.float32) - want))) < tol


@pytest.mark.parametrize("causal", [False, True])
def test_vjp_matches_masked_oracle_grads(causal):
    bh, s, d = 4, 256, 64
    rate, seed = 0.15, 99
    scale = d**-0.5
    q, k, v, do = make_qkv(bh, s, d)
    keeps = keep_stack(seed, bh, s, s, rate)

    def loss_or(q, k, v):
        return jnp.sum(oracle(q, k, v, keeps, rate, causal=causal, scale=scale) * do)

    def loss_fa(q, k, v):
        o = attention_vjp(
            q, k, v, causal, scale, BS, "float32", None, None, None, None,
            rate, seed,
        )
        return jnp.sum(o * do)

    g_or = jax.grad(loss_or, argnums=(0, 1, 2))(q, k, v)
    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_or, g_fa):
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-4, (name, err)


def test_vjp_dropout_composes_with_softcap_and_window():
    bh, s, d = 2, 256, 64
    rate, seed, cap, win = 0.1, 7, 25.0, 140
    scale = d**-0.5
    q, k, v, do = make_qkv(bh, s, d, key=3)
    keeps = keep_stack(seed, bh, s, s, rate)

    def loss_or(q, k, v):
        sc = jnp.einsum("bqd,bkd->bqk", q, k) * scale
        sc = cap * jnp.tanh(sc / cap)
        rows = jnp.arange(s)
        m = (rows[:, None] >= rows[None, :]) & (
            rows[None, :] > rows[:, None] - win
        )
        sc = jnp.where(m[None], sc, -1e30)
        p = jax.nn.softmax(sc, axis=-1)
        z = jnp.where(keeps, p, 0.0) / (1 - rate)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", z, v) * do)

    def loss_fa(q, k, v):
        o = attention_vjp(
            q, k, v, True, scale, BS, "float32", None, None, win, cap,
            rate, seed,
        )
        return jnp.sum(o * do)

    g_or = jax.grad(loss_or, argnums=(0, 1, 2))(q, k, v)
    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_or, g_fa):
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-4, (name, err)


def test_vjp_gqa_folded_dropout():
    """GQA row folding (q_seq_len) draws per-raw-row dropout bits; the oracle
    reproduces them by hashing the FOLDED row coordinate."""
    bh, s, d, g = 2, 128, 64, 2
    rate, seed = 0.25, 11
    scale = d**-0.5
    ks = jax.random.split(jax.random.key(5), 4)
    qf = jax.random.normal(ks[0], (bh, g * s, d))  # folded: g groups stacked
    k = jax.random.normal(ks[1], (bh, s, d))
    v = jax.random.normal(ks[2], (bh, s, d))
    do = jax.random.normal(ks[3], (bh, g * s, d))
    keeps = keep_stack(seed, bh, g * s, s, rate)

    def loss_or(qf, k, v):
        o = oracle(
            qf, k, v, keeps, rate, causal=True, scale=scale, q_seq_len=s
        )
        return jnp.sum(o * do)

    def loss_fa(qf, k, v):
        o = attention_vjp(
            qf, k, v, True, scale, BS, "float32", None, s, None, None,
            rate, seed,
        )
        return jnp.sum(o * do)

    assert (
        float(jnp.max(jnp.abs(
            jax.grad(loss_or)(qf, k, v) - jax.grad(loss_fa)(qf, k, v)
        ))) < 1e-4
    )


def test_dropout_statistics_and_determinism():
    rate = 0.3
    m1 = F.dropout_keep_mask(1, 0, 0, 0, (512, 512), rate)
    m1b = F.dropout_keep_mask(1, 0, 0, 0, (512, 512), rate)
    m2 = F.dropout_keep_mask(2, 0, 0, 0, (512, 512), rate)
    assert bool(jnp.all(m1 == m1b))  # same seed -> bitwise same
    assert not bool(jnp.all(m1 == m2))  # different seed -> different mask
    assert abs(float(m1.mean()) - (1 - rate)) < 0.01
    # Tiled evaluation == whole-array evaluation (absolute coordinates).
    tile = F.dropout_keep_mask(1, 0, 128, 256, (128, 128), rate)
    assert bool(jnp.all(tile == m1[128:256, 256:384]))
    # Head index decorrelates masks.
    mh = F.dropout_keep_mask(1, 3, 0, 0, (512, 512), rate)
    assert not bool(jnp.all(m1 == mh))


def test_dropout_rate_validation():
    q, k, v, _ = make_qkv(2, 128, 64)
    with pytest.raises(ValueError, match="dropout_rate"):
        F.flash_attention(q, k, v, block_sizes=BS, dropout_rate=1.5)
    # rate 0.0 is the identity (the natural "disabled" spelling in sweeps),
    # not an error — and takes the exact no-dropout code path.
    o0 = F.flash_attention(q, k, v, block_sizes=BS, dropout_rate=0.0)
    o = F.flash_attention(q, k, v, block_sizes=BS)
    assert jnp.array_equal(o0, o)


def test_train_step_with_attention_dropout():
    """DP x TP train step with attn_dropout: runs, learns, and the seed
    argument changes the draw (same seed bitwise-reproduces the loss)."""
    dp, tp = 2, 2
    mesh = Mesh(np.array(jax.devices()[: dp * tp]).reshape(dp, tp), ("dp", "tp"))
    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=2 * tp,
        num_kv_heads=tp, head_dim=32, intermediate=32 * tp, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    params = shard_params(params, mesh, cfg)
    tokens = jax.device_put(
        jax.random.randint(jax.random.key(1), (2 * dp, 128), 0, cfg.vocab_size),
        NamedSharding(mesh, P("dp", None)),
    )
    step = make_train_step(mesh, cfg, lr=5e-2, attn_dropout=0.1)
    l0a, _ = step(params, tokens, 0)
    l0b, _ = step(params, tokens, 0)
    l1, _ = step(params, tokens, 1)
    assert float(l0a) == float(l0b)  # same seed -> same masks -> same loss
    assert float(l0a) != float(l1)  # new seed -> new masks
    losses = []
    for i in range(5):
        loss, params = step(params, tokens, i)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    # Dropout off must keep the historical no-seed signature working.
    step_plain = make_train_step(mesh, cfg, lr=5e-2)
    loss, _ = step_plain(params, tokens)
    assert np.isfinite(float(loss))


# ── ring-attention dropout (round 3) ─────────────────────────────────────
# The ring folds (device, source-chunk, piece) into the seed because kernel
# dropout coordinates are chunk-local; these oracles re-assemble the exact
# global keep matrix from the same folds and check both rings against dense
# attention with that explicit mask (values AND grads).

def _fold(seed, i, src, piece=0):
    from flashattention_tpu.parallel.ring import _ring_chunk_seed

    # The keep-mask hash consumes the seed mod 2**32; mask the (possibly
    # negative) int32 fold into that range so plain-int plumbing works.
    return int(_ring_chunk_seed(seed, i, src, piece)) & 0xFFFFFFFF


def _ring_keeps(seed, bh, n, s_local, rate):
    """Global (bh, S, S) keep matrix of the plain ring's per-chunk draws."""
    s = n * s_local
    keeps = np.zeros((bh, s, s), bool)
    for i in range(n):
        for src in range(n):
            fs = _fold(seed, i, src)
            for b in range(bh):
                keeps[
                    b, i * s_local:(i + 1) * s_local,
                    src * s_local:(src + 1) * s_local,
                ] = np.asarray(
                    F.dropout_keep_mask(fs, b, 0, 0, (s_local, s_local), rate)
                )
    return jnp.asarray(keeps)


def _zigzag_keeps(seed, bh, n, s_local, rate):
    """Global keep matrix of the zigzag ring's per-(i, src, piece) draws.

    Device i holds rows [half-chunk i ; half-chunk 2n-1-i] (c rows each);
    the KV pair that started on src is [half-chunk src ; half-chunk
    2n-1-src].  Mirrors case_diag / case_past / case_future_lo exactly.
    """
    c = s_local // 2
    s = n * s_local
    keeps = np.zeros((bh, s, s), bool)

    def col(src, cc):  # local kv col -> global col
        return src * c + cc if cc < c else (2 * n - 1 - src) * c + (cc - c)

    for i in range(n):
        hi_base = (2 * n - 1 - i) * c
        for src in range(n):
            if src == i:
                for b in range(bh):
                    m0 = np.asarray(F.dropout_keep_mask(
                        _fold(seed, i, src, 0), b, 0, 0, (c, c), rate))
                    keeps[b, i * c:(i + 1) * c, i * c:(i + 1) * c] = m0
                    m1 = np.asarray(F.dropout_keep_mask(
                        _fold(seed, i, src, 1), b, 0, 0, (c, 2 * c), rate))
                    for cc in range(2 * c):
                        keeps[b, hi_base:hi_base + c, col(src, cc)] = m1[:, cc]
            elif src < i:
                for b in range(bh):
                    m = np.asarray(F.dropout_keep_mask(
                        _fold(seed, i, src, 0), b, 0, 0, (2 * c, c), rate))
                    keeps[b, i * c:(i + 1) * c, src * c:(src + 1) * c] = m[:c]
                    keeps[b, hi_base:hi_base + c, src * c:(src + 1) * c] = m[c:]
            else:
                for b in range(bh):
                    m = np.asarray(F.dropout_keep_mask(
                        _fold(seed, i, src, 1), b, 0, 0, (c, 2 * c), rate))
                    for cc in range(2 * c):
                        keeps[b, hi_base:hi_base + c, col(src, cc)] = m[:, cc]
    return jnp.asarray(keeps)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_dropout_matches_assembled_oracle(causal):
    from flashattention_tpu.parallel.ring import make_ring_attention_vjp

    n, bh, s_local, d = 4, 2, 128, 32
    rate, seed = 0.2, 17
    s = n * s_local
    scale = d**-0.5
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    q, k, v, do = make_qkv(bh, s, d, key=13)
    keeps = _ring_keeps(seed, bh, n, s_local, rate)

    spec = NamedSharding(mesh, P(None, "sp", None))
    qs, ks_, vs = (jax.device_put(x, spec) for x in (q, k, v))
    ring = make_ring_attention_vjp(
        mesh, axis_name="sp", causal=causal, scale=scale, dropout_rate=rate
    )

    def loss_ring(q, k, v):
        return jnp.sum(ring(q, k, v, jnp.int32(seed)) * do)

    def loss_or(q, k, v):
        return jnp.sum(oracle(q, k, v, keeps, rate, causal=causal, scale=scale) * do)

    got_o = ring(qs, ks_, vs, jnp.int32(seed))
    want_o = oracle(q, k, v, keeps, rate, causal=causal, scale=scale)
    assert float(jnp.max(jnp.abs(got_o - want_o))) < 5e-4

    got = jax.grad(loss_ring, argnums=(0, 1, 2))(qs, ks_, vs)
    want = jax.grad(loss_or, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", got, want):
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 5e-4, (name, err)


def test_zigzag_ring_dropout_matches_assembled_oracle():
    from flashattention_tpu.parallel.ring import (
        make_zigzag_ring_attention_vjp,
        zigzag_shard,
        zigzag_unshard,
    )

    n, bh, s_local, d = 4, 2, 256, 32
    rate, seed = 0.25, 23
    s = n * s_local
    scale = d**-0.5
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    q, k, v, do = make_qkv(bh, s, d, key=29)
    keeps = _zigzag_keeps(seed, bh, n, s_local, rate)

    qz, kz, vz, dz = (zigzag_shard(x, n) for x in (q, k, v, do))
    spec = NamedSharding(mesh, P(None, "sp", None))
    qz, kz, vz = (jax.device_put(x, spec) for x in (qz, kz, vz))
    zring = make_zigzag_ring_attention_vjp(
        mesh, axis_name="sp", scale=scale, dropout_rate=rate
    )

    got_o = zigzag_unshard(zring(qz, kz, vz, jnp.int32(seed)), n)
    want_o = oracle(q, k, v, keeps, rate, causal=True, scale=scale)
    assert float(jnp.max(jnp.abs(got_o - want_o))) < 5e-4

    def loss_z(q, k, v):
        return jnp.sum(zring(q, k, v, jnp.int32(seed)) * dz)

    def loss_or(q, k, v):
        return jnp.sum(oracle(q, k, v, keeps, rate, causal=True, scale=scale) * do)

    got = jax.grad(loss_z, argnums=(0, 1, 2))(qz, kz, vz)
    want = jax.grad(loss_or, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", got, want):
        err = float(jnp.max(jnp.abs(zigzag_unshard(a, n) - b)))
        assert err < 5e-4, (name, err)


@pytest.mark.parametrize("zigzag", [False, True])
def test_sp_train_step_with_attention_dropout(zigzag):
    """DP x SP ring training with attn_dropout: deterministic per seed, new
    seed changes the draw, loss stays finite over steps."""
    from flashattention_tpu.models.train import make_train_step_sp

    dp, sp = 2, 4
    mesh = Mesh(np.array(jax.devices()[: dp * sp]).reshape(dp, sp), ("dp", "sp"))
    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(
        jax.random.key(1), (2 * dp, sp * 2 * 128), 0, cfg.vocab_size
    )
    step = make_train_step_sp(
        mesh, cfg, lr=5e-2, zigzag=zigzag, attn_dropout=0.1
    )
    l0a, _ = step(params, tokens, 0)
    l0b, _ = step(params, tokens, 0)
    l1, _ = step(params, tokens, 1)
    assert float(l0a) == float(l0b)
    assert float(l0a) != float(l1)
    for i in range(3):
        loss, params = step(params, tokens, i)
        assert np.isfinite(float(loss))
    # Dropout off keeps the historical two-arg signature working.
    step_plain = make_train_step_sp(mesh, cfg, lr=5e-2, zigzag=zigzag)
    loss, _ = step_plain(params, tokens)
    assert np.isfinite(float(loss))


def _zigzag_win_keeps(seed, bh, n, s_local, rate):
    """Global keep matrix of the WINDOWED zigzag ring's three per-(i, src)
    pieces: 0 = q_lo vs kv_lo, 1 = q_hi vs kv_lo, 2 = q_hi vs kv_hi (each a
    (c, c) chunk-local draw; q_lo never attends kv_hi — causally dead)."""
    c = s_local // 2
    s = n * s_local
    keeps = np.zeros((bh, s, s), bool)
    for i in range(n):
        lo, hi = i * c, (2 * n - 1 - i) * c
        for src in range(n):
            klo, khi = src * c, (2 * n - 1 - src) * c
            for b in range(bh):
                pieces = [
                    (lo, klo, 0),
                    (hi, klo, 1),
                    (hi, khi, 2),
                ]
                for rbase, cbase, piece in pieces:
                    m = np.asarray(F.dropout_keep_mask(
                        _fold(seed, i, src, piece), b, 0, 0, (c, c), rate))
                    keeps[b, rbase:rbase + c, cbase:cbase + c] = m
    return jnp.asarray(keeps)


def test_ring_dropout_window_matches_assembled_oracle():
    """Windowed causal ring + dropout: the per-(device, chunk) piece-0 folds
    reassemble to the oracle's keep matrix under the sliding-window mask."""
    from flashattention_tpu.parallel.ring import make_ring_attention_vjp

    n, bh, s_local, d = 4, 2, 128, 32
    rate, seed, win = 0.2, 37, 192
    s = n * s_local
    scale = d**-0.5
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    q, k, v, do = make_qkv(bh, s, d, key=43)
    keeps = _ring_keeps(seed, bh, n, s_local, rate)

    spec = NamedSharding(mesh, P(None, "sp", None))
    qs, ks_, vs = (jax.device_put(x, spec) for x in (q, k, v))
    ring = make_ring_attention_vjp(
        mesh, axis_name="sp", causal=True, scale=scale, window=win,
        dropout_rate=rate,
    )

    got_o = ring(qs, ks_, vs, jnp.int32(seed))
    want_o = oracle(q, k, v, keeps, rate, causal=True, scale=scale, window=win)
    assert float(jnp.max(jnp.abs(got_o - want_o))) < 5e-4

    def loss_ring(q, k, v):
        return jnp.sum(ring(q, k, v, jnp.int32(seed)) * do)

    def loss_or(q, k, v):
        return jnp.sum(
            oracle(q, k, v, keeps, rate, causal=True, scale=scale, window=win)
            * do
        )

    got = jax.grad(loss_ring, argnums=(0, 1, 2))(qs, ks_, vs)
    want = jax.grad(loss_or, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", got, want):
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 5e-4, (name, err)


def test_zigzag_ring_dropout_window_matches_assembled_oracle():
    """Windowed zigzag ring + dropout: the 3-piece (i, src) seed folds of
    compute_win/grads_win reassemble to the oracle's keep matrix — the
    Mistral-class (sliding window + dropout) long-context training path."""
    from flashattention_tpu.parallel.ring import (
        make_zigzag_ring_attention_vjp,
        zigzag_shard,
        zigzag_unshard,
    )

    n, bh, s_local, d = 4, 2, 256, 32
    rate, seed, win = 0.25, 53, 320
    s = n * s_local
    scale = d**-0.5
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    q, k, v, do = make_qkv(bh, s, d, key=59)
    keeps = _zigzag_win_keeps(seed, bh, n, s_local, rate)

    qz, kz, vz, dz = (zigzag_shard(x, n) for x in (q, k, v, do))
    spec = NamedSharding(mesh, P(None, "sp", None))
    qz, kz, vz = (jax.device_put(x, spec) for x in (qz, kz, vz))
    zring = make_zigzag_ring_attention_vjp(
        mesh, axis_name="sp", scale=scale, window=win, dropout_rate=rate
    )

    got_o = zigzag_unshard(zring(qz, kz, vz, jnp.int32(seed)), n)
    want_o = oracle(q, k, v, keeps, rate, causal=True, scale=scale, window=win)
    assert float(jnp.max(jnp.abs(got_o - want_o))) < 5e-4

    def loss_z(q, k, v):
        return jnp.sum(zring(q, k, v, jnp.int32(seed)) * dz)

    def loss_or(q, k, v):
        return jnp.sum(
            oracle(q, k, v, keeps, rate, causal=True, scale=scale, window=win)
            * do
        )

    got = jax.grad(loss_z, argnums=(0, 1, 2))(qz, kz, vz)
    want = jax.grad(loss_or, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", got, want):
        err = float(jnp.max(jnp.abs(zigzag_unshard(a, n) - b)))
        assert err < 5e-4, (name, err)


def test_ring_dropout_gqa_n1_equals_kernel():
    """Plain ring at axis_size=1 with GQA folding + dropout == the single
    kernel with the same (device 0, chunk 0) seed fold — pins the ring's
    seed plumbing end-to-end including the folded-row hash coordinates.

    Uses the per-shard builder directly (the GQA fold is PER-SHARD, so it
    belongs inside the caller's shard_map — the mesh wrapper deliberately
    does not take q_seq_len)."""
    from flashattention_tpu.parallel.ring import (
        _ring_chunk_seed, ring_attention_vjp_local,
    )

    bh, s, d, g = 2, 256, 32, 2
    rate, seed = 0.2, 71
    scale = d**-0.5
    ks = jax.random.split(jax.random.key(83), 3)
    qf = jax.random.normal(ks[0], (bh, g * s, d))
    k = jax.random.normal(ks[1], (bh, s, d))
    v = jax.random.normal(ks[2], (bh, s, d))

    mesh = Mesh(np.array(jax.devices()[:1]), ("sp",))
    ring = ring_attention_vjp_local(
        axis_name="sp", axis_size=1, causal=True, scale=scale,
        dropout_rate=rate, q_seq_len=s,
    )
    fn = jax.jit(jax.shard_map(
        lambda q, k, v, sd: ring(q, k, v, sd),
        mesh=mesh,
        in_specs=(P(None, "sp", None),) * 3 + (P(),),
        out_specs=P(None, "sp", None),
        check_vma=False,
    ))
    got = fn(qf, k, v, jnp.int32(seed))
    want = F.flash_attention(
        qf, k, v, causal=True, scale=scale, q_seq_len=s,
        dropout_rate=rate, dropout_seed=_ring_chunk_seed(seed, 0, 0),
    )
    assert float(jnp.max(jnp.abs(got - want))) < 1e-5
