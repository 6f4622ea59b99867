"""L3 distribution tests on a virtual 8-device CPU mesh.

The key assertion (SURVEY.md section 4 "implication for the build"): ring
attention over N devices == the single-kernel output, verifiable in CI via
``xla_force_host_platform_device_count``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashattention_tpu.ops.reference import attention_reference
from flashattention_tpu.parallel.ring import make_ring_attention, merge_partials
from flashattention_tpu.parallel.sharded import (
    make_allgather_cp_attention,
    make_data_parallel_attention,
    make_reduce_cp_attention,
)
from flashattention_tpu.utils.testing import TOL_FP32, make_random, validate_result


def mesh_1d(n, name):
    return Mesh(np.array(jax.devices()[:n]), (name,))


def qkv(shape, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    return tuple(make_random(k, shape) for k in ks)


def test_merge_partials_identity():
    # Merging a partial with the empty partial returns the partial.
    q, k, v = qkv((2, 8, 4), seed=0)
    from flashattention_tpu.ops.reference import attention_reference_with_stats

    o, l, m = attention_reference_with_stats(q, k, v)
    o0 = jnp.zeros_like(o)
    l0 = jnp.zeros_like(l)
    m0 = jnp.full_like(m, -jnp.inf)
    om, lm, mm = merge_partials(o0, l0, m0, o, l, m)
    validate_result(om, o, 1e-6)
    validate_result(lm, l, 1e-5)


def test_merge_partials_split_equals_full():
    # Splitting KV in two and merging partials == dense attention.
    from flashattention_tpu.ops.reference import attention_reference_with_stats

    q, k, v = qkv((2, 16, 8), seed=1)
    o1, l1, m1 = attention_reference_with_stats(q, k[:, :8], v[:, :8])
    o2, l2, m2 = attention_reference_with_stats(q, k[:, 8:], v[:, 8:])
    om, _, _ = merge_partials(o1, l1, m1, o2, l2, m2)
    want = attention_reference(q, k, v)
    validate_result(om, want, 1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_single_kernel(causal):
    n = 4
    mesh = mesh_1d(n, "sp")
    bh, s, d = 2, 512, 32
    q, k, v = qkv((bh, s, d), seed=2)
    fn = make_ring_attention(mesh, axis_name="sp", causal=causal)
    o = fn(q, k, v)
    want = attention_reference(q, k, v, causal=causal)
    validate_result(o, want, TOL_FP32)


def test_ring_attention_8way():
    n = 8
    mesh = mesh_1d(n, "sp")
    bh, s, d = 1, 1024, 32
    q, k, v = qkv((bh, s, d), seed=3)
    fn = make_ring_attention(mesh, axis_name="sp", causal=True)
    o = fn(q, k, v)
    want = attention_reference(q, k, v, causal=True)
    validate_result(o, want, TOL_FP32)


@pytest.mark.parametrize("causal", [False, True])
def test_data_parallel_attention(causal):
    mesh = mesh_1d(8, "dp")
    bh, s, d = 16, 256, 32
    q, k, v = qkv((bh, s, d), seed=4)
    fn = make_data_parallel_attention(mesh, axes=("dp",), causal=causal)
    o = fn(q, k, v)
    want = attention_reference(q, k, v, causal=causal)
    validate_result(o, want, TOL_FP32)


@pytest.mark.parametrize("causal", [False, True])
def test_allgather_cp_attention(causal):
    mesh = mesh_1d(4, "sp")
    bh, s, d = 2, 512, 32
    q, k, v = qkv((bh, s, d), seed=5)
    fn = make_allgather_cp_attention(mesh, axis_name="sp", causal=causal)
    o = fn(q, k, v)
    want = attention_reference(q, k, v, causal=causal)
    validate_result(o, want, TOL_FP32)


def test_reduce_cp_attention():
    mesh = mesh_1d(4, "sp")
    bh, s, d = 2, 512, 32
    q, k, v = qkv((bh, s, d), seed=6)
    fn = make_reduce_cp_attention(mesh, axis_name="sp")
    o = fn(q, k, v)
    want = attention_reference(q, k, v)
    validate_result(o, want, TOL_FP32)


def test_ring_2d_mesh_dp_x_sp():
    # Combined: BH sharded over dp, S sharded over sp on a 2x4 mesh.
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    bh, s, d = 4, 512, 32
    q, k, v = qkv((bh, s, d), seed=7)
    fn = make_ring_attention(mesh, axis_name="sp", causal=True, batch_axis="dp")
    o = fn(q, k, v)
    want = attention_reference(q, k, v, causal=True)
    validate_result(o, want, TOL_FP32)


# ── sharded decode serving (DP x TP) ─────────────────────────────────────────


def test_sharded_decode_step_matches_single_device():
    """DP x TP sharded decode step == unsharded decode_step on the same state."""
    import numpy as np
    from flashattention_tpu.models import transformer
    from flashattention_tpu.models.train import shard_params
    from flashattention_tpu.parallel.serving import make_sharded_decode_step
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    dp, tp = 2, 2
    devs = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    mesh = Mesh(devs, ("dp", "tp"))
    cfg = transformer.ModelConfig(
        vocab_size=64,
        num_layers=2,
        d_model=32,
        num_q_heads=4,
        num_kv_heads=2,
        head_dim=16,
        intermediate=32,
        dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)

    ps, p_local = 8, 6
    p_global = dp * p_local
    l = cfg.num_layers
    # Two requests per dp group; group i uses pages in slice [i*p_local, ...).
    # Local page ids (for the sharded run) and global ids (for the oracle).
    local_pi = np.array([[0, 1], [2, 3], [0, 1], [2, 3]], np.int32)
    global_pi = local_pi + np.repeat([0, p_local], 2)[:, None]
    lengths = jnp.asarray([5, 9, 12, 3], jnp.int32)  # incl. current token
    positions = lengths - 1
    write_global = jnp.asarray(
        [global_pi[i][int(p) // ps] for i, p in enumerate(positions)], jnp.int32
    )
    write_local = jnp.asarray(
        [local_pi[i][int(p) // ps] for i, p in enumerate(positions)], jnp.int32
    )
    write_slots = positions % ps
    tokens = jnp.asarray([3, 14, 15, 9], jnp.int32)

    # Pre-populate history rows (positions 0..len-2) identically in both runs.
    key = jax.random.key(1)
    hist = jax.random.normal(
        key, (l, p_global, cfg.num_kv_heads, ps, cfg.head_dim)
    )
    kp = hist * 0.1
    vp = hist * 0.2

    sharded = make_sharded_decode_step(mesh, cfg)
    sp = shard_params(params, mesh, cfg)
    pool_sharding = NamedSharding(mesh, P(None, "dp", "tp", None, None))
    # device_put copies first: both decode steps donate their pool args.
    kp_s = jax.device_put(kp, pool_sharding)
    vp_s = jax.device_put(vp, pool_sharding)

    want_logits, want_kp, want_vp, _, _ = transformer.decode_step(
        params,
        tokens,
        positions,
        kp,
        vp,
        lengths,
        jnp.asarray(global_pi),
        write_global,
        write_slots,
        cfg=cfg,
    )
    got_logits, got_kp, got_vp = sharded(
        sp,
        jax.device_put(tokens, NamedSharding(mesh, P("dp"))),
        jax.device_put(positions, NamedSharding(mesh, P("dp"))),
        kp_s,
        vp_s,
        jax.device_put(lengths, NamedSharding(mesh, P("dp"))),
        jax.device_put(jnp.asarray(local_pi), NamedSharding(mesh, P("dp", None))),
        jax.device_put(write_local, NamedSharding(mesh, P("dp"))),
        jax.device_put(write_slots, NamedSharding(mesh, P("dp"))),
    )
    validate_result(got_logits, want_logits, 1e-3)
    validate_result(got_kp, want_kp, 1e-5)


def test_zigzag_ring_attention_matches_dense():
    """Zigzag (load-balanced) causal ring == single-device causal attention."""
    from flashattention_tpu.parallel.ring import (
        make_zigzag_ring_attention,
        zigzag_shard,
        zigzag_unshard,
    )
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import numpy as np

    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    bh, s, d = 4, 8 * 128, 64  # 2N=8 half-chunks of 128 rows
    ks = jax.random.split(jax.random.key(5), 3)
    q, k, v = (make_random(kk, (bh, s, d)) for kk in ks)

    want = attention_reference(q, k, v, causal=True)

    qz, kz, vz = (zigzag_shard(x, n) for x in (q, k, v))
    spec = NamedSharding(mesh, P(None, "sp", None))
    qz, kz, vz = (jax.device_put(x, spec) for x in (qz, kz, vz))
    ring = make_zigzag_ring_attention(mesh, axis_name="sp")
    oz = ring(qz, kz, vz)
    got = zigzag_unshard(oz, n)
    validate_result(got, want, 1e-4)  # bf16_3x default precision class


def test_zigzag_shard_roundtrip():
    from flashattention_tpu.parallel.ring import zigzag_shard, zigzag_unshard

    x = jnp.arange(2 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 3)
    z = zigzag_shard(x, 4)
    assert not jnp.array_equal(z, x)
    back = zigzag_unshard(z, 4)
    assert jnp.array_equal(back, x)


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_attention_matches_dense(causal):
    """All-to-all head-scatter SP == single-device attention."""
    from flashattention_tpu.parallel import make_ulysses_attention

    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    b, h, s, d = 2, 8, 512, 64
    ks = jax.random.split(jax.random.key(9), 3)
    q, k, v = (make_random(kk, (b, h, s, d)) for kk in ks)
    want = attention_reference(
        q.reshape(b * h, s, d), k.reshape(b * h, s, d), v.reshape(b * h, s, d),
        causal=causal,
    ).reshape(b, h, s, d)

    spec = NamedSharding(mesh, P(None, None, "sp", None))
    qs, ks_, vs = (jax.device_put(x, spec) for x in (q, k, v))
    uly = make_ulysses_attention(mesh, causal=causal)
    got = uly(qs, ks_, vs)
    validate_result(got, want, 1e-4)


def test_sharded_paged_attention_quantized():
    """DP x TP sharded paged decode with int8 pools == unsharded result."""
    from flashattention_tpu.ops.decode import paged_attention
    from flashattention_tpu.ops.quant import quantize
    from flashattention_tpu.parallel.serving import make_sharded_paged_attention

    dp, tp = 2, 2
    devs = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    mesh = Mesh(devs, ("dp", "tp"))
    b, kvh, g, d, ps, pps = 4, 2, 4, 32, 8, 2
    p_local = 4
    p_global = dp * p_local
    ks = jax.random.split(jax.random.key(21), 3)
    q = make_random(ks[0], (b, kvh, g, d))
    kf = make_random(ks[1], (p_global, kvh, ps, d))
    vf = make_random(ks[2], (p_global, kvh, ps, d))
    kq, vq = quantize(kf, "int8"), quantize(vf, "int8")
    lengths = jnp.asarray([9, 16, 5, 12], jnp.int32)
    # dp group i uses pages in slice [i*p_local, ...): local ids for sharded.
    local_pi = np.array([[0, 1], [2, 3], [0, 1], [2, 3]], np.int32)
    global_pi = local_pi + np.repeat([0, p_local], 2)[:, None]

    want = paged_attention(
        q, kq.payload, vq.payload, lengths, jnp.asarray(global_pi),
        k_scales_pages=kq.scales, v_scales_pages=vq.scales,
    )

    shard = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    fn = make_sharded_paged_attention(mesh, quantized=True)
    got = fn(
        shard(q, P("dp", "tp", None, None)),
        shard(kq.payload, P("dp", "tp", None, None)),
        shard(vq.payload, P("dp", "tp", None, None)),
        shard(lengths, P("dp")),
        shard(jnp.asarray(local_pi), P("dp", None)),
        shard(kq.scales, P("dp", "tp", None)),
        shard(vq.scales, P("dp", "tp", None)),
    )
    validate_result(got, want, 1e-5)


def test_sharded_decode_step_quantized_matches_single_device():
    """Quantized DP x TP sharded decode step == unsharded quantized decode_step."""
    from flashattention_tpu.models import transformer
    from flashattention_tpu.models.train import shard_params
    from flashattention_tpu.parallel.serving import make_sharded_decode_step

    dp, tp = 2, 2
    devs = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    mesh = Mesh(devs, ("dp", "tp"))
    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=32, num_q_heads=4,
        num_kv_heads=2, head_dim=16, intermediate=32, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)

    b_global, ps, p_local, pps = 4, 8, 6, 2
    p_global = dp * p_local
    l = cfg.num_layers
    hist = jax.random.normal(
        jax.random.key(1), (l, p_global, cfg.num_kv_heads, ps, cfg.head_dim)
    )
    kp = jnp.clip(jnp.round(hist * 50), -127, 127).astype(jnp.int8)
    vp = jnp.clip(jnp.round(hist * 30), -127, 127).astype(jnp.int8)
    ksc = jnp.abs(jax.random.normal(jax.random.key(2), kp.shape[:4])) * 0.01 + 0.005
    vsc = ksc * 1.3
    local_pi = np.array([[0, 1], [2, 3], [0, 1], [2, 3]], np.int32)
    global_pi = local_pi + np.repeat([0, p_local], 2)[:, None]
    lengths = jnp.asarray([5, 9, 12, 3], jnp.int32)
    positions = lengths - 1
    write_global = jnp.asarray(
        [global_pi[i][int(p) // ps] for i, p in enumerate(positions)], jnp.int32
    )
    write_local = jnp.asarray(
        [local_pi[i][int(p) // ps] for i, p in enumerate(positions)], jnp.int32
    )
    write_slots = positions % ps
    tokens = jnp.asarray([3, 14, 15, 9], jnp.int32)

    sharded = make_sharded_decode_step(mesh, cfg, quantized=True)
    sp = shard_params(params, mesh, cfg)
    pool_sh = NamedSharding(mesh, P(None, "dp", "tp", None, None))
    scale_sh = NamedSharding(mesh, P(None, "dp", "tp", None))
    kp_s, vp_s = jax.device_put(kp, pool_sh), jax.device_put(vp, pool_sh)
    ks_s, vs_s = jax.device_put(ksc, scale_sh), jax.device_put(vsc, scale_sh)

    want = transformer.decode_step(
        params, tokens, positions, kp, vp, lengths, jnp.asarray(global_pi),
        write_global, write_slots, cfg=cfg, k_scales=ksc, v_scales=vsc,
    )

    dpv = lambda x: jax.device_put(x, NamedSharding(mesh, P("dp")))
    got = sharded(
        sp, dpv(tokens), dpv(positions), kp_s, vp_s, dpv(lengths),
        jax.device_put(jnp.asarray(local_pi), NamedSharding(mesh, P("dp", None))),
        dpv(write_local), dpv(write_slots), ks_s, vs_s,
    )
    validate_result(got[0], want[0], 1e-3)  # logits
    # int8 payloads from two differently-compiled programs: allow one unit of
    # rounding at .5 boundaries rather than bitwise equality.
    np.testing.assert_allclose(
        np.asarray(got[1], np.int32), np.asarray(want[1], np.int32), atol=1
    )


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_vjp_matches_dense_grads(causal):
    """Differentiable ring attention: grads == dense-oracle autodiff."""
    from flashattention_tpu.parallel import make_ring_attention_vjp

    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    bh, s, d = 2, 4 * 128, 32
    ks = jax.random.split(jax.random.key(31), 4)
    q, k, v = (make_random(kk, (bh, s, d)) for kk in ks[:3])
    t = make_random(ks[3], (bh, s, d))

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=causal) * t)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    spec = NamedSharding(mesh, P(None, "sp", None))
    qs, ks_, vs = (jax.device_put(x, spec) for x in (q, k, v))
    ring = make_ring_attention_vjp(mesh, axis_name="sp", causal=causal)

    def loss_ring(q, k, v):
        return jnp.sum(ring(q, k, v) * t)

    got = jax.grad(loss_ring, argnums=(0, 1, 2))(qs, ks_, vs)
    for name, a, b in zip("dq dk dv".split(), got, want):
        validate_result(a, b, 5e-3, name=name)


def test_zigzag_ring_vjp_matches_dense_grads():
    """Differentiable zigzag ring: grads == dense-oracle causal autodiff."""
    from flashattention_tpu.parallel import (
        make_zigzag_ring_attention_vjp,
        zigzag_shard,
        zigzag_unshard,
    )

    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    bh, s, d = 2, 8 * 128, 32
    ks = jax.random.split(jax.random.key(41), 4)
    q, k, v = (make_random(kk, (bh, s, d)) for kk in ks[:3])
    t = make_random(ks[3], (bh, s, d))

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=True) * t)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    qz, kz, vz, tz = (zigzag_shard(x, n) for x in (q, k, v, t))
    spec = NamedSharding(mesh, P(None, "sp", None))
    qz, kz, vz = (jax.device_put(x, spec) for x in (qz, kz, vz))
    zring = make_zigzag_ring_attention_vjp(mesh, axis_name="sp")

    def loss_z(q, k, v):
        return jnp.sum(zring(q, k, v) * tz)

    got = jax.grad(loss_z, argnums=(0, 1, 2))(qz, kz, vz)
    for name, a, b in zip("dq dk dv".split(), got, want):
        validate_result(zigzag_unshard(a, n), b, 5e-3, name=name)


@pytest.mark.parametrize("hq,hkv", [(8, 2), (16, 4), (8, 8)])
def test_ulysses_gqa(hq, hkv):
    """GQA-aware Ulysses (round 2): KV heads fewer than the axis size
    all-gather along sequence while q heads scatter; == repeated-KV oracle."""
    from flashattention_tpu.parallel.sharded import make_ulysses_attention

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(1, 8), ("dp", "sp"))
    b, s, d = 2, 8 * 128, 64
    ks = jax.random.split(jax.random.key(hq), 3)
    q = make_random(ks[0], (b, hq, s, d))
    k = make_random(ks[1], (b, hkv, s, d))
    v = make_random(ks[2], (b, hkv, s, d))
    spec = NamedSharding(mesh, P(None, None, "sp", None))
    qd, kd, vd = (jax.device_put(x, spec) for x in (q, k, v))
    fn = make_ulysses_attention(mesh, axis_name="sp", causal=True)
    o = fn(qd, kd, vd)
    g = hq // hkv
    want = attention_reference(
        q.reshape(b * hq, s, d),
        jnp.repeat(k, g, 1).reshape(b * hq, s, d),
        jnp.repeat(v, g, 1).reshape(b * hq, s, d),
        causal=True,
    )
    validate_result(o.reshape(b * hq, s, d), want, 2e-4)


# ── sliding window / logit softcap on the rings (round 3; VERDICT #6) ─────────


@pytest.mark.parametrize("window,softcap", [(200, None), (300, 30.0), (None, 25.0)])
def test_ring_attention_window_softcap(window, softcap):
    """Windowed / capped ring attention == dense oracle.

    The window intersects each ring step's chunk at a traced q_offset (chunks
    fully behind the window are skipped), so window=200 at 4x128-chunk shards
    exercises live-diagonal, live-past, and dead-past chunks."""
    n = 4
    mesh = mesh_1d(n, "sp")
    bh, s, d = 2, 4 * 128, 32
    q, k, v = qkv((bh, s, d), seed=51)
    fn = make_ring_attention(
        mesh, axis_name="sp", causal=True, window=window, logit_softcap=softcap
    )
    o = fn(q, k, v)
    want = attention_reference(
        q, k, v, causal=True, window=window, logit_softcap=softcap
    )
    validate_result(o, want, TOL_FP32)


@pytest.mark.parametrize("window", [150, 500])
def test_zigzag_ring_window(window):
    """Windowed zigzag ring (per-half traced offsets) == dense oracle."""
    from flashattention_tpu.parallel.ring import (
        make_zigzag_ring_attention,
        zigzag_shard,
        zigzag_unshard,
    )

    n = 4
    mesh = mesh_1d(n, "sp")
    bh, s, d = 2, 8 * 128, 32
    q, k, v = qkv((bh, s, d), seed=52)
    qz, kz, vz = (zigzag_shard(x, n) for x in (q, k, v))
    ring = make_zigzag_ring_attention(
        mesh, axis_name="sp", window=window, logit_softcap=20.0
    )
    oz = ring(qz, kz, vz)
    want = attention_reference(
        q, k, v, causal=True, window=window, logit_softcap=20.0
    )
    validate_result(zigzag_unshard(oz, n), want, TOL_FP32)


def test_ring_attention_vjp_window_matches_dense_grads():
    """Differentiable windowed ring: grads == dense-oracle autodiff."""
    from flashattention_tpu.parallel import make_ring_attention_vjp

    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    bh, s, d = 2, 4 * 128, 32
    ks = jax.random.split(jax.random.key(53), 4)
    q, k, v = (make_random(kk, (bh, s, d)) for kk in ks[:3])
    t = make_random(ks[3], (bh, s, d))
    window, cap = 200, 30.0

    def loss_ref(q, k, v):
        return jnp.sum(
            attention_reference(
                q, k, v, causal=True, window=window, logit_softcap=cap
            ) * t
        )

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    spec = NamedSharding(mesh, P(None, "sp", None))
    qs, ks_, vs = (jax.device_put(x, spec) for x in (q, k, v))
    ring = make_ring_attention_vjp(
        mesh, axis_name="sp", causal=True, window=window, logit_softcap=cap
    )

    def loss_ring(q, k, v):
        return jnp.sum(ring(q, k, v) * t)

    got = jax.grad(loss_ring, argnums=(0, 1, 2))(qs, ks_, vs)
    for name, a, b in zip("dq dk dv".split(), got, want):
        validate_result(a, b, 5e-3, name=name)


def test_zigzag_ring_vjp_window_matches_dense_grads():
    """Differentiable windowed zigzag ring: grads == dense-oracle autodiff."""
    from flashattention_tpu.parallel import (
        make_zigzag_ring_attention_vjp,
        zigzag_shard,
        zigzag_unshard,
    )

    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    bh, s, d = 2, 8 * 128, 32
    ks = jax.random.split(jax.random.key(54), 4)
    q, k, v = (make_random(kk, (bh, s, d)) for kk in ks[:3])
    t = make_random(ks[3], (bh, s, d))
    window = 300

    def loss_ref(q, k, v):
        return jnp.sum(
            attention_reference(q, k, v, causal=True, window=window) * t
        )

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    qz, kz, vz, tz = (zigzag_shard(x, n) for x in (q, k, v, t))
    spec = NamedSharding(mesh, P(None, "sp", None))
    qz, kz, vz = (jax.device_put(x, spec) for x in (qz, kz, vz))
    zring = make_zigzag_ring_attention_vjp(mesh, axis_name="sp", window=window)

    def loss_z(q, k, v):
        return jnp.sum(zring(q, k, v) * tz)

    got = jax.grad(loss_z, argnums=(0, 1, 2))(qz, kz, vz)
    for name, a, b in zip("dq dk dv".split(), got, want):
        validate_result(zigzag_unshard(a, n), b, 5e-3, name=name)


# ── quantized KV on the ring (round 3; VERDICT #7) ────────────────────────────


@pytest.mark.parametrize("causal,window", [(False, None), (True, None), (True, 200)])
def test_ring_attention_quantized_kv(causal, window):
    """int8 KV ring == single-chip fused-dequant kernel (and the dequantized
    dense oracle at the fused path's quant tolerance).

    The ring rotates QuantizedTensor (payload + scales) through ppermute —
    half the ICI bytes per hop vs bf16 — and every partial dequantizes fused
    in-kernel, so the only divergence vs the single-chip quantized kernel is
    the fp32 merge ordering."""
    from flashattention_tpu.ops.quant import (
        attention_quantized,
        dequantize,
        quantize_kv,
    )

    n = 4
    mesh = mesh_1d(n, "sp")
    bh, s, d = 2, 4 * 128, 32
    q, k, v = qkv((bh, s, d), seed=60)
    kq, vq = quantize_kv(k, v, "int8")
    fn = make_ring_attention(
        mesh, axis_name="sp", causal=causal, window=window, kv_quant=True
    )
    o = fn(q, kq, vq)
    want_fused = attention_quantized(
        q, kq, vq, causal=causal, window=window
    )
    validate_result(o, want_fused, 6e-3, name="vs single-chip fused")
    want_oracle = attention_reference(
        q, dequantize(kq), dequantize(vq), causal=causal, window=window
    )
    validate_result(o, want_oracle, 5e-2, name="vs dequant oracle")


def test_ring_attention_quantized_kv_gqa():
    """Quantized ring composes with GQA row folding: unrepeated int8 KV on
    the wire, G query groups folded along rows."""
    from flashattention_tpu.ops.quant import QuantizedTensor, dequantize, quantize_kv
    from flashattention_tpu.parallel.ring import ring_attention_local

    n = 4
    mesh = mesh_1d(n, "sp")
    b, hq, hkv, s, d = 1, 4, 2, 4 * 128, 32
    g = hq // hkv
    ks = jax.random.split(jax.random.key(61), 3)
    q = make_random(ks[0], (b * hq, s, d))
    k = make_random(ks[1], (b * hkv, s, d))
    v = make_random(ks[2], (b * hkv, s, d))
    kq, vq = quantize_kv(k, v, "int8")

    # Fold SHARD-MAJOR: each "sp" shard must hold (g * s_local) rows laid out
    # [group0 local rows ; group1 local rows] — i.e. global row order is
    # (shard, group, s_local), not (group, s).
    s_local = s // n
    qf = (
        q.reshape(b, hkv, g, n, s_local, d)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b * hkv, g * s, d)
    )
    kv_spec = QuantizedTensor(P(None, "sp", None), P(None, "sp"))
    fn = jax.jit(
        jax.shard_map(
            lambda q, kq, vq: ring_attention_local(
                q, kq, vq, axis_name="sp", axis_size=n, causal=True,
                q_seq_len=s // n,
            ),
            mesh=mesh,
            in_specs=(P(None, "sp", None), kv_spec, kv_spec),
            out_specs=P(None, "sp", None),
            check_vma=False,
        )
    )
    of = fn(qf, kq, vq)
    o = (
        of.reshape(b, hkv, n, g, s_local, d)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b * hq, s, d)
    )
    kd = dequantize(kq)
    vd = dequantize(vq)
    want = attention_reference(
        q,
        jnp.repeat(kd, g, axis=0),
        jnp.repeat(vd, g, axis=0),
        causal=True,
    )
    validate_result(o, want, 5e-2)


@pytest.mark.parametrize("hq,hkv", [(8, 8), (8, 2), (16, 4)])
def test_ulysses_vjp_matches_dense_grads(hq, hkv):
    """Differentiable Ulysses (round 3): grads == dense-oracle autodiff.

    The comm pattern's backward falls out of autodiff (all_to_all is
    self-transposing; the GQA KV all_gather transposes to reduce-scatter);
    this pins both the MHA head-scatter and the GQA gather+fold layouts."""
    from flashattention_tpu.parallel.sharded import make_ulysses_attention_vjp

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(1, 8), ("dp", "sp"))
    b, s, d = 2, 8 * 128, 32
    ks = jax.random.split(jax.random.key(60 + hq), 4)
    q = make_random(ks[0], (b, hq, s, d))
    k = make_random(ks[1], (b, hkv, s, d))
    v = make_random(ks[2], (b, hkv, s, d))
    t = make_random(ks[3], (b, hq, s, d))
    g = hq // hkv

    def loss_ref(q, k, v):
        o = attention_reference(
            q.reshape(b * hq, s, d),
            jnp.repeat(k, g, 1).reshape(b * hq, s, d),
            jnp.repeat(v, g, 1).reshape(b * hq, s, d),
            causal=True,
        )
        return jnp.sum(o * t.reshape(b * hq, s, d))

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    spec = NamedSharding(mesh, P(None, None, "sp", None))
    qd, kd, vd = (jax.device_put(x, spec) for x in (q, k, v))
    fn = make_ulysses_attention_vjp(mesh, axis_name="sp", causal=True)

    def loss_u(q, k, v):
        return jnp.sum(fn(q, k, v) * t)

    got = jax.grad(loss_u, argnums=(0, 1, 2))(qd, kd, vd)
    for name, a, b in zip("dq dk dv".split(), got, want):
        validate_result(a, b, 5e-3, name=name)
