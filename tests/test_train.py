"""Sharded training-step tests on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashattention_tpu.models import transformer
from flashattention_tpu.models.train import make_train_step, shard_params


def make_mesh(dp, tp):
    devs = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, ("dp", "tp"))


def make_model(tp):
    cfg = transformer.ModelConfig(
        vocab_size=64,
        num_layers=2,
        d_model=64,
        num_q_heads=2 * tp,
        num_kv_heads=tp,
        head_dim=32,
        intermediate=32 * tp,
        dtype="float32",
    )
    return cfg, transformer.init_params(jax.random.key(0), cfg)


@pytest.mark.parametrize("dp,tp", [(2, 4), (4, 2), (8, 1)])
def test_train_step_runs_and_learns(dp, tp):
    mesh = make_mesh(dp, tp)
    cfg, params = make_model(tp)
    params = shard_params(params, mesh, cfg)
    tokens = jax.device_put(
        jax.random.randint(jax.random.key(1), (2 * dp, 128), 0, cfg.vocab_size),
        NamedSharding(mesh, P("dp", None)),
    )
    step = make_train_step(mesh, cfg, lr=5e-2)
    losses = []
    for _ in range(5):
        loss, params = step(params, tokens)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    # Overfitting a fixed batch: loss must decrease monotonically.
    assert all(b < a for a, b in zip(losses, losses[1:])), losses


def test_tp_matches_single_device():
    # The TP=4 sharded forward/grad must match TP=1 numerically.
    cfg, params = make_model(4)
    # S must be a multiple of the kernel block size (128) in the train path.
    tokens = jax.random.randint(jax.random.key(1), (2, 128), 0, cfg.vocab_size)

    mesh1 = make_mesh(1, 1)
    # tp=1 requires num_kv_heads % 1 == 0: reuse same cfg/params.
    p1 = shard_params(params, mesh1, cfg)
    t1 = jax.device_put(tokens, NamedSharding(mesh1, P("dp", None)))
    loss1, _ = make_train_step(mesh1, cfg)(p1, t1)

    mesh4 = make_mesh(2, 4)
    p4 = shard_params(params, mesh4, cfg)
    t4 = jax.device_put(
        jnp.concatenate([tokens, tokens]), NamedSharding(mesh4, P("dp", None))
    )
    loss4, _ = make_train_step(mesh4, cfg)(p4, t4)
    np.testing.assert_allclose(float(loss1), float(loss4), rtol=2e-4)


def test_tp_grads_match_single_device():
    """Updated params (not just loss) must match TP=1 bit-for-tolerance.

    Regression test for the Megatron f/g collective pair: without it the
    replicated params' (norms/embed) gradients were per-device partials and
    the tp replicas silently diverged.
    """
    cfg, params = make_model(4)
    tokens = jax.random.randint(jax.random.key(1), (2, 128), 0, cfg.vocab_size)

    mesh1 = make_mesh(1, 1)
    p1 = shard_params(params, mesh1, cfg)
    t1 = jax.device_put(tokens, NamedSharding(mesh1, P("dp", None)))
    _, new1 = make_train_step(mesh1, cfg)(p1, t1)

    mesh4 = make_mesh(1, 4)
    p4 = shard_params(params, mesh4, cfg)
    t4 = jax.device_put(tokens, NamedSharding(mesh4, P("dp", None)))
    _, new4 = make_train_step(mesh4, cfg)(p4, t4)

    flat1 = jax.tree.leaves(new1)
    flat4 = jax.tree.leaves(new4)
    for a, b in zip(flat1, flat4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # The tp replicas of a replicated param must be identical.
    an = new4["layers"][0]["attn_norm"]
    shards = [np.asarray(s.data) for s in an.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_tp_must_divide_kv_heads():
    mesh = make_mesh(1, 8)
    cfg, _ = make_model(4)  # kv_heads=4, tp=8
    with pytest.raises(ValueError):
        make_train_step(mesh, cfg)


@pytest.mark.parametrize("zigzag", [False, True])
def test_sp_train_step_matches_single_device(zigzag):
    """Sequence-parallel training (differentiable [zigzag] ring, GQA fold)
    == single-device step.  The model is grouped-query (2 q heads / 1 kv
    head), so this also pins the round-2 VERDICT #4 contract: the ring
    rotates UNREPEATED KV (no jnp.repeat blowup) via q_seq_len folding."""
    from flashattention_tpu.models.train import make_train_step_sp

    cfg = transformer.ModelConfig(
        vocab_size=64,
        num_layers=2,
        d_model=32,
        num_q_heads=2,
        num_kv_heads=1,
        head_dim=16,
        intermediate=32,
        dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    # zigzag needs s_local // 2 (=128) to be a whole block: S = 4 * 2 * 128.
    seq = 8 * 128
    tokens = jax.random.randint(jax.random.key(1), (2, seq), 0, cfg.vocab_size)

    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "sp"))
    step1 = make_train_step_sp(mesh1, cfg)  # plain ring @ N=1 == plain causal
    t1 = jax.device_put(tokens, NamedSharding(mesh1, P("dp", "sp")))
    loss1, new1 = step1(params, t1)

    mesh4 = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    step4 = make_train_step_sp(mesh4, cfg, zigzag=zigzag)
    t4 = jax.device_put(
        jnp.concatenate([tokens, tokens]),  # dp=2 needs 4 rows; duplicate
        NamedSharding(mesh4, P("dp", "sp")),
    )
    # No repeated-KV buffers on the ring: every collective_permute (the KV /
    # grad-accumulator rotation) carries num_kv_heads-sized rows, not
    # num_q_heads-sized ones.
    hlo = step4.lower(params, t4).as_text()
    kv_rows = 2 * cfg.num_kv_heads  # local batch (2) * kv heads
    q_rows = 2 * cfg.num_q_heads
    perm_lines = [l for l in hlo.splitlines() if "collective_permute" in l]
    assert perm_lines  # the ring is actually on the wire
    assert all(f"tensor<{q_rows}x" not in l for l in perm_lines), perm_lines[:2]
    assert any(f"tensor<{kv_rows}x" in l for l in perm_lines)
    # Duplicated batch halves double every count; the mean loss and grads are
    # identical to the single-device run on the original batch.
    loss4, new4 = step4(params, t4)
    np.testing.assert_allclose(float(loss1), float(loss4), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(new1), jax.tree.leaves(new4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_optax_train_step_matches_single_device_adamw():
    """DP x TP optax step (optimizer state sharded by GSPMD) == a plain
    single-device optax run.  Param equality is pinned with SGD (well-
    conditioned); AdamW is pinned on the loss trajectory (its sign-like
    early updates amplify fp32 reduction-order noise into ~2*lr flips on
    near-zero-gradient coordinates, so raw-param equality is the wrong
    oracle there)."""
    import optax
    from flashattention_tpu.models.train import make_train_step_optax

    cfg, params = make_model(4)
    tokens = jax.random.randint(jax.random.key(5), (4, 128), 0, cfg.vocab_size)

    def run(mesh, opt, t, p):
        p = shard_params(p, mesh, cfg)
        step = make_train_step_optax(mesh, cfg, opt)
        st = jax.jit(opt.init)(p)
        losses = []
        for _ in range(3):
            l, p, st = step(p, st, t)
            losses.append(float(l))
        return losses, p

    mesh1, mesh8 = make_mesh(1, 1), make_mesh(2, 4)
    t8 = jax.device_put(
        jnp.concatenate([tokens, tokens]), NamedSharding(mesh8, P("dp", None))
    )

    sgd = optax.sgd(5e-2)
    losses1, p1 = run(mesh1, sgd, tokens, params)
    losses8, p8 = run(mesh8, sgd, t8, params)
    for a, b in zip(losses1, losses8):
        np.testing.assert_allclose(a, b, rtol=3e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)

    adamw = optax.adamw(1e-2, weight_decay=0.01)
    al1, _ = run(mesh1, adamw, tokens, params)
    al8, _ = run(mesh8, adamw, t8, params)
    assert al1[-1] < al1[0]  # it actually learns
    for a, b in zip(al1, al8):
        np.testing.assert_allclose(a, b, rtol=1e-3)


def test_sp_train_step_optax_learns():
    """SP (zigzag ring) training step with an optax optimizer: runs, loss
    decreases, and matches the single-device SGD-equivalent trajectory."""
    import optax
    from flashattention_tpu.models.train import make_train_step_sp

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=1, d_model=32, num_q_heads=2,
        num_kv_heads=1, head_dim=16, intermediate=32, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (2, 8 * 128), 0, cfg.vocab_size)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    t = jax.device_put(
        jnp.concatenate([tokens, tokens]), NamedSharding(mesh, P("dp", "sp"))
    )
    opt = optax.sgd(5e-2)
    step = make_train_step_sp(mesh, cfg, zigzag=True, optimizer=opt)
    st = jax.jit(opt.init)(params)
    # sgd-optax must equal the built-in SGD step at the same lr
    sgd_step = make_train_step_sp(mesh, cfg, zigzag=True, lr=5e-2)
    l_ref, p_ref = sgd_step(params, t)
    l_opt, p_opt, st = step(params, st, t)
    np.testing.assert_allclose(float(l_ref), float(l_opt), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_opt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


@pytest.mark.parametrize("zigzag", [False, True])
def test_sp_train_step_window_softcap_matches_single_device(zigzag):
    """SP ring training of a sliding-window + logit-softcap GQA model
    (Mistral/Gemma-2-class) == single-device step (round 3; VERDICT #6).
    window=300 at 256-token shards spans ~1.2 chunks: live-diagonal,
    live-past, and dead-past ring steps all occur."""
    from flashattention_tpu.models.train import make_train_step_sp

    cfg = transformer.ModelConfig(
        vocab_size=64,
        num_layers=2,
        d_model=32,
        num_q_heads=2,
        num_kv_heads=1,
        head_dim=16,
        intermediate=32,
        dtype="float32",
        sliding_window=300,
        logit_softcap=30.0,
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    seq = 8 * 128
    tokens = jax.random.randint(jax.random.key(1), (2, seq), 0, cfg.vocab_size)

    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "sp"))
    step1 = make_train_step_sp(mesh1, cfg)
    t1 = jax.device_put(tokens, NamedSharding(mesh1, P("dp", "sp")))
    loss1, new1 = step1(params, t1)

    mesh4 = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    step4 = make_train_step_sp(mesh4, cfg, zigzag=zigzag)
    t4 = jax.device_put(
        jnp.concatenate([tokens, tokens]),
        NamedSharding(mesh4, P("dp", "sp")),
    )
    loss4, new4 = step4(params, t4)
    np.testing.assert_allclose(float(loss1), float(loss4), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(new1), jax.tree.leaves(new4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


# ── pipeline parallelism (round 3) ──────────────────────────────────────────


def test_pp_matches_single_device():
    """GPipe pipeline (pp=4, 2 microbatches) must reproduce the dense
    single-device loss and parameter update."""
    from flashattention_tpu.models.train import (
        make_train_step_pp, shard_params_pp,
    )

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=4, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (4, 128), 0, cfg.vocab_size)

    # Single-device dense baseline (dp=1, tp=1 path).
    mesh1 = make_mesh(1, 1)
    p1 = shard_params(params, mesh1, cfg)
    t1 = jax.device_put(tokens, NamedSharding(mesh1, P("dp", None)))
    step1 = make_train_step(mesh1, cfg, lr=1e-2)
    loss1, new1 = step1(p1, t1)

    mesh_pp = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("dp", "pp"))
    pp_params = shard_params_pp(params, mesh_pp, cfg)
    t4 = jax.device_put(tokens, NamedSharding(mesh_pp, P("dp", None)))
    step_pp = make_train_step_pp(mesh_pp, cfg, lr=1e-2, n_microbatches=2)
    loss_pp, new_pp = step_pp(pp_params, t4)

    assert float(loss_pp) == pytest.approx(float(loss1), rel=2e-5)
    # Updated params must match leaf-for-leaf (stacked layout vs list).
    stacked1 = jax.tree.map(
        lambda *xs: jnp.stack(xs), *new1["layers"]
    )
    for key in ("embed", "final_norm", "lm_head"):
        np.testing.assert_allclose(
            np.asarray(new_pp[key]), np.asarray(new1[key]), atol=2e-5
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        new_pp["layers"], stacked1,
    )


def test_pp_dp_composed_learns():
    """DP x PP (2 x 4): runs, loss finite and decreasing on a fixed batch."""
    from flashattention_tpu.models.train import (
        make_train_step_pp, shard_params_pp,
    )

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=4, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "pp"))
    pp_params = shard_params_pp(params, mesh, cfg)
    tokens = jax.device_put(
        jax.random.randint(jax.random.key(2), (4, 128), 0, cfg.vocab_size),
        NamedSharding(mesh, P("dp", None)),
    )
    step = make_train_step_pp(mesh, cfg, lr=5e-2, n_microbatches=2)
    losses = []
    for _ in range(4):
        loss, pp_params = step(pp_params, tokens)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_pp_validation():
    from flashattention_tpu.models.train import make_train_step_pp

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=3, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("dp", "pp"))
    with pytest.raises(ValueError, match="num_layers"):
        make_train_step_pp(mesh, cfg)


def test_model_family_presets_construct_and_run():
    """The Mistral/Gemma-2/Mixtral-class presets build valid configs whose
    distinguishing features (GQA ratio, window, softcap, MoE) are set; the
    feature paths themselves are trained elsewhere in this file and in
    test_dropout/test_moe."""
    from flashattention_tpu.models.transformer import ModelConfig

    m = ModelConfig.mistral7b()
    assert m.group_size == 4 and m.sliding_window == 4096
    g = ModelConfig.gemma2_9b()
    assert g.head_dim == 256 and g.logit_softcap == 50.0
    x = ModelConfig.mixtral8x7b(num_layers=3)
    assert x.num_experts == 8 and x.experts_per_token == 2 and x.num_layers == 3


def test_pp_train_step_with_attention_dropout():
    """PP attention dropout (round 3): deterministic per seed, new seed
    changes the draw, finite over steps; masks fold (dp, pipeline step,
    global layer)."""
    from flashattention_tpu.models.train import (
        make_train_step_pp, shard_params_pp,
    )

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=4, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "pp"))
    pp_params = shard_params_pp(params, mesh, cfg)
    tokens = jax.device_put(
        jax.random.randint(jax.random.key(2), (4, 128), 0, cfg.vocab_size),
        NamedSharding(mesh, P("dp", None)),
    )
    step = make_train_step_pp(
        mesh, cfg, lr=5e-2, n_microbatches=2, attn_dropout=0.1
    )
    l0a, _ = step(pp_params, tokens, 0)
    l0b, _ = step(pp_params, tokens, 0)
    l1, _ = step(pp_params, tokens, 1)
    assert float(l0a) == float(l0b)
    assert float(l0a) != float(l1)
    p = pp_params
    for i in range(3):
        loss, p = step(p, tokens, i)
        assert np.isfinite(float(loss))
    # Dropout off keeps the historical two-arg signature working.
    step_plain = make_train_step_pp(mesh, cfg, lr=5e-2, n_microbatches=2)
    loss, _ = step_plain(pp_params, tokens)
    assert np.isfinite(float(loss))


# ── 3D parallelism: DP x TP x SP (round 3) ──────────────────────────────────


@pytest.mark.parametrize("zigzag", [False, True])
def test_3d_matches_single_device(zigzag):
    """DP x TP x SP (2x2x2) must reproduce the dense single-device loss and
    parameter update: Megatron f/g grads + ring-SP psum compose exactly."""
    from flashattention_tpu.models.train import make_train_step_3d

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    s = 2 * 2 * 128 if zigzag else 2 * 128
    tokens = jax.random.randint(jax.random.key(1), (4, s), 0, cfg.vocab_size)

    mesh1 = make_mesh(1, 1)
    p1 = shard_params(params, mesh1, cfg)
    t1 = jax.device_put(tokens, NamedSharding(mesh1, P("dp", None)))
    step1 = make_train_step(mesh1, cfg, lr=1e-2)
    loss1, new1 = step1(p1, t1)

    mesh3 = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 2, 2), ("dp", "tp", "sp")
    )
    p3 = shard_params(params, mesh3, cfg)
    t3 = jax.device_put(tokens, NamedSharding(mesh3, P("dp", "sp")))
    step3 = make_train_step_3d(mesh3, cfg, lr=1e-2, zigzag=zigzag)
    loss3, new3 = step3(p3, t3)

    assert float(loss3) == pytest.approx(float(loss1), rel=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5
        ),
        new3, new1,
    )


def test_3d_train_step_with_attention_dropout():
    """3D step with attn_dropout: deterministic per seed, seed-sensitive,
    finite; masks fold (dp, tp, layer) + the ring's (sp, chunk, piece)."""
    from flashattention_tpu.models.train import make_train_step_3d

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    mesh3 = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 2, 2), ("dp", "tp", "sp")
    )
    p3 = shard_params(params, mesh3, cfg)
    tokens = jax.device_put(
        jax.random.randint(jax.random.key(2), (4, 2 * 128), 0, cfg.vocab_size),
        NamedSharding(mesh3, P("dp", "sp")),
    )
    step = make_train_step_3d(mesh3, cfg, lr=5e-2, attn_dropout=0.1)
    l0a, _ = step(p3, tokens, 0)
    l0b, _ = step(p3, tokens, 0)
    l1, _ = step(p3, tokens, 1)
    assert float(l0a) == float(l0b)
    assert float(l0a) != float(l1)
    p = p3
    for i in range(3):
        loss, p = step(p, tokens, i)
        assert np.isfinite(float(loss))


def test_3d_optax_matches_sgd():
    """3D step with an optax SGD == the built-in SGD update."""
    import optax

    from flashattention_tpu.models.train import make_train_step_3d

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=1, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    mesh3 = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 2, 2), ("dp", "tp", "sp")
    )
    p3 = shard_params(params, mesh3, cfg)
    tokens = jax.device_put(
        jax.random.randint(jax.random.key(3), (4, 2 * 128), 0, cfg.vocab_size),
        NamedSharding(mesh3, P("dp", "sp")),
    )
    step_sgd = make_train_step_3d(mesh3, cfg, lr=1e-2)
    loss_a, new_a = step_sgd(p3, tokens)

    opt = optax.sgd(1e-2)
    step_opt = make_train_step_3d(mesh3, cfg, optimizer=opt)
    loss_b, new_b, _ = step_opt(p3, opt.init(p3), tokens)
    assert float(loss_a) == pytest.approx(float(loss_b), rel=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        new_a, new_b,
    )


# ── FSDP / ZeRO-3 (round 3) ─────────────────────────────────────────────────


def test_fsdp_matches_single_device():
    """FSDP over 8 devices == dense single-device loss and update: the
    all_gather transpose (psum_scatter) IS the exact ZeRO gradient
    reduce-scatter, and at-rest leaves stay sharded."""
    from flashattention_tpu.models.train import (
        make_train_step_fsdp, shard_params_fsdp,
    )

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (8, 128), 0, cfg.vocab_size)

    mesh1 = make_mesh(1, 1)
    p1 = shard_params(params, mesh1, cfg)
    t1 = jax.device_put(tokens, NamedSharding(mesh1, P("dp", None)))
    step1 = make_train_step(mesh1, cfg, lr=1e-2)
    loss1, new1 = step1(p1, t1)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    pf, specs = shard_params_fsdp(params, mesh)
    tf = jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))
    step = make_train_step_fsdp(mesh, cfg, lr=1e-2)
    loss_f, new_f = step(pf, tf)

    assert float(loss_f) == pytest.approx(float(loss1), rel=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5
        ),
        new_f, new1,
    )
    # Updated params keep the at-rest sharded layout (O(total/N) per chip).
    assert new_f["embed"].sharding.spec == P("dp")


def test_fsdp_optax_and_dropout():
    """FSDP with adam state sharded like the params; dropout deterministic
    per seed and seed-sensitive."""
    import optax

    from flashattention_tpu.models.train import (
        make_train_step_fsdp, shard_params_fsdp,
    )

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    pf, _ = shard_params_fsdp(params, mesh)
    tokens = jax.device_put(
        jax.random.randint(jax.random.key(2), (8, 128), 0, cfg.vocab_size),
        NamedSharding(mesh, P("dp", None)),
    )
    opt = optax.adam(1e-3)
    state = opt.init(pf)
    # Optimizer moments inherit the sharded layout — the ZeRO memory claim.
    assert state[0].mu["embed"].sharding.spec == P("dp")
    step = make_train_step_fsdp(mesh, cfg, optimizer=opt, attn_dropout=0.1)
    l0a, _, _ = step(pf, state, tokens, 0)
    l0b, _, _ = step(pf, state, tokens, 0)
    l1, _, _ = step(pf, state, tokens, 1)
    assert float(l0a) == float(l0b)
    assert float(l0a) != float(l1)
    p, s = pf, state
    for i in range(3):
        loss, p, s = step(p, s, tokens, i)
        assert np.isfinite(float(loss))


def test_remat_matches_no_remat_everywhere():
    """jax.checkpoint layer rematerialization is semantics-preserving: every
    step family produces the same loss and update with remat on/off —
    including under dropout (the recomputed forward regenerates identical
    masks from the same seed folds)."""
    from flashattention_tpu.models.train import (
        make_train_step_3d,
        make_train_step_ep,
        make_train_step_fsdp,
        make_train_step_pp,
        make_train_step_sp,
        shard_params_ep,
        shard_params_fsdp,
        shard_params_pp,
    )

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)

    def check(a, b, what):
        la, pa = a
        lb, pb = b
        assert float(la) == pytest.approx(float(lb), rel=1e-6), what
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=1e-6, err_msg=what
            ),
            pa, pb,
        )

    # Dense DP x TP, with dropout.
    mesh = make_mesh(2, 2)
    p = shard_params(params, mesh, cfg)
    t = jax.device_put(
        jax.random.randint(jax.random.key(1), (4, 128), 0, 64),
        NamedSharding(mesh, P("dp", None)),
    )
    a = make_train_step(mesh, cfg, lr=1e-2, attn_dropout=0.1)(p, t, 3)
    b = make_train_step(mesh, cfg, lr=1e-2, attn_dropout=0.1, remat=True)(p, t, 3)
    check(a, b, "dense+dropout")

    # SP zigzag ring.
    mesh_sp = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    p_sp = jax.device_put(params, NamedSharding(mesh_sp, P()))
    t_sp = jax.device_put(
        jax.random.randint(jax.random.key(2), (2, 4 * 2 * 128), 0, 64),
        NamedSharding(mesh_sp, P("dp", "sp")),
    )
    a = make_train_step_sp(mesh_sp, cfg, lr=1e-2, zigzag=True)(p_sp, t_sp)
    b = make_train_step_sp(mesh_sp, cfg, lr=1e-2, zigzag=True, remat=True)(
        p_sp, t_sp
    )
    check(a, b, "sp-zigzag")

    # 3D.
    mesh3 = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2), ("dp", "tp", "sp"))
    p3 = shard_params(params, mesh3, cfg)
    t3 = jax.device_put(
        jax.random.randint(jax.random.key(3), (4, 2 * 128), 0, 64),
        NamedSharding(mesh3, P("dp", "sp")),
    )
    a = make_train_step_3d(mesh3, cfg, lr=1e-2)(p3, t3)
    b = make_train_step_3d(mesh3, cfg, lr=1e-2, remat=True)(p3, t3)
    check(a, b, "3d")

    # FSDP (gather inside the checkpointed layer).
    mesh_f = Mesh(np.array(jax.devices()[:8]), ("dp",))
    pf, _ = shard_params_fsdp(params, mesh_f)
    tf = jax.device_put(
        jax.random.randint(jax.random.key(4), (8, 128), 0, 64),
        NamedSharding(mesh_f, P("dp", None)),
    )
    a = make_train_step_fsdp(mesh_f, cfg, lr=1e-2, attn_dropout=0.1)(pf, tf, 5)
    b = make_train_step_fsdp(mesh_f, cfg, lr=1e-2, attn_dropout=0.1, remat=True)(
        pf, tf, 5
    )
    check(a, b, "fsdp+dropout")

    # PP.
    mesh_pp = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("dp", "pp"))
    cfg_pp = transformer.ModelConfig(
        vocab_size=64, num_layers=4, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params_pp = transformer.init_params(jax.random.key(5), cfg_pp)
    ppp = shard_params_pp(params_pp, mesh_pp, cfg_pp)
    tpp = jax.device_put(
        jax.random.randint(jax.random.key(6), (4, 128), 0, 64),
        NamedSharding(mesh_pp, P("dp", None)),
    )
    a = make_train_step_pp(mesh_pp, cfg_pp, lr=1e-2, n_microbatches=2)(ppp, tpp)
    b = make_train_step_pp(
        mesh_pp, cfg_pp, lr=1e-2, n_microbatches=2, remat=True
    )(ppp, tpp)
    check(a, b, "pp")

    # EP MoE.
    cfg_ep = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
        num_experts=4, experts_per_token=2,
    )
    params_ep = transformer.init_params(jax.random.key(7), cfg_ep)
    mesh_ep = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("dp", "ep"))
    pe = shard_params_ep(params_ep, mesh_ep, cfg_ep)
    te = jax.device_put(
        jax.random.randint(jax.random.key(8), (2, 128), 0, 64),
        NamedSharding(mesh_ep, P("dp", None)),
    )
    a = make_train_step_ep(mesh_ep, cfg_ep, lr=1e-2)(pe, te)
    b = make_train_step_ep(mesh_ep, cfg_ep, lr=1e-2, remat=True)(pe, te)
    check(a, b, "ep")


def test_fsdp_replicated_leaves_exact():
    """FSDP with dims that DON'T divide the axis: indivisible leaves
    replicate, and their grads must still psum over fsdp (review finding —
    the gather transpose only reduces sharded leaves)."""
    from flashattention_tpu.models.train import (
        fsdp_param_specs, make_train_step_fsdp, shard_params_fsdp,
    )

    # vocab=62, d_model=68: embed/norms/lm_head have NO dim divisible by 8
    # (they replicate); wq/wo etc. shard via their 128-sized head dim.
    cfg = transformer.ModelConfig(
        vocab_size=62, num_layers=2, d_model=68, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    specs = fsdp_param_specs(params, mesh)
    assert specs["final_norm"] == P()  # really exercises the replicated path
    assert specs["layers"][0]["wq"] == P(None, "dp")

    tokens = jax.random.randint(jax.random.key(1), (8, 128), 0, cfg.vocab_size)
    mesh1 = make_mesh(1, 1)
    p1 = shard_params(params, mesh1, cfg)
    t1 = jax.device_put(tokens, NamedSharding(mesh1, P("dp", None)))
    loss1, new1 = make_train_step(mesh1, cfg, lr=1e-2)(p1, t1)

    pf, _ = shard_params_fsdp(params, mesh)
    tf = jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))
    loss_f, new_f = make_train_step_fsdp(mesh, cfg, lr=1e-2)(pf, tf)

    assert float(loss_f) == pytest.approx(float(loss1), rel=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5
        ),
        new_f, new1,
    )


def test_vocab_parallel_matches_replicated():
    """Megatron vocab parallelism (round 3): embed + lm_head sharded over
    the vocab dim, loss through the distributed cross-entropy (custom-VJP:
    softmax_local - onehot_local) == the replicated-lm_head step exactly,
    with the vocab-sharded layout preserved in the update."""
    from flashattention_tpu.models.train import make_train_step_optax
    import optax

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    mesh = make_mesh(2, 2)
    tokens = jax.device_put(
        jax.random.randint(jax.random.key(1), (4, 128), 0, cfg.vocab_size),
        NamedSharding(mesh, P("dp", None)),
    )

    p_rep = shard_params(params, mesh, cfg)
    loss_a, new_a = make_train_step(mesh, cfg, lr=1e-2)(p_rep, tokens)

    p_vp = shard_params(params, mesh, cfg, vocab_parallel=True)
    assert p_vp["embed"].sharding.spec == P("tp", None)
    assert p_vp["lm_head"].sharding.spec == P(None, "tp")
    loss_b, new_b = make_train_step(mesh, cfg, lr=1e-2, vocab_parallel=True)(
        p_vp, tokens
    )

    assert float(loss_a) == pytest.approx(float(loss_b), rel=2e-5)
    # 5e-5: the distributed lse and log_softmax reduce in different orders.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        ),
        new_a, new_b,
    )
    assert new_b["lm_head"].sharding.spec == P(None, "tp")

    # Composes with dropout + remat + optax.
    opt = optax.sgd(1e-2)
    step_o = make_train_step_optax(
        mesh, cfg, opt, attn_dropout=0.1, remat=True, vocab_parallel=True
    )
    loss_o, _, _ = step_o(p_vp, opt.init(p_vp), tokens, 7)
    step_r = make_train_step(
        mesh, cfg, lr=1e-2, attn_dropout=0.1, remat=True, vocab_parallel=True
    )
    loss_r, _ = step_r(p_vp, tokens, 7)
    assert float(loss_o) == pytest.approx(float(loss_r), rel=1e-6)
    with pytest.raises(ValueError, match="vocab_parallel"):
        make_train_step(
            mesh,
            transformer.ModelConfig(
                vocab_size=63, num_layers=1, d_model=64, num_q_heads=4,
                num_kv_heads=2, head_dim=32, intermediate=64,
            ),
            vocab_parallel=True,
        )


def test_fsdp_tp_matches_single_device():
    """FSDP x TP 2D (fsdp=2 x tp=4): every leaf Megatron-sharded over tp AND
    at-rest sharded over fsdp; per-layer fsdp gather inside the (remat)
    layer == the dense single-device update leaf-for-leaf."""
    from flashattention_tpu.models.train import (
        make_train_step_fsdp, shard_params_fsdp,
    )

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=8,
        num_kv_heads=4, head_dim=32, intermediate=128, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (4, 128), 0, cfg.vocab_size)

    mesh1 = make_mesh(1, 1)
    p1 = shard_params(params, mesh1, cfg)
    t1 = jax.device_put(tokens, NamedSharding(mesh1, P("dp", None)))
    loss1, new1 = make_train_step(mesh1, cfg, lr=1e-2)(p1, t1)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))
    pf, specs = shard_params_fsdp(params, mesh, tp="tp", cfg=cfg)
    # Both axes really appear in the at-rest layout.
    assert specs["layers"][0]["wq"] == P("dp", "tp")
    assert specs["embed"] == P("dp", None)
    tf = jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))
    for remat in (False, True):
        step = make_train_step_fsdp(mesh, cfg, tp="tp", lr=1e-2, remat=remat)
        loss_f, new_f = step(pf, tf)
        assert float(loss_f) == pytest.approx(float(loss1), rel=2e-5), remat
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5
            ),
            new_f, new1,
        )
        # At-rest layout preserved through the update.
        assert new_f["layers"][0]["wq"].sharding.spec == P("dp", "tp")


def test_packed_vocab_parallel_matches_replicated():
    """Packed rows + vocab_parallel: the masked loss through the distributed
    cross-entropy == the replicated-lm_head packed step (pins the
    padding/segment-target interaction with the vp ok-mask psums)."""
    from flashattention_tpu.models.train import make_train_step_packed

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    params = transformer.init_params(jax.random.key(0), cfg)
    mesh = make_mesh(2, 2)
    b, s = 4, 128
    tokens = jax.device_put(
        jax.random.randint(jax.random.key(1), (b, s), 0, cfg.vocab_size),
        NamedSharding(mesh, P("dp", None)),
    )
    # Two docs per row plus a padding tail (negative segment id).
    seg = np.zeros((b, s), np.int32)
    seg[:, 60:] = 1
    seg[:, 110:] = -1
    segs = jax.device_put(jnp.asarray(seg), NamedSharding(mesh, P("dp", None)))

    p_rep = shard_params(params, mesh, cfg)
    loss_a, new_a = make_train_step_packed(mesh, cfg, lr=1e-2)(
        p_rep, tokens, segs
    )
    p_vp = shard_params(params, mesh, cfg, vocab_parallel=True)
    loss_b, new_b = make_train_step_packed(
        mesh, cfg, lr=1e-2, vocab_parallel=True
    )(p_vp, tokens, segs)

    assert float(loss_a) == pytest.approx(float(loss_b), rel=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        ),
        new_a, new_b,
    )


def test_shard_params_fsdp_tp_requires_cfg():
    from flashattention_tpu.models.train import shard_params_fsdp

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))
    with pytest.raises(ValueError, match="requires cfg"):
        shard_params_fsdp({"w": jnp.zeros((8, 8))}, mesh, tp="tp")


def test_mixed_precision_master_weights():
    """compute_dtype='bfloat16' with fp32 masters: the FIRST forward equals
    a genuinely-bf16-params model exactly (same compute numbers), masters
    and their updates stay fp32, and training stays finite — the standard
    mixed-precision recipe, via just-in-time weight casts whose autodiff
    transpose returns full-precision master grads."""
    import dataclasses

    cfg32 = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    cfg16 = dataclasses.replace(cfg32, dtype="bfloat16")
    params = transformer.init_params(jax.random.key(0), cfg32)
    params16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params,
    )
    mesh = make_mesh(2, 2)
    tokens = jax.device_put(
        jax.random.randint(jax.random.key(1), (4, 128), 0, cfg32.vocab_size),
        NamedSharding(mesh, P("dp", None)),
    )

    p32 = shard_params(params, mesh, cfg32)
    step_mp = make_train_step(mesh, cfg32, lr=1e-2, compute_dtype="bfloat16")
    loss_mp, new_mp = step_mp(p32, tokens)

    p16 = shard_params(params16, mesh, cfg16)
    loss_16, _ = make_train_step(mesh, cfg16, lr=1e-2)(p16, tokens)
    assert float(loss_mp) == pytest.approx(float(loss_16), rel=1e-6)

    # Masters stay fp32 and actually update.
    assert new_mp["layers"][0]["wq"].dtype == jnp.float32
    assert not np.allclose(
        np.asarray(new_mp["layers"][0]["wq"]),
        np.asarray(p32["layers"][0]["wq"]),
    )
    p = new_mp
    for _ in range(3):
        loss, p = step_mp(p, tokens)
        assert np.isfinite(float(loss))
    # Composes with remat + dropout + vocab_parallel in one step.
    p_vp = shard_params(params, mesh, cfg32, vocab_parallel=True)
    step_all = make_train_step(
        mesh, cfg32, lr=1e-2, compute_dtype="bfloat16", remat=True,
        attn_dropout=0.1, vocab_parallel=True,
    )
    loss_all, _ = step_all(p_vp, tokens, 3)
    assert np.isfinite(float(loss_all))


# ── LoRA fine-tuning (round 3) ──────────────────────────────────────────────


def test_lora_grads_are_exact_chain_rule():
    """LoRA adapter gradients equal the chain rule through the merge:
    dA = dW @ B^T * (alpha/r), dB = A^T @ dW * (alpha/r), where dW is the
    FULL fine-tune gradient of the merged model — pins the just-in-time
    merge as the exact LoRA forward, not an approximation."""
    from flashattention_tpu.models.train import (
        init_lora, make_train_step_lora, merge_lora,
    )

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=1, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    base = transformer.init_params(jax.random.key(0), cfg)
    r, alpha, lr = 4, 16.0, 1.0
    lora = init_lora(jax.random.key(1), base, rank=r, targets=("wq", "wv"))
    # Non-zero B so the adapters shape the forward too.
    lora = jax.tree.map(lambda a: a + 0.01, lora)

    mesh = make_mesh(1, 1)
    tokens = jax.device_put(
        jax.random.randint(jax.random.key(2), (2, 128), 0, cfg.vocab_size),
        NamedSharding(mesh, P("dp", None)),
    )
    base_s = shard_params(base, mesh, cfg)

    step = make_train_step_lora(mesh, cfg, alpha=alpha, lr=lr)
    loss_l, new_lora = step(base_s, lora, tokens)
    # grads recovered from the SGD update at lr=1.
    dA = np.asarray(lora[0]["wq"]["a"]) - np.asarray(new_lora[0]["wq"]["a"])
    dB = np.asarray(lora[0]["wq"]["b"]) - np.asarray(new_lora[0]["wq"]["b"])

    # Full fine-tune of the explicitly merged model gives dW.
    merged = shard_params(merge_lora(base, lora, alpha), mesh, cfg)
    step_full = make_train_step(mesh, cfg, lr=lr)
    loss_f, new_full = step_full(merged, tokens)
    assert float(loss_l) == pytest.approx(float(loss_f), rel=1e-6)
    dW = np.asarray(merged["layers"][0]["wq"]) - np.asarray(
        new_full["layers"][0]["wq"]
    )
    s = alpha / r
    np.testing.assert_allclose(
        dA, dW @ np.asarray(lora[0]["wq"]["b"]).T * s, atol=1e-5
    )
    np.testing.assert_allclose(
        dB, np.asarray(lora[0]["wq"]["a"]).T @ dW * s, atol=1e-5
    )


def test_lora_trains_and_base_frozen_tp():
    """DP x TP LoRA: B=0 init equals the base forward; training moves the
    loss while touching ONLY the adapter tree; matches tp=1 exactly."""
    from flashattention_tpu.models.train import init_lora, make_train_step_lora

    cfg = transformer.ModelConfig(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
    )
    base = transformer.init_params(jax.random.key(0), cfg)
    lora = init_lora(jax.random.key(1), base, rank=4, targets=("wq", "wo"))
    tokens = jax.random.randint(jax.random.key(2), (4, 128), 0, cfg.vocab_size)

    mesh1 = make_mesh(1, 1)
    b1 = shard_params(base, mesh1, cfg)
    t1 = jax.device_put(tokens, NamedSharding(mesh1, P("dp", None)))
    step1 = make_train_step_lora(mesh1, cfg, lr=5e-2)
    # B=0: the first loss equals the frozen base model's loss.
    loss_base, _ = make_train_step(mesh1, cfg, lr=0.0)(b1, t1)
    loss0, lora1 = step1(b1, lora, t1)
    assert float(loss0) == pytest.approx(float(loss_base), rel=1e-6)

    mesh = make_mesh(2, 2)
    b2 = shard_params(base, mesh, cfg)
    t2 = jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))
    step2 = make_train_step_lora(mesh, cfg, lr=5e-2)
    loss0b, lora1b = step2(b2, lora, t2)
    assert float(loss0) == pytest.approx(float(loss0b), rel=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5
        ),
        lora1, lora1b,
    )
    # A few steps reduce the loss through the adapters alone.
    l, cur = loss0, lora
    for _ in range(5):
        l2, cur = step2(b2, cur, t2)
    assert float(l2) < float(loss0)
