"""Mixtral-style MoE: dense top-k MLP through the whole stack + DP x EP
sparse training step.

The reference is attention-only; MoE is model-family scope of the framework.
Differential strategy: the sparse expert-parallel step (capacity dispatch +
local experts + psum combine) is pinned against the dense-compute MoE path
(every expert on every token, top-k combined) at a no-drop capacity — the
two must produce the same loss and the same parameter update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashattention_tpu.models import transformer
from flashattention_tpu.models.train import (
    make_train_step,
    make_train_step_ep,
    shard_params,
    shard_params_ep,
)


def moe_cfg(**kw):
    base = dict(
        vocab_size=64, num_layers=2, d_model=64, num_q_heads=4,
        num_kv_heads=2, head_dim=32, intermediate=64, dtype="float32",
        num_experts=4, experts_per_token=2,
    )
    base.update(kw)
    return transformer.ModelConfig(**base)


def test_dense_moe_mlp_matches_manual():
    """The dense MoE path == manual per-token top-k expert combination."""
    cfg = moe_cfg()
    params = transformer.init_params(jax.random.key(0), cfg)
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.key(1), (2, 8, cfg.d_model))
    out = transformer._mlp(x, layer, cfg.experts_per_token)

    logits = x @ layer["router"]
    wk, idx = jax.lax.top_k(logits, cfg.experts_per_token)
    wk = jax.nn.softmax(wk.astype(jnp.float32), axis=-1)
    want = jnp.zeros_like(x)
    for b in range(2):
        for s in range(8):
            acc = jnp.zeros((cfg.d_model,))
            for j in range(cfg.experts_per_token):
                e = int(idx[b, s, j])
                h = x[b, s]
                gate = jax.nn.silu(h @ layer["w_gate"][e])
                y = (gate * (h @ layer["w_up"][e])) @ layer["w_down"][e]
                acc = acc + wk[b, s, j] * y
            want = want.at[b, s].set(acc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_moe_serves_end_to_end():
    """MoE model through the continuous-batching engine: decode path (paged
    attention + per-token MoE) must match repeated-prefill generation."""
    from flashattention_tpu.runtime.engine import Engine, EngineConfig
    from flashattention_tpu.runtime.kvcache import CacheConfig

    cfg = moe_cfg(vocab_size=128, num_experts=4)
    params = transformer.init_params(jax.random.key(0), cfg)
    ccfg = CacheConfig(
        num_layers=cfg.num_layers, num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, page_size=8, num_pages=32, dtype="float32",
    )
    eng = Engine(params, cfg, ccfg, EngineConfig(max_batch=2, pages_per_seq=4))
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    rid = eng.add_request(prompt, 5)
    out = eng.run()[rid]

    toks = list(prompt)
    for _ in range(5):
        s = len(toks)
        sb = 8
        while sb < s:
            sb *= 2
        padded = jnp.asarray(np.pad(np.asarray(toks, np.int32), (0, sb - s))[None])
        logits, _, _ = transformer.prefill(params, padded, cfg=cfg)
        toks.append(int(jnp.argmax(logits[0, s - 1])))
    assert out == toks[len(prompt):]


def test_ep_matches_dense_at_full_capacity():
    """EP (ep=4) with no-drop capacity and aux_coef=0 == the dense-compute
    MoE step (single device): same loss, same updated params leaf-for-leaf."""
    cfg = moe_cfg(num_layers=2)
    params = transformer.init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (2, 128), 0, cfg.vocab_size)

    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "tp"))
    p1 = shard_params(params, mesh1, cfg)
    t1 = jax.device_put(tokens, NamedSharding(mesh1, P("dp", None)))
    step1 = make_train_step(mesh1, cfg, lr=1e-2)
    loss1, new1 = step1(p1, t1)

    mesh_ep = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("dp", "ep"))
    pe = shard_params_ep(params, mesh_ep, cfg)
    te = jax.device_put(tokens, NamedSharding(mesh_ep, P("dp", None)))
    # capacity_factor = E/k -> capacity = T -> nothing can drop.
    step_ep = make_train_step_ep(
        mesh_ep, cfg, lr=1e-2,
        capacity_factor=cfg.num_experts / cfg.experts_per_token,
        aux_coef=0.0,
    )
    loss_ep, new_ep = step_ep(pe, te)

    assert float(loss_ep) == pytest.approx(float(loss1), rel=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5
        ),
        new_ep, new1,
    )


def test_ep_dp_composed_learns_with_aux():
    """DP x EP (2 x 4) with realistic capacity + aux loss: finite, learns."""
    cfg = moe_cfg(num_layers=2, num_experts=8)
    params = transformer.init_params(jax.random.key(0), cfg)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "ep"))
    pe = shard_params_ep(params, mesh, cfg)
    tokens = jax.device_put(
        jax.random.randint(jax.random.key(2), (4, 128), 0, cfg.vocab_size),
        NamedSharding(mesh, P("dp", None)),
    )
    step = make_train_step_ep(
        mesh, cfg, lr=5e-2, capacity_factor=2.0, aux_coef=0.01
    )
    losses = []
    for _ in range(4):
        loss, pe = step(pe, tokens)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_ep_validation():
    cfg = moe_cfg(num_experts=6)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("dp", "ep"))
    with pytest.raises(ValueError, match="num_experts"):
        make_train_step_ep(mesh, cfg)
    dense = moe_cfg(num_experts=None)
    with pytest.raises(ValueError, match="num_experts"):
        make_train_step_ep(mesh, dense)


def test_ep_aux_gradient_mesh_independent():
    """Review finding (round 3): the aux-loss gradient must NOT scale with
    ep size.  ep=4 and ep=1 with the same aux_coef must produce the same
    loss AND the same update (the aux path's logits bypass the f-wrap)."""
    cfg = moe_cfg(num_layers=1)
    params = transformer.init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (2, 128), 0, cfg.vocab_size)
    cf = cfg.num_experts / cfg.experts_per_token  # no-drop

    results = []
    for ep in (1, 4):
        mesh = Mesh(np.array(jax.devices()[:ep]).reshape(1, ep), ("dp", "ep"))
        pe = shard_params_ep(params, mesh, cfg)
        te = jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))
        step = make_train_step_ep(
            mesh, cfg, lr=1e-2, capacity_factor=cf, aux_coef=0.1
        )
        results.append(step(pe, te))
    (loss1, new1), (loss4, new4) = results
    assert float(loss4) == pytest.approx(float(loss1), rel=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        ),
        new4, new1,
    )


def test_ep_multi_group_dispatch_matches_dense():
    """Grouped dispatch (several GShard groups) at per-group no-drop
    capacity still equals the dense-compute MoE step."""
    cfg = moe_cfg(num_layers=1)
    params = transformer.init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (2, 128), 0, cfg.vocab_size)

    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "tp"))
    p1 = shard_params(params, mesh1, cfg)
    t1 = jax.device_put(tokens, NamedSharding(mesh1, P("dp", None)))
    loss1, new1 = make_train_step(mesh1, cfg, lr=1e-2)(p1, t1)

    mesh_ep = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("dp", "ep"))
    pe = shard_params_ep(params, mesh_ep, cfg)
    te = jax.device_put(tokens, NamedSharding(mesh_ep, P("dp", None)))
    # T = 256 tokens, group_size=64 -> 4 groups of 64; cf=E/k -> C=64 no-drop.
    step_ep = make_train_step_ep(
        mesh_ep, cfg, lr=1e-2,
        capacity_factor=cfg.num_experts / cfg.experts_per_token,
        aux_coef=0.0, group_size=64,
    )
    loss_ep, new_ep = step_ep(pe, te)
    assert float(loss_ep) == pytest.approx(float(loss1), rel=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5
        ),
        new_ep, new1,
    )


def test_new_steps_accept_optax():
    """packed/pp/ep steps take any optax optimizer (opt_state threaded)."""
    import optax

    from flashattention_tpu.models.train import (
        make_train_step_ep, make_train_step_packed, shard_params,
    )

    cfg = moe_cfg(num_layers=1)
    params = transformer.init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (2, 128), 0, cfg.vocab_size)
    opt = optax.adamw(1e-3)

    mesh_ep = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("dp", "ep"))
    pe = shard_params_ep(params, mesh_ep, cfg)
    te = jax.device_put(tokens, NamedSharding(mesh_ep, P("dp", None)))
    step = make_train_step_ep(mesh_ep, cfg, optimizer=opt)
    opt_state = jax.jit(opt.init)(pe)
    losses = []
    for _ in range(3):
        loss, pe, opt_state = step(pe, opt_state, te)
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0], losses

    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "tp"))
    p1 = shard_params(params, mesh1, cfg)
    t1 = jax.device_put(tokens, NamedSharding(mesh1, P("dp", None)))
    seg = jnp.zeros_like(t1)
    step_p = make_train_step_packed(mesh1, cfg, optimizer=opt)
    os1 = jax.jit(opt.init)(p1)
    loss, p1, os1 = step_p(p1, os1, t1, seg)
    assert np.isfinite(float(loss))


def test_ep_dropout_matches_dense_at_full_capacity():
    """EP attention dropout (round 3): at dp=tp=1 the dense step's seed folds
    reduce to exactly the EP step's (dp-rank + per-layer golden-ratio mix, no
    ep fold — ep ranks replicate activations), so EP at no-drop capacity with
    dropout must STILL reproduce the dense step bit-for-bit per seed."""
    cfg = moe_cfg(num_layers=2)
    params = transformer.init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (2, 128), 0, cfg.vocab_size)
    rate, seed = 0.2, 5

    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "tp"))
    p1 = shard_params(params, mesh1, cfg)
    t1 = jax.device_put(tokens, NamedSharding(mesh1, P("dp", None)))
    step1 = make_train_step(mesh1, cfg, lr=1e-2, attn_dropout=rate)
    loss1, new1 = step1(p1, t1, seed)

    mesh_ep = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("dp", "ep"))
    pe = shard_params_ep(params, mesh_ep, cfg)
    te = jax.device_put(tokens, NamedSharding(mesh_ep, P("dp", None)))
    step_ep = make_train_step_ep(
        mesh_ep, cfg, lr=1e-2,
        capacity_factor=cfg.num_experts / cfg.experts_per_token,
        aux_coef=0.0, attn_dropout=rate,
    )
    loss_ep, new_ep = step_ep(pe, te, seed)

    assert float(loss_ep) == pytest.approx(float(loss1), rel=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5
        ),
        new_ep, new1,
    )
    # Determinism / seed sensitivity on the EP side.
    loss_ep2, _ = step_ep(pe, te, seed)
    loss_ep3, _ = step_ep(pe, te, seed + 1)
    assert float(loss_ep2) == float(loss_ep)
    assert float(loss_ep3) != float(loss_ep)
