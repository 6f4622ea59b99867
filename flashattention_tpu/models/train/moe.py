"""Expert parallelism: GShard-style MoE dispatch + EP training step.

Split out of the former models/train.py monolith (round 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from flashattention_tpu.models.transformer import ModelConfig, _rmsnorm
from flashattention_tpu.models.train.common import _f_identity, _g_allreduce, _make_step, token_nll
from flashattention_tpu.models.train.forward import _attn_block


def _moe_mlp_ep(
    x, layer, cfg: ModelConfig, ep: str, ep_size: int, capacity: int,
    group_size: int | None = None,
):
    """Sparse expert-parallel MoE MLP (round 3): capacity dispatch + local
    experts + psum combine.

    Replicated-activation EP: tokens are replicated across the ep axis (they
    are dp-sharded only), so no all_to_all is needed — each rank gathers the
    routed tokens for ITS E/ep experts with a capacity-bucketed dispatch
    einsum (GShard-style: position-in-expert via cumsum, items past
    ``capacity`` are dropped), runs its local expert stack, and one psum
    combines the weighted expert outputs.  Per-rank expert compute is
    O(E_local * capacity) instead of O(T * E) — the sparse-MoE saving —
    at the cost of every rank holding the activations (the standard
    expert-data-parallel deployment).

    Gradient exactness: the two ``_f_identity`` wraps (on the token stream
    feeding the dispatch einsum and on the router logits) psum the per-rank
    partial cotangents, and the output ``_g_allreduce`` is psum-forward /
    identity-backward — every replicated parameter's gradient comes out
    exact and bitwise-replicated with NO post-hoc collectives.

    Returns (output, aux) where aux is the switch-style load-balancing loss,
    normalized so perfectly uniform routing gives aux = 1.
    """
    b, s, d = x.shape
    t = b * s
    k = cfg.experts_per_token
    e = cfg.num_experts
    gs = group_size if group_size and group_size < t else t
    if t % gs:
        raise ValueError(f"group_size ({gs}) must divide tokens ({t})")
    n_g = t // gs
    hf = x.reshape(t, d)
    hf_f = _f_identity(hf, ep)
    # Two logits views with different cotangent structure (review finding,
    # round 3): the COMBINE path's cotangent is a per-rank partial (each rank
    # only backprops its expert slice) -> f-wrap psums it exact; the AUX
    # path is computed identically on every rank -> its cotangent is already
    # replicated-exact, and routing it through the same f-wrap would
    # multiply the aux gradient by ep_size.
    logits_raw = hf @ layer["router"]  # (T, E): aux path, replicated grads
    logits = _f_identity(logits_raw, ep)  # combine path, partial grads
    wk, idx = jax.lax.top_k(logits, k)
    wk = jax.nn.softmax(wk.astype(jnp.float32), axis=-1)  # (T, k)
    # GShard-style token GROUPS (review finding, round 3): position-in-expert
    # counts and the dispatch one-hots live per fixed-size group, so the
    # dispatch tensor is (G, gs*k, E, C) with C ~ gs — memory and dispatch
    # FLOPs linear in T, not the quadratic a single global group costs.
    flat_e = idx.reshape(n_g, gs * k)  # row-major (token, choice) items
    onehot = jax.nn.one_hot(flat_e, e, dtype=jnp.int32)  # (G, gs*k, E)
    pos = jnp.sum(jnp.cumsum(onehot, axis=1) * onehot, axis=2) - 1
    keep = (pos < capacity).astype(jnp.float32)  # (G, gs*k)
    disp = (
        jax.nn.one_hot(flat_e, e, dtype=jnp.float32) * keep[..., None]
    )[..., None] * jax.nn.one_hot(
        jnp.clip(pos, 0), capacity, dtype=jnp.float32
    )[..., None, :]
    disp = disp.reshape(n_g, gs, k, e, capacity)
    dispatch = jnp.sum(disp, axis=2)  # (G, gs, E, C) 0/1
    combine = jnp.einsum(
        "gtkec,gtk->gtec", disp, wk.reshape(n_g, gs, k)
    )  # routing-weighted
    ein = jnp.einsum(
        "gtec,gtd->egcd", dispatch, hf_f.astype(jnp.float32).reshape(n_g, gs, d)
    )  # (E, G, C, d)
    rank = jax.lax.axis_index(ep)
    e_l = e // ep_size
    ein_l = jax.lax.dynamic_slice_in_dim(
        ein.astype(x.dtype), rank * e_l, e_l, axis=0
    ).reshape(e_l, n_g * capacity, d)
    gate = jax.nn.silu(jnp.einsum("ecd,edf->ecf", ein_l, layer["w_gate"]))
    up = jnp.einsum("ecd,edf->ecf", ein_l, layer["w_up"])
    ye = jnp.einsum("ecf,efd->ecd", gate * up, layer["w_down"])
    ye = ye.reshape(e_l, n_g, capacity, d)
    comb_l = jax.lax.dynamic_slice_in_dim(combine, rank * e_l, e_l, axis=2)
    out = jnp.einsum("gtec,egcd->gtd", comb_l.astype(ye.dtype), ye)
    out = _g_allreduce(out.reshape(t, d), ep)
    # Switch-style load balance: f_e = routed fraction, p_e = mean router
    # prob; (E/k) * sum(f_e p_e) == 1 under uniform routing.  From the RAW
    # logits (see above) so the aux gradient is mesh-size-independent.
    probs = jax.nn.softmax(logits_raw.astype(jnp.float32), axis=-1)
    f_e = jnp.mean(onehot.astype(jnp.float32), axis=(0, 1)) * k
    aux = (e / k) * jnp.sum(f_e * jnp.mean(probs, axis=0))
    return out.reshape(b, s, d).astype(x.dtype), aux


def ep_param_specs(cfg: ModelConfig, ep: str = "ep") -> dict:
    """PartitionSpecs for expert parallelism: expert stacks sharded on their
    leading E dim over ep; everything else (attention, router, embeddings)
    replicated."""
    if cfg.num_experts is None:
        raise ValueError("expert parallelism requires cfg.num_experts")
    layer = {
        "attn_norm": P(),
        "wq": P(),
        "wk": P(),
        "wv": P(),
        "wo": P(),
        "mlp_norm": P(),
        "router": P(),
        "w_gate": P(ep, None, None),
        "w_up": P(ep, None, None),
        "w_down": P(ep, None, None),
    }
    return {
        "embed": P(),
        "final_norm": P(),
        "lm_head": P(),
        "layers": [dict(layer) for _ in range(cfg.num_layers)],
    }


def shard_params_ep(params, mesh: Mesh, cfg: ModelConfig, ep: str = "ep"):
    specs = ep_param_specs(cfg, ep)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, jax.Array),
    )


def make_train_step_ep(
    mesh: Mesh,
    cfg: ModelConfig,
    *,
    dp: str = "dp",
    ep: str = "ep",
    lr: float = 1e-3,
    capacity_factor: float = 2.0,
    aux_coef: float = 0.01,
    group_size: int = 1024,
    optimizer=None,
    attn_dropout: float | None = None,
    remat: bool = False,
):
    """DP x EP training step for MoE models (round 3).

    ``step(params, tokens) -> (loss, new_params)`` with params from
    :func:`shard_params_ep`.  Tokens dispatch in fixed-size GROUPS of
    ``group_size`` (largest divisor of T_local is used) with per-group
    expert capacity ``ceil(capacity_factor * k * group / E)``; routed items
    past it drop (standard GShard semantics — ``capacity_factor >= E / k``
    disables dropping entirely, which is also how the differential test
    pins this step against the dense-compute MoE).  ``aux_coef`` weights
    the switch-style load-balancing loss.

    ``attn_dropout`` (round 3): the step takes a trailing traced-int32
    ``seed``; masks fold (dp rank, layer) but deliberately NOT the ep rank —
    ep replicates activations, and rank-divergent masks would break the
    psum-combine algebra (see _moe_mlp_ep).
    """
    if cfg.num_experts is None:
        raise ValueError("make_train_step_ep requires cfg.num_experts")
    ep_size = mesh.shape[ep]
    if cfg.num_experts % ep_size:
        raise ValueError(
            f"ep={ep_size} must divide num_experts={cfg.num_experts}"
        )
    if attn_dropout == 0.0:
        attn_dropout = None  # rate 0 is the identity, not an error
    specs = ep_param_specs(cfg, ep)
    k = cfg.experts_per_token
    gold = jnp.int32(-1640531527)

    def _local_grads(params, tokens, seed):
        b_local, s = tokens.shape
        t = b_local * s
        gs = min(group_size, t)
        while t % gs:  # largest divisor <= requested (t is trace-static)
            gs -= 1
        capacity = -(-int(capacity_factor * k * gs) // cfg.num_experts)
        positions = jnp.broadcast_to(jnp.arange(s), (b_local, s))
        seed = seed * gold + jax.lax.axis_index(dp) * jnp.int32(7919)

        def one_layer(x, layer, lseed):
            x = _attn_block(x, layer, positions, cfg, attn_dropout, lseed)
            y, aux = _moe_mlp_ep(
                _rmsnorm(x, layer["mlp_norm"]), layer, cfg, ep, ep_size,
                capacity, gs,
            )
            return x + y, aux

        if remat:
            one_layer = jax.checkpoint(one_layer)

        def loss_fn(params):
            x = params["embed"][tokens]
            aux_total = 0.0
            for li, layer in enumerate(params["layers"]):
                x, aux = one_layer(
                    x, layer, seed * gold + jnp.int32(li + 1)
                )
                aux_total = aux_total + aux
            x = _rmsnorm(x, params["final_norm"])
            logits = x @ params["lm_head"]
            targets = tokens[:, 1:]
            nll = jnp.mean(token_nll(logits[:, :-1], targets))
            return nll + aux_coef * aux_total / len(params["layers"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        loss = jax.lax.pmean(loss, dp)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, dp), grads)
        return loss, grads

    if attn_dropout is None:
        local_grads = lambda params, tokens: _local_grads(
            params, tokens, jnp.int32(0)
        )
        in_specs = (specs, P(dp, None))
    else:
        local_grads = _local_grads
        in_specs = (specs, P(dp, None), P())

    grad_map = jax.shard_map(
        local_grads,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), specs),
        check_vma=False,
    )

    return _make_step(grad_map, lr, optimizer)


