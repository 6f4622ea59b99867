"""FSDP / ZeRO-3 parameter sharding (+ FSDP x TP) training steps.

Split out of the former models/train.py monolith (round 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from flashattention_tpu.models.transformer import ModelConfig, _rmsnorm
from flashattention_tpu.models.train.common import param_specs, token_nll
from flashattention_tpu.models.train.forward import _forward_local, _layer_forward


def fsdp_param_specs(params, mesh: Mesh, fsdp: str = "dp") -> dict:
    """ZeRO-3-style at-rest sharding specs: every leaf shards its first
    ``fsdp``-divisible dim; indivisible leaves (tiny norms) replicate.

    The reference has no multi-device story at all (SURVEY.md 2.15/2.16);
    this is the framework's weight-sharded data parallelism — param memory
    per chip is O(total/N) at rest, full weights exist only transiently
    inside the step (gathered per step, the ZeRO-3 deployment).
    """
    size = mesh.shape[fsdp]

    def spec_for(x):
        for i, dim in enumerate(x.shape):
            if dim % size == 0 and dim >= size:
                return P(*([None] * i + [fsdp]))
        return P()

    return jax.tree.map(spec_for, params)


def _add_fsdp_axis(spec, shape, size, fsdp):
    """Extend a (possibly tp-sharded) spec with the fsdp axis on the first
    free dim that divides the axis size; leave it alone if none does."""
    entries = list(spec) + [None] * (len(shape) - len(spec))
    for i, (dim, e) in enumerate(zip(shape, entries)):
        if e is None and dim % size == 0 and dim >= size:
            entries[i] = fsdp
            return P(*entries)
    return spec


def fsdp_tp_param_specs(
    cfg: ModelConfig, params, mesh: Mesh, fsdp: str = "dp", tp: str = "tp"
) -> dict:
    """FSDP x TP 2D specs: Megatron column/row sharding over ``tp`` PLUS
    at-rest fsdp sharding on each leaf's first free divisible dim — the
    canonical ZeRO + tensor-parallel production layout."""
    size = mesh.shape[fsdp]
    base = param_specs(cfg, tp)
    return jax.tree.map(
        lambda x, s: _add_fsdp_axis(s, x.shape, size, fsdp),
        params, base, is_leaf=lambda t: isinstance(t, P),
    )


def shard_params_fsdp(
    params, mesh: Mesh, fsdp: str = "dp", *, tp: str | None = None,
    cfg: ModelConfig | None = None,
):
    """device_put params in the at-rest FSDP (or FSDP x TP) layout; returns
    (sharded_params, specs).  ``tp`` requires ``cfg``."""
    if tp is None:
        specs = fsdp_param_specs(params, mesh, fsdp)
    else:
        if cfg is None:
            raise ValueError("shard_params_fsdp(tp=...) requires cfg")
        specs = fsdp_tp_param_specs(cfg, params, mesh, fsdp, tp)
    return (
        jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params, specs, is_leaf=lambda x: isinstance(x, jax.Array),
        ),
        specs,
    )


def make_train_step_fsdp(
    mesh: Mesh,
    cfg: ModelConfig,
    *,
    fsdp: str = "dp",
    tp: str | None = None,
    lr: float = 1e-3,
    optimizer=None,
    attn_dropout: float | None = None,
    remat: bool = False,
):
    """Fully-sharded data-parallel (ZeRO-3-class) training step (round 3).

    Params live SHARDED over the ``fsdp`` axis (:func:`shard_params_fsdp`);
    each step all-gathers every leaf to full just-in-time inside the
    shard_map, runs the dense forward on the local batch shard, and the
    gradients come back already reduce-scattered — the transpose of a tiled
    ``all_gather`` is ``psum_scatter``, so autodiff through the gather IS
    the ZeRO gradient bucketing, with no hand-written reduce.  The local
    loss is pre-divided by the axis size so that psum-scatter yields the
    exact global-mean gradient.  Optimizer state (optax) mirrors the
    sharded params, so it is O(total/N) per chip too — the ZeRO point.

    ``step(params, tokens[, seed]) -> (loss, new_params)`` (optax variant
    threads opt_state).  ``attn_dropout`` folds (fsdp rank, layer).

    ``remat=True`` checkpoints each layer WITH its gather inside: the
    backward re-gathers one layer's weights at a time instead of holding
    every gathered layer alive through the backward — peak weight memory
    O(shard + one layer) rather than O(total), the full ZeRO-3 behavior.

    ``tp`` (round 3): FSDP x TP 2D — heads/MLP Megatron-shard over ``tp``
    (exact f/g gradients) while every leaf ALSO shards over ``fsdp`` at
    rest (:func:`fsdp_tp_param_specs`); the per-layer gather rebuilds only
    the tp-local shard.  The canonical ZeRO + tensor-parallel layout.
    """
    if attn_dropout == 0.0:
        attn_dropout = None  # rate 0 is the identity, not an error
    size = mesh.shape[fsdp]
    gold = jnp.int32(-1640531527)

    from flashattention_tpu.models.transformer import init_params

    example = jax.eval_shape(lambda: init_params(jax.random.key(0), cfg))
    if tp is None:
        specs = fsdp_param_specs(example, mesh, fsdp)
    else:
        if cfg.num_kv_heads % mesh.shape[tp]:
            raise ValueError(
                f"tp={mesh.shape[tp]} must divide num_kv_heads="
                f"{cfg.num_kv_heads}"
            )
        specs = fsdp_tp_param_specs(cfg, example, mesh, fsdp, tp)
    layer_specs = specs["layers"][0]

    def gather_full(shard, spec):
        axes = [i for i, a in enumerate(spec) if a == fsdp]
        if not axes:
            return shard
        return jax.lax.all_gather(shard, fsdp, axis=axes[0], tiled=True)

    def gather_tree(shard_tree, spec_tree):
        return jax.tree.map(
            gather_full, shard_tree, spec_tree,
            is_leaf=lambda x: isinstance(x, P),
        )

    def forward(shards, tokens, seed):
        if tp is not None:
            # FSDP x TP: embed/final/lm_head gather over fsdp up front (one
            # use each); layers re-gather per layer INSIDE _forward_local's
            # (possibly checkpointed) layer via layer_transform — tp shards
            # stay local, the f/g pairs handle the tp collectives.
            params = {
                "embed": gather_tree(shards["embed"], specs["embed"]),
                "final_norm": gather_tree(
                    shards["final_norm"], specs["final_norm"]
                ),
                "lm_head": gather_tree(shards["lm_head"], specs["lm_head"]),
                "layers": shards["layers"],
            }
            return _forward_local(
                params, tokens, cfg, mesh.shape[tp], tp, attn_dropout, seed,
                remat=remat,
                layer_transform=lambda l: gather_tree(l, layer_specs),
            )
        b, s = tokens.shape
        positions = jnp.broadcast_to(jnp.arange(s), (b, s))

        def one_layer(x, layer_shards, lseed):
            # Gather INSIDE the (possibly checkpointed) layer: under remat
            # the residual is the shard, and the backward re-gathers.  The
            # body is the shared full-head layer (PP/EP stage body).
            layer = gather_tree(layer_shards, layer_specs)
            return _layer_forward(x, layer, positions, cfg, attn_dropout, lseed)

        if remat:
            one_layer = jax.checkpoint(one_layer)
        x = gather_tree(shards["embed"], specs["embed"])[tokens]
        for li, layer_shards in enumerate(shards["layers"]):
            lseed = (
                seed * gold + jnp.int32(li + 1)
                if attn_dropout is not None else 0
            )
            x = one_layer(x, layer_shards, lseed)
        x = _rmsnorm(x, gather_tree(shards["final_norm"], specs["final_norm"]))
        return x @ gather_tree(shards["lm_head"], specs["lm_head"])

    def local_grads(shards, tokens, seed):
        if attn_dropout is not None:
            seed = seed * gold + jax.lax.axis_index(fsdp) * jnp.int32(7919)
            if tp is not None:
                seed = seed + jax.lax.axis_index(tp) * jnp.int32(104729)

        def loss_fn(shards):
            logits = forward(shards, tokens, seed)
            targets = tokens[:, 1:]
            nll = jnp.mean(token_nll(logits[:, :-1], targets))
            # Pre-divide by the axis size: the gather's transpose psum-
            # scatters shard grads (a SUM over fsdp), so this yields the
            # exact global-mean gradient with no post-hoc rescale.
            return nll / size

        loss, grads = jax.value_and_grad(loss_fn)(shards)
        # Sharded leaves come back exact (the gather's transpose psum-
        # scatters across fsdp); REPLICATED leaves (no divisible dim, e.g.
        # odd-sized norms) have no gather in their path, so their per-device
        # partial grads need the explicit psum.
        grads = jax.tree.map(
            lambda g_, sp_: g_ if fsdp in sp_ else jax.lax.psum(g_, fsdp),
            grads, specs, is_leaf=lambda x: isinstance(x, P),
        )
        return jax.lax.psum(loss, fsdp), grads

    grad_map = jax.shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(specs, P(fsdp, None), P()),
        out_specs=(P(), specs),
        check_vma=False,
    )

    if optimizer is None:

        @jax.jit
        def step(params, tokens, seed=0):
            loss, grads = grad_map(params, tokens, jnp.int32(seed))
            new_params = jax.tree.map(
                lambda p, g_: p - lr * g_.astype(p.dtype), params, grads
            )
            return loss, new_params

        return step

    @jax.jit
    def opt_step(params, opt_state, tokens, seed=0):
        loss, grads = grad_map(params, tokens, jnp.int32(seed))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        new_params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), params, updates
        )
        return loss, new_params, opt_state

    return opt_step


# ── LoRA fine-tuning (round 3) ───────────────────────────────────────────────


