"""LoRA fine-tuning: exact just-in-time merge adapters, TP-composable.

Split out of the former models/train.py monolith (round 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from flashattention_tpu.models.transformer import ModelConfig
from flashattention_tpu.models.train.common import param_specs, token_nll
from flashattention_tpu.models.train.forward import _forward_local


def init_lora(key, params, rank: int = 8, targets=("wq", "wv")):
    """Per-layer LoRA adapters for ``targets``: A ~ N(0, 1/d_in) (d_in, r),
    B = 0 (r, d_out) — B=0 makes the adapted model equal the base at init,
    the standard LoRA recipe.  Shapes come from the base params, so any
    2-D projection (wq/wk/wv/wo/w_gate/w_up/w_down) can be a target."""
    layers = []
    for layer in params["layers"]:
        keys = jax.random.split(key, len(targets) + 1)
        key = keys[0]
        adapters = {}
        for t, k_ in zip(targets, keys[1:]):
            w = layer[t]
            if w.ndim != 2:
                raise ValueError(f"LoRA target {t!r} must be 2-D, got {w.shape}")
            d_in, d_out = w.shape
            adapters[t] = {
                "a": (
                    jax.random.normal(k_, (d_in, rank), jnp.float32)
                    * d_in**-0.5
                ).astype(w.dtype),
                "b": jnp.zeros((rank, d_out), w.dtype),
            }
        layers.append(adapters)
    return layers


def lora_param_specs(cfg: ModelConfig, lora, tp: str = "tp"):
    """PartitionSpecs for a LoRA tree: A follows the target's ROW sharding,
    B its COLUMN sharding (so A @ B shards exactly like the base weight)."""
    base_layer = param_specs(cfg, tp)["layers"][0]
    out = []
    for adapters in lora:
        specs = {}
        for t, ab in adapters.items():
            bs = base_layer[t]
            a0 = bs[0] if len(bs) > 0 else None
            a1 = bs[1] if len(bs) > 1 else None
            specs[t] = {"a": P(a0, None), "b": P(None, a1)}
        out.append(specs)
    return out


def merge_lora(params, lora, alpha: float = 16.0):
    """Materialize base + (alpha/r) * A @ B — for EXPORT to the serving
    paths (the training step never materializes the merge per step
    globally; it merges per layer inside the forward)."""
    layers = []
    for layer, adapters in zip(params["layers"], lora):
        new = dict(layer)
        for t, ab in adapters.items():
            r = ab["a"].shape[-1]
            new[t] = (
                layer[t]
                + (ab["a"] @ ab["b"]).astype(layer[t].dtype) * (alpha / r)
            )
        layers.append(new)
    return {**params, "layers": layers}


def make_train_step_lora(
    mesh: Mesh,
    cfg: ModelConfig,
    *,
    dp: str = "dp",
    tp: str = "tp",
    alpha: float = 16.0,
    lr: float = 1e-3,
    optimizer=None,
    attn_dropout: float | None = None,
    remat: bool = False,
):
    """Parameter-efficient fine-tuning: only the LoRA adapters train.

    ``step(base_params, lora, tokens[, seed]) -> (loss, new_lora)`` — the
    base stays frozen (gradients flow only into the adapter tree; nothing
    mutates the base).  Each layer's target weights merge just-in-time
    inside the (possibly checkpointed) layer via the ``layer_transform``
    hook: ``w + (alpha/r) A @ B`` — mathematically the exact LoRA forward —
    so the merged weight exists one layer at a time, never as a second full
    parameter tree.  TP composes: A follows the target's row sharding, B
    its column sharding, and the merge shards like the base weight.
    """
    if attn_dropout == 0.0:
        attn_dropout = None
    tp_size = mesh.shape[tp]
    if cfg.num_kv_heads % tp_size:
        raise ValueError(
            f"tp={tp_size} must divide num_kv_heads={cfg.num_kv_heads}"
        )
    specs = param_specs(cfg, tp)
    gold = jnp.int32(-1640531527)

    def lora_merge(layer):
        adapters = layer["lora"]
        out = {k: v for k, v in layer.items() if k != "lora"}
        for t, ab in adapters.items():
            r = ab["a"].shape[-1]
            out[t] = out[t] + (ab["a"] @ ab["b"]).astype(
                out[t].dtype
            ) * (alpha / r)
        return out

    def local_grads(base, lora, tokens, seed):
        if attn_dropout is not None:
            seed = (
                seed * gold
                + jax.lax.axis_index(dp) * jnp.int32(7919)
                + jax.lax.axis_index(tp) * jnp.int32(104729)
            )

        def loss_fn(lora):
            layers = [
                {**l, "lora": la} for l, la in zip(base["layers"], lora)
            ]
            params = {**base, "layers": layers}
            logits = _forward_local(
                params, tokens, cfg, tp_size, tp, attn_dropout, seed,
                remat=remat, layer_transform=lora_merge,
            )
            targets = tokens[:, 1:]
            return jnp.mean(token_nll(logits[:, :-1], targets))

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        loss = jax.lax.pmean(loss, dp)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, dp), grads)
        return loss, grads

    def build(lora_specs):
        def local_grads_tp(base, lora, tokens, seed):
            loss, grads = local_grads(base, lora, tokens, seed)
            # REPLICATED adapter leaves feed a tp-sharded product (A for
            # column-parallel targets, B for row-parallel ones): their
            # per-shard cotangents are partial sums over the tp slice and
            # need the explicit all-reduce — the f/g-pair insight applied
            # to the adapter tree.  Sharded leaves are already exact.
            grads = jax.tree.map(
                lambda g, sp: g if tp in sp else jax.lax.psum(g, tp),
                grads, lora_specs, is_leaf=lambda x: isinstance(x, P),
            )
            return loss, grads

        return jax.shard_map(
            local_grads_tp,
            mesh=mesh,
            in_specs=(specs, lora_specs, P(dp, None), P()),
            out_specs=(P(), lora_specs),
            check_vma=False,
        )

    grad_maps = {}

    def grad_call(base, lora, tokens, seed):
        # lora structure (targets, rank) is static per jit trace; build the
        # matching shard_map lazily and cache by treedef.
        kd = jax.tree_util.tree_structure(lora)
        if kd not in grad_maps:
            lora_specs = lora_param_specs(cfg, lora, tp)
            grad_maps[kd] = build(lora_specs)
        return grad_maps[kd](base, lora, tokens, seed)

    if optimizer is None:

        @jax.jit
        def step(base, lora, tokens, seed=0):
            loss, grads = grad_call(
                base, lora, tokens, jnp.asarray(seed, jnp.int32)
            )
            new_lora = jax.tree.map(
                lambda p, g: p - lr * g.astype(p.dtype), lora, grads
            )
            return loss, new_lora

        return step

    @jax.jit
    def opt_step(base, lora, opt_state, tokens, seed=0):
        loss, grads = grad_call(
            base, lora, tokens, jnp.asarray(seed, jnp.int32)
        )
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        new_lora = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), lora, updates
        )
        return loss, new_lora, opt_state

    return opt_step
