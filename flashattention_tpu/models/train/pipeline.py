"""Pipeline parallelism: GPipe microbatched training step (PP axis).

Split out of the former models/train.py monolith (round 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from flashattention_tpu.models.transformer import ModelConfig, _rmsnorm
from flashattention_tpu.models.train.common import _g_allreduce, _make_step, token_nll
from flashattention_tpu.models.train.forward import _layer_forward, stack_params


def pp_param_specs(cfg: ModelConfig, example_params, pp: str = "pp") -> dict:
    """PartitionSpecs for stacked params: layer stacks sharded over pp,
    everything else replicated (embed lives on rank 0's compute path, the
    head on the last rank's; replication keeps the program SPMD)."""
    del cfg
    stacked_shape = jax.eval_shape(stack_params, example_params)
    return {
        k: (
            jax.tree.map(lambda x: P(pp, *([None] * (x.ndim - 1))), v)
            if k == "layers"
            else jax.tree.map(lambda x: P(), v)
        )
        for k, v in stacked_shape.items()
    }


def shard_params_pp(params, mesh: Mesh, cfg: ModelConfig, pp: str = "pp"):
    """Stack + device_put params for the pipeline step."""
    specs = pp_param_specs(cfg, params, pp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        stack_params(params),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def make_train_step_pp(
    mesh: Mesh,
    cfg: ModelConfig,
    *,
    pp: str = "pp",
    dp: str = "dp",
    lr: float = 1e-3,
    n_microbatches: int = 2,
    optimizer=None,
    attn_dropout: float | None = None,
    remat: bool = False,
):
    """GPipe-style pipeline-parallel training step (round 3).

    The layer stack shards over the ``pp`` mesh axis (each rank holds
    L/pp consecutive layers, applied with a ``lax.scan`` over its stage
    slice); microbatches flow through the pipe with one
    ``jax.lax.ppermute`` hop per step — T = M + P - 1 pipeline steps fill
    and drain the bubble.  Rank 0 embeds, the last rank runs the head +
    loss; autodiff through the ppermute chain IS the backward pipeline
    (ppermute's transpose is the reverse rotation), so gradients for every
    stage arrive without any hand-written schedule.  Replicated leaves
    (embed / final_norm / lm_head) get their single nonzero contribution
    psum-broadcast over pp; stage grads stay rank-local by construction.
    DP composes orthogonally (batch sharded, grads pmean-ed).

    ``step(params, tokens) -> (loss, new_params)`` with params from
    :func:`shard_params_pp` (stacked layout).  Requires
    ``num_layers % pp == 0`` and ``B_local % n_microbatches == 0``.

    ``attn_dropout`` (round 3): the step takes a trailing traced-int32
    ``seed``; each kernel call's mask decorrelates over (dp rank, pipeline
    step, global layer index) — the pipeline step subsumes the microbatch
    identity, and the global layer fold keeps the same seed from reusing
    masks across stages.
    """
    pp_size = mesh.shape[pp]
    if cfg.num_layers % pp_size:
        raise ValueError(
            f"pp={pp_size} must divide num_layers={cfg.num_layers}"
        )
    if attn_dropout == 0.0:
        attn_dropout = None  # rate 0 is the identity, not an error
    from flashattention_tpu.models.transformer import init_params

    example = jax.eval_shape(
        lambda: init_params(jax.random.key(0), cfg)
    )
    specs = pp_param_specs(cfg, example, pp)
    M = n_microbatches
    gold = jnp.int32(-1640531527)

    def _local_grads(params, tokens, seed):
        rank = jax.lax.axis_index(pp)
        b_local, s = tokens.shape
        if b_local % M:
            raise ValueError(
                f"local batch {b_local} not divisible by n_microbatches {M}"
            )
        mb_b = b_local // M
        positions = jnp.broadcast_to(jnp.arange(s), (mb_b, s))
        perm = [(p, p + 1) for p in range(pp_size - 1)]
        layer_base = rank * jnp.int32(cfg.num_layers // pp_size)
        seed = seed * gold + jax.lax.axis_index(dp) * jnp.int32(7919)

        def loss_fn(params):
            mbs = tokens.reshape(M, mb_b, s)
            stage = params["layers"]  # (L/pp, ...) local slice

            def stage_layer(x, layer, lseed):
                return _layer_forward(
                    x, layer, positions, cfg, attn_dropout, lseed
                )

            if remat:
                stage_layer = jax.checkpoint(stage_layer)

            def apply_stage(x, t):
                tseed = seed * gold + jnp.int32(t)

                def body(x, xs):
                    layer, li = xs
                    lseed = tseed * gold + layer_base + li + 1
                    return (stage_layer(x, layer, lseed), None)

                n_stage = cfg.num_layers // pp_size
                return jax.lax.scan(
                    body, x, (stage, jnp.arange(n_stage, dtype=jnp.int32))
                )[0]

            x_recv = jnp.zeros(
                (mb_b, s, cfg.d_model), params["embed"].dtype
            )
            total_nll = 0.0
            for t in range(M + pp_size - 1):
                # Ramp steps re-embed the last real microbatch (finite data;
                # their outputs drain past the loop and are never consumed —
                # garbage would 0*NaN-poison the masked-out backward).
                inp0 = params["embed"][mbs[min(t, M - 1)]]
                x_in = jnp.where(rank == 0, inp0, x_recv)
                y = apply_stage(x_in, t)
                x_recv = jax.lax.ppermute(y, pp, perm)
                if t >= pp_size - 1:
                    out_mb = t - (pp_size - 1)
                    z = _rmsnorm(y, params["final_norm"]) @ params["lm_head"]
                    nll = jnp.mean(token_nll(z[:, :-1], mbs[out_mb][:, 1:]))
                    # Only the last rank's head output is the real pipeline
                    # result; where() zeroes the others' cotangents too.
                    total_nll = total_nll + jnp.where(
                        rank == pp_size - 1, nll, 0.0
                    )
            # psum-forward / identity-backward: each rank keeps cotangent 1
            # for its own (ppermute-routed) contribution — a bare psum would
            # scale cotangents by pp (the transpose pitfall above).
            return _g_allreduce(total_nll / M, pp)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # Replicated leaves have exactly one nonzero pp contribution
        # (embed: rank 0; final_norm/lm_head: last rank): broadcast it.
        # Stage grads are rank-local slices — a pp collective would sum
        # unrelated layers.
        grads = {
            k: (
                v
                if k == "layers"
                else jax.tree.map(lambda g: jax.lax.psum(g, pp), v)
            )
            for k, v in grads.items()
        }
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


