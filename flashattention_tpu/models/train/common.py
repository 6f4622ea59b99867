"""Shared training-step plumbing: Megatron f/g collective pair,
vocab-parallel NLL, param specs/sharding, packed-position utils, and the
shared step/seq-sharded-step tails every make_train_step_* family uses.

Split out of the former models/train.py monolith (round 4); see
flashattention_tpu/models/train/__init__.py for the package map.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from flashattention_tpu.models.transformer import ModelConfig


# psum, which scales cotangents by the axis size and leaves replicated
# parameters (norms, embeddings) with per-device partial gradients (their tp
# replicas silently diverge).  The textbook fix is the f/g pair: ``g`` is
# all-reduce forward / identity backward (after row-parallel matmuls), ``f``
# is identity forward / all-reduce backward (before column-parallel matmuls).
# With both in place every gradient is exact with no post-hoc rescaling.


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _g_allreduce(x, axis):
    """Forward all-reduce, backward identity (output treated as replicated)."""
    return jax.lax.psum(x, axis)


_g_allreduce.defvjp(
    lambda x, axis: (jax.lax.psum(x, axis), None),
    lambda axis, _, dy: (dy,),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _f_identity(x, axis):
    """Forward identity, backward all-reduce (input is replicated; its
    cotangent arrives as per-device shard contributions)."""
    return x


_f_identity.defvjp(
    lambda x, axis: (x, None),
    lambda axis, _, dy: (jax.lax.psum(dy, axis),),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _vocab_parallel_nll(logits, targets, tp_axis):
    """Per-token NLL from VOCAB-column-sharded logits (round 3).

    Megatron embedding-parallel cross-entropy: each tp shard holds logits
    for its vocab slice (B, S, V/tp); the loss needs one pmax + two psums
    of (B, S) scalars — the (B, S, V) softmax never materializes anywhere,
    and no shard ever holds full-vocab logits.  The backward is hand-written
    because it is purely LOCAL (d_logits = softmax_local − onehot_local):
    autodiff through the psums would hit the psum-transpose trap this
    module documents at the f/g pair.
    """
    nll, _ = _vp_nll_fwd(logits, targets, tp_axis)
    return nll


def _vp_nll_fwd(logits, targets, tp_axis):
    lf = logits.astype(jnp.float32)
    v_local = lf.shape[-1]
    start = jax.lax.axis_index(tp_axis) * v_local
    m = jax.lax.pmax(jnp.max(lf, axis=-1), tp_axis)
    z = jax.lax.psum(jnp.sum(jnp.exp(lf - m[..., None]), axis=-1), tp_axis)
    lse = m + jnp.log(z)
    idx = targets - start
    ok = (idx >= 0) & (idx < v_local)
    tgt = jax.lax.psum(
        jnp.where(
            ok,
            jnp.take_along_axis(
                lf, jnp.clip(idx, 0, v_local - 1)[..., None], axis=-1
            )[..., 0],
            0.0,
        ),
        tp_axis,
    )
    nll = lse - tgt
    return nll, (logits, lse, idx, ok)


def _vp_nll_bwd(tp_axis, res, dnll):
    logits, lse, idx, ok = res
    lf = logits.astype(jnp.float32)
    probs = jnp.exp(lf - lse[..., None])
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, lf.shape, lf.ndim - 1)
        == idx[..., None]
    ) & ok[..., None]
    d = (probs - onehot.astype(jnp.float32)) * dnll[..., None]
    import numpy as _np

    # Int targets carry no tangent: float0 cotangent of the same shape.
    return d.astype(logits.dtype), _np.zeros(idx.shape, jax.dtypes.float0)


_vocab_parallel_nll.defvjp(_vp_nll_fwd, _vp_nll_bwd)


def param_specs(
    cfg: ModelConfig, tp: str = "tp", vocab_parallel: bool = False
) -> dict:
    """PartitionSpecs: Megatron column/row sharding over the tp axis.

    MoE layers (cfg.num_experts): the E-stacked expert weights shard their
    INTERMEDIATE dim over tp exactly like the dense MLP (the f/g psum at
    the call sites finishes the per-expert partial sums); the router is
    replicated.  Expert parallelism proper (E over an "ep" axis) is
    :func:`make_train_step_ep`.

    ``vocab_parallel`` (round 3): shard the embedding table and lm_head over
    the VOCAB dim too (Megatron embedding parallelism) — at Gemma-class
    vocabularies (256k) these are the largest weights in the model.  The
    lookup masks+psums, and the loss runs the distributed cross-entropy
    (:func:`_vocab_parallel_nll`) on column-sharded logits."""
    layer = {
        "attn_norm": P(),
        "wq": P(None, tp),
        "wk": P(None, tp),
        "wv": P(None, tp),
        "wo": P(tp, None),
        "mlp_norm": P(),
    }
    if cfg.num_experts is None:
        layer.update({
            "w_gate": P(None, tp),
            "w_up": P(None, tp),
            "w_down": P(tp, None),
        })
    else:
        layer.update({
            "router": P(),
            "w_gate": P(None, None, tp),
            "w_up": P(None, None, tp),
            "w_down": P(None, tp, None),
        })
    return {
        "embed": P(tp, None) if vocab_parallel else P(),
        "final_norm": P(),
        "lm_head": P(None, tp) if vocab_parallel else P(),
        "layers": [dict(layer) for _ in range(cfg.num_layers)],
    }


def shard_params(
    params, mesh: Mesh, cfg: ModelConfig, tp: str = "tp",
    vocab_parallel: bool = False,
):
    specs = param_specs(cfg, tp, vocab_parallel)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, jax.Array),
    )


def packed_positions(segment_ids):
    """Per-document RoPE positions for packed rows: index within segment.

    segment_ids: (B, S) int32, padding marked with a negative id.  Returns
    (B, S) int32 positions restarting at 0 on every segment change — packed
    documents then see exactly the rotary phases they would see alone.
    """
    b, s = segment_ids.shape
    idx = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    change = jnp.concatenate(
        [
            jnp.ones((b, 1), bool),
            segment_ids[:, 1:] != segment_ids[:, :-1],
        ],
        axis=1,
    )
    start = jax.lax.cummax(jnp.where(change, idx, 0), axis=1)
    return idx - start


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )



def token_nll(logits, targets):
    """Per-token NLL in float32: ``-log p(targets)`` under ``logits``.

    The one copy of the log_softmax + take_along_axis pattern every
    training-step family previously re-implemented (round 4 dedup).
    Callers slice/shift (``logits[:, :-1]`` vs pre-shifted targets) and
    reduce (mean vs valid-masked sum) per their sharding policy.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]

def _make_step(grad_call, lr, optimizer):
    """Jitted parameter-update step around ``grad_call(params, *args) ->
    (loss, grads)``: plain SGD (``optimizer=None``) or any optax optimizer
    (the step then threads ``opt_state`` as its second argument, mirroring
    make_train_step_optax)."""
    if optimizer is None:

        @jax.jit
        def step(params, *args, **kw):
            loss, grads = grad_call(params, *args, **kw)
            new_params = jax.tree.map(
                lambda p, g: p - lr * g.astype(p.dtype), params, grads
            )
            return loss, new_params

        return step

    @jax.jit
    def step(params, opt_state, *args, **kw):
        loss, grads = grad_call(params, *args, **kw)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        new_params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), params, updates
        )
        return loss, new_params, opt_state

    return step


def _make_seq_sharded_step(
    mesh, forward_local, specs, *, dp, sp, lr, optimizer, prep, n_inputs=1,
):
    """Shared DP x SP step tail for the SP, 3D, and packed-SP steps (one
    copy keeps the loss masking, (dp, sp) reductions, prep, and seed
    plumbing in sync — the same policy _make_grad_map enforces for the
    DP x TP family).

    ``forward_local(params, *inputs, seed) -> logits`` runs per shard inside
    shard_map on ``n_inputs`` P(dp, sp)-sharded arrays; ``prep(*step_args)
    -> (inputs_tuple, targets, valid)`` builds them (plus the masked-loss
    targets) on the GLOBAL view before sharding; ``specs`` are the param
    PartitionSpecs (replicated for SP, Megatron tp-sharded for 3D)."""

    def local_grads(params, *rest):
        *inputs, targets, valid, seed = rest

        def loss_fn(params):
            logits = forward_local(params, *inputs, seed)
            nll = token_nll(logits, targets)
            # Shard-local valid terms over the GLOBAL count: grads are then
            # partial sums, made total by the psum below.  The max guard
            # covers all-padding packed shards.
            return jnp.sum(nll * valid) / jnp.maximum(
                jax.lax.psum(jnp.sum(valid), (dp, sp)), 1.0
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        loss = jax.lax.psum(loss, (dp, sp))
        grads = jax.tree.map(lambda g_: jax.lax.psum(g_, (dp, sp)), grads)
        return loss, grads

    tspec = P(dp, sp)
    in_specs = (specs,) + (tspec,) * (n_inputs + 2) + (P(),)
    grad_map = jax.shard_map(
        local_grads, mesh=mesh, in_specs=in_specs, out_specs=(P(), specs),
        check_vma=False,
    )
    import inspect

    n_step_args = len(inspect.signature(prep).parameters)

    def _split(args):
        # Historical signatures take the seed POSITIONALLY after the data
        # args (step(params, tokens, seed)); a missing trailing seed is 0.
        if len(args) == n_step_args + 1:
            return args[:-1], args[-1]
        if len(args) == n_step_args:
            return args, 0
        raise TypeError(
            f"step expects {n_step_args} data args (+ optional seed), "
            f"got {len(args)}"
        )

    if optimizer is None:

        def step(params, *args):
            step_args, seed = _split(args)
            inputs, targets, valid = prep(*step_args)
            loss, grads = grad_map(
                params, *inputs, targets, valid, jnp.int32(seed)
            )
            new_params = jax.tree.map(
                lambda p, g_: p - lr * g_.astype(p.dtype), params, grads
            )
            return loss, new_params

        return jax.jit(step)

    def opt_step(params, opt_state, *args):
        step_args, seed = _split(args)
        inputs, targets, valid = prep(*step_args)
        loss, grads = grad_map(
            params, *inputs, targets, valid, jnp.int32(seed)
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        new_params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), params, updates
        )
        return loss, new_params, opt_state

    return jax.jit(opt_step)


def _next_token_prep(zigzag, sp_size):
    """Global next-token targets/validity, optionally zigzag-sharded (all
    three get the same permutation, so each local row's target stays its
    own next token and the loss is layout-invariant)."""
    from flashattention_tpu.parallel.ring import zigzag_shard

    def prep(tokens):
        targets = jnp.concatenate(
            [tokens[:, 1:], jnp.zeros_like(tokens[:, :1])], axis=1
        )
        valid = jnp.concatenate(
            [
                jnp.ones(tokens[:, 1:].shape, jnp.float32),
                jnp.zeros_like(tokens[:, :1], dtype=jnp.float32),
            ],
            axis=1,
        )
        if zigzag:
            tokens, targets, valid = (
                zigzag_shard(t, sp_size, axis=1)
                for t in (tokens, targets, valid)
            )
        return (tokens,), targets, valid

    return prep


