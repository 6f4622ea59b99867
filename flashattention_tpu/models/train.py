"""Sharded training step: DP x TP over a mesh, differentiable flash kernels.

The reference has no training story (forward-only kernels, SURVEY.md
section 0); this provides the framework's training path: a causal-LM loss
through the transformer with ``attention_vjp`` (the custom-vjp fused kernel,
ops/backward.py), sharded with ``jax.shard_map``:

- **DP** (axis "dp"): batch sharded; gradients ``pmean``-ed across the axis.
- **TP** (axis "tp"): attention heads and MLP intermediate sharded Megatron-
  style — wq/wk/wv/w_gate/w_up column-sharded, wo/w_down row-sharded, one
  ``psum`` after each row-sharded matmul.  The attention itself runs on local
  heads only (zero communication), exactly the head-parallel layout the
  reference's caller convention folds into batch.
- **SP** (sequence parallelism / ring attention) lives in the serving path
  (parallel/ring.py); PP/EP are N/A at this model scope (attention-only
  reference).

GQA note: TP degree must divide num_kv_heads (each device keeps whole KV
groups co-located with their Q heads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashattention_tpu.models.transformer import (
    ModelConfig,
    _mlp,
    _rmsnorm,
    _rope,
)
from flashattention_tpu.ops.backward import attention_vjp

__all__ = [
    "param_specs",
    "shard_params",
    "make_train_step",
    "make_train_step_optax",
    "make_train_step_packed",
    "make_train_step_sp",
    "make_train_step_3d",
    "make_train_step_pp",
    "make_train_step_ep",
    "make_train_step_fsdp",
    "make_train_step_lora",
    "init_lora",
    "merge_lora",
    "lora_param_specs",
    "fsdp_param_specs",
    "fsdp_tp_param_specs",
    "shard_params_fsdp",
    "packed_positions",
    "stack_params",
    "shard_params_pp",
    "pp_param_specs",
    "shard_params_ep",
    "ep_param_specs",
]


# ── Megatron collective pair ─────────────────────────────────────────────────
# With shard_map(check_vma=False) the transpose of a bare psum is another
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


def _forward_local(
    params, tokens, cfg: ModelConfig, tp_size: int, tp_axis: str,
    attn_dropout: float | None = None, dropout_seed=None,
    segment_ids=None, remat: bool = False, vocab_parallel: bool = False,
    layer_transform=None, compute_dtype=None,
):
    """Per-device forward on the local TP shard of heads/intermediate.

    tokens: local (B_local, S). Weights arrive column/row-sharded; attention
    runs on num_q_heads/tp local heads through the differentiable fused
    kernel; a single psum finishes each row-sharded projection.

    ``attn_dropout``/``dropout_seed`` (round 3): attention dropout through
    the fused kernel's regenerated-mask path.  The seed must already be
    shard-unique (see _make_grad_map); each layer folds its index in so
    layers draw independent masks.

    ``remat`` (round 3): wrap each layer in ``jax.checkpoint`` — activation
    memory drops from O(L) layer activations to O(1) + recompute in the
    backward (the flash kernel already recomputes its own tiles, so the
    whole backward stays memory-flat in depth).  Dropout composes: the
    recomputed forward regenerates identical masks from the same seeds.

    ``layer_transform`` (round 3): applied to each layer's param subtree
    INSIDE the (possibly checkpointed) layer — the FSDP x TP step passes the
    fsdp all-gather here, so under remat the backward re-gathers one layer's
    weights at a time (ZeRO-3 behavior inside a TP forward).

    ``compute_dtype`` (round 3): mixed precision — weights cast to this
    dtype just-in-time for compute (master copies stay in the param dtype;
    the cast's autodiff transpose returns full-precision gradients for the
    masters).  Composes after ``layer_transform``.
    """
    b, s = tokens.shape
    hq_local = cfg.num_q_heads // tp_size
    hkv_local = cfg.num_kv_heads // tp_size
    g = cfg.group_size  # validates num_q_heads % num_kv_heads == 0
    if vocab_parallel:
        # Vocab-row-sharded embedding: each shard looks up the ids it owns
        # (others contribute zero) and one g-style psum rebuilds the row —
        # backward identity, so the table's grad stays an exact local shard.
        emb = params["embed"]
        start = jax.lax.axis_index(tp_axis) * emb.shape[0]
        idx = tokens - start
        ok = (idx >= 0) & (idx < emb.shape[0])
        x = _g_allreduce(
            jnp.where(
                ok[..., None], emb[jnp.clip(idx, 0, emb.shape[0] - 1)], 0.0
            ),
            tp_axis,
        )
    else:
        x = params["embed"][tokens]
    if compute_dtype is not None:
        # Cast the looked-up ROWS (≡ casting the table, elementwise) — the
        # master table keeps full precision and full-precision row grads.
        x = x.astype(compute_dtype)
    if segment_ids is not None:
        # Packed rows: positions restart per document; the attention mask
        # cannot cross document boundaries (segment ids thread into the
        # kernel in the GQA-folded layout — q rows g-major per KV head).
        positions = packed_positions(segment_ids)
        seg_qf = jnp.tile(
            segment_ids[:, None, :], (1, hkv_local, g)
        ).reshape(b * hkv_local, g * s)
        seg_kvf = jnp.broadcast_to(
            segment_ids[:, None, :], (b, hkv_local, s)
        ).reshape(b * hkv_local, s)
    else:
        positions = jnp.broadcast_to(jnp.arange(s), (b, s))
        seg_qf = seg_kvf = None

    def one_layer(x, layer, lseed):
        if layer_transform is not None:
            layer = layer_transform(layer)
        if compute_dtype is not None:
            layer = _cast_floats(layer, compute_dtype)
        h = _f_identity(_rmsnorm(x, layer["attn_norm"]), tp_axis)
        q = (h @ layer["wq"]).reshape(b, s, hq_local, cfg.head_dim)
        k = (h @ layer["wk"]).reshape(b, s, hkv_local, cfg.head_dim)
        v = (h @ layer["wv"]).reshape(b, s, hkv_local, cfg.head_dim)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)
        # Native GQA: fold the G query groups of each local KV head into the
        # row dim (ops.flash q_seq_len folding) — no repeated KV heads.  The
        # local head order is (kvh_local, g) g-major (contiguous column shard
        # of the h = kvh*G + g global order), exactly the fold's layout.
        qf = q.transpose(0, 2, 1, 3).reshape(b * hkv_local, g * s, cfg.head_dim)
        kf = k.transpose(0, 2, 1, 3).reshape(b * hkv_local, s, cfg.head_dim)
        vf = v.transpose(0, 2, 1, 3).reshape(b * hkv_local, s, cfg.head_dim)
        o = attention_vjp(
            qf, kf, vf, True, cfg.head_dim**-0.5, None, None, None,
            s if g > 1 else None, cfg.sliding_window, cfg.logit_softcap,
            attn_dropout, lseed, seg_qf, seg_kvf,
        )
        o = (
            o.reshape(b, hq_local, s, cfg.head_dim)
            .transpose(0, 2, 1, 3)
            .reshape(b, s, hq_local * cfg.head_dim)
        )
        # Row-sharded output projection: local partial sum + all-reduce (g).
        x = x + _g_allreduce(o @ layer["wo"], tp_axis)
        return x + _g_allreduce(
            _mlp(_f_identity(_rmsnorm(x, layer["mlp_norm"]), tp_axis), layer, cfg.experts_per_token),
            tp_axis,
        )

    if remat:
        one_layer = jax.checkpoint(one_layer)
    for li, layer in enumerate(params["layers"]):
        if attn_dropout is not None:
            # Per-layer seed: golden-ratio odd multiplier (int32 wrap) keeps
            # consecutive step seeds' layer streams disjoint.
            lseed = dropout_seed * jnp.int32(-1640531527) + jnp.int32(li + 1)
        else:
            lseed = 0
        x = one_layer(x, layer, lseed)
    fn_w, head_w = params["final_norm"], params["lm_head"]
    if compute_dtype is not None:
        fn_w = fn_w.astype(compute_dtype)
        head_w = head_w.astype(compute_dtype)
    x = _rmsnorm(x, fn_w)
    if vocab_parallel:
        # Column-sharded lm_head: dx = d_logits_local @ lm_head_local.T is a
        # PARTIAL over this shard's vocab slice — the f-wrap psums it, like
        # every other column-parallel matmul input.  Output = the shard's
        # LOCAL logits (B, S, V/tp), fed to _vocab_parallel_nll.
        x = _f_identity(x, tp_axis)
    return x @ head_w


def _attn_block(x, layer, positions, cfg: ModelConfig,
                attn_dropout: float | None = None, dropout_seed=0):
    """Attention sub-layer on FULL heads, no collectives (PP/EP stage body;
    TP's f/g pair lives in _forward_local instead).

    ``dropout_seed`` must already fold every rank/layer coordinate the caller
    wants decorrelated (PP folds global layer + pipeline step + dp; EP folds
    dp + layer only — ep ranks replicate activations, so their masks MUST be
    bit-identical or the psum-combine algebra breaks)."""
    b, s, _ = x.shape
    hq, hkv, g = cfg.num_q_heads, cfg.num_kv_heads, cfg.group_size
    h = _rmsnorm(x, layer["attn_norm"])
    q = (h @ layer["wq"]).reshape(b, s, hq, cfg.head_dim)
    k = (h @ layer["wk"]).reshape(b, s, hkv, cfg.head_dim)
    v = (h @ layer["wv"]).reshape(b, s, hkv, cfg.head_dim)
    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)
    qf = q.transpose(0, 2, 1, 3).reshape(b * hkv, g * s, cfg.head_dim)
    kf = k.transpose(0, 2, 1, 3).reshape(b * hkv, s, cfg.head_dim)
    vf = v.transpose(0, 2, 1, 3).reshape(b * hkv, s, cfg.head_dim)
    o = attention_vjp(
        qf, kf, vf, True, cfg.head_dim**-0.5, None, None, None,
        s if g > 1 else None, cfg.sliding_window, cfg.logit_softcap,
        attn_dropout, dropout_seed,
    )
    o = (
        o.reshape(b, hq, s, cfg.head_dim)
        .transpose(0, 2, 1, 3)
        .reshape(b, s, hq * cfg.head_dim)
    )
    return x + o @ layer["wo"]


def _layer_forward(x, layer, positions, cfg: ModelConfig,
                   attn_dropout: float | None = None, dropout_seed=0):
    """One full transformer layer (attention + dense-compute MLP/MoE)."""
    x = _attn_block(x, layer, positions, cfg, attn_dropout, dropout_seed)
    return x + _mlp(
        _rmsnorm(x, layer["mlp_norm"]), layer, cfg.experts_per_token
    )


def stack_params(params):
    """Stack the per-layer param dicts into leading-L arrays (the layout
    pipeline parallelism shards: dim 0 over the pp axis)."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = stacked
    return out


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
                    logp = jax.nn.log_softmax(
                        z[:, :-1].astype(jnp.float32), axis=-1
                    )
                    tgt = mbs[out_mb][:, 1:]
                    nll = jnp.mean(
                        -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
                    )
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
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
            nll = jnp.mean(-jnp.take_along_axis(logp, targets[..., None], axis=-1))
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


def _make_grad_map(
    mesh, cfg, *, dp, tp, attn_dropout: float | None = None,
    packed: bool = False, remat: bool = False, vocab_parallel: bool = False,
    compute_dtype=None,
):
    """shard_mapped forward/backward: the ONE DP x TP grad map shared by the
    SGD, optax, and packed training steps (one copy keeps loss masking /
    grad reductions / seed folding in sync — round-2 review, re-affirmed by
    the round-3 review when the packed step briefly forked it).

    Signature: ``(params, tokens, seed) -> (loss, grads)``, or with
    ``packed=True`` ``(params, tokens, segment_ids, seed)`` — the loss is
    then a masked mean over valid next-token targets (same document, not
    padding) weighted by the GLOBAL valid count, with grads psum-ed (not
    pmean-ed: the global count already normalizes).

    ``seed`` (traced int32, replicated) drives attention dropout when
    ``attn_dropout`` is set; each shard folds its (dp, tp) ranks in so DP
    replicas and TP head shards draw independent masks (the kernel's
    coordinates are shard-local, so a shared seed would repeat masks across
    shards).  Unused (pass 0) when dropout is off.
    """
    if attn_dropout == 0.0:
        attn_dropout = None  # rate 0 is the identity, not an error
    tp_size = mesh.shape[tp]
    if cfg.num_kv_heads % tp_size:
        raise ValueError(
            f"tp={tp_size} must divide num_kv_heads={cfg.num_kv_heads}"
        )
    if vocab_parallel and cfg.vocab_size % tp_size:
        raise ValueError(
            f"vocab_parallel: tp={tp_size} must divide vocab_size="
            f"{cfg.vocab_size}"
        )
    specs = param_specs(cfg, tp, vocab_parallel)

    def nll_of(logits, targets):
        # (B, S') per-token NLL; logits may be full-vocab (replicated) or
        # vocab-column-sharded (vocab_parallel distributed cross-entropy).
        if vocab_parallel:
            return _vocab_parallel_nll(logits, targets, tp)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]

    def fold_seed(seed):
        if attn_dropout is None:
            return seed
        # Multiplicative golden-ratio mix BEFORE the rank terms: an additive
        # fold would alias linear (step, rank) pairs (step s, rank r+1 ==
        # step s+7919, rank r when seeds are step numbers).
        return (
            seed * jnp.int32(-1640531527)
            + jax.lax.axis_index(dp) * jnp.int32(7919)
            + jax.lax.axis_index(tp) * jnp.int32(104729)
        )

    def grads_of(loss_fn, params, *, psum_not_pmean):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        red = jax.lax.psum if psum_not_pmean else jax.lax.pmean
        return red(loss, dp), jax.tree.map(lambda g: red(g, dp), grads)

    if packed:

        def local_grads(params, tokens, segment_ids, seed):
            seed = fold_seed(seed)

            def loss_fn(params):
                logits = _forward_local(
                    params, tokens, cfg, tp_size, tp, attn_dropout, seed,
                    segment_ids=segment_ids, remat=remat,
                    vocab_parallel=vocab_parallel, compute_dtype=compute_dtype,
                )
                targets = tokens[:, 1:]
                # Valid next-token target: same document, not padding.
                valid = (
                    (segment_ids[:, 1:] == segment_ids[:, :-1])
                    & (segment_ids[:, 1:] >= 0)
                )
                nll = nll_of(logits[:, :-1], targets)
                local_sum = jnp.sum(jnp.where(valid, nll, 0.0))
                # Weight by the GLOBAL valid-token count (count carries no
                # grad, so a bare psum is safe — the psum-transpose pitfall
                # this module documents only bites differentiable paths).
                count = jax.lax.psum(jnp.sum(valid), dp)
                return local_sum / jnp.maximum(count, 1)

            # Global masked mean = SUM of per-shard local_sum/count grads.
            return grads_of(loss_fn, params, psum_not_pmean=True)

        in_specs = (specs, P(dp, None), P(dp, None), P())
    else:

        def local_grads(params, tokens, seed):
            seed = fold_seed(seed)

            def loss_fn(params):
                logits = _forward_local(
                    params, tokens, cfg, tp_size, tp, attn_dropout, seed,
                    remat=remat, vocab_parallel=vocab_parallel, compute_dtype=compute_dtype,
                )
                targets = tokens[:, 1:]
                return jnp.mean(nll_of(logits[:, :-1], targets))

            return grads_of(loss_fn, params, psum_not_pmean=False)

        in_specs = (specs, P(dp, None), P())

    return jax.shard_map(
        local_grads,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), specs),
        check_vma=False,
    )


def make_train_step(
    mesh: Mesh,
    cfg: ModelConfig,
    *,
    dp: str = "dp",
    tp: str = "tp",
    lr: float = 1e-3,
    attn_dropout: float | None = None,
    remat: bool = False,
    vocab_parallel: bool = False,
    compute_dtype=None,
):
    """Jitted (params, tokens) -> (loss, new_params) SGD step over the mesh.

    tokens: (B, S) int32 sharded over dp; params sharded per param_specs.
    Next-token causal-LM cross-entropy; grads pmean-ed over dp.

    With ``attn_dropout`` the step takes an extra ``seed`` argument
    (per-step int32; pass the step counter) driving the fused kernel's
    attention dropout: ``step(params, tokens, seed)``.

    ``remat=True`` checkpoints each layer (jax.checkpoint): activation
    memory O(1) in depth at ~1/3 extra FLOPs — bitwise-identical loss and
    gradients (pinned by tests/test_train.py).
    """
    grad_map = _make_grad_map(
        mesh, cfg, dp=dp, tp=tp, attn_dropout=attn_dropout, remat=remat,
        vocab_parallel=vocab_parallel, compute_dtype=compute_dtype,
    )

    @jax.jit
    def step(params, tokens, seed=0):
        loss, grads = grad_map(params, tokens, jnp.asarray(seed, jnp.int32))
        new_params = jax.tree.map(
            lambda p, g: p - lr * g.astype(p.dtype), params, grads
        )
        return loss, new_params

    return step


def make_train_step_optax(
    mesh: Mesh,
    cfg: ModelConfig,
    optimizer,
    *,
    dp: str = "dp",
    tp: str = "tp",
    attn_dropout: float | None = None,
    remat: bool = False,
    vocab_parallel: bool = False,
    compute_dtype=None,
):
    """DP x TP training step with an arbitrary optax optimizer (round 2).

    Same sharded forward/backward as :func:`make_train_step` (Megatron f/g
    TP, pmean-ed DP grads), but the parameter update runs OUTSIDE shard_map
    through ``optimizer.update`` — the optimizer state tree (e.g. AdamW's
    mu/nu moments) mirrors the parameter tree, so GSPMD shards it exactly
    like the parameters with no per-state spec plumbing.

    Usage::

        opt = optax.adamw(3e-4, weight_decay=0.01)
        step = make_train_step_optax(mesh, cfg, opt)
        opt_state = jax.jit(opt.init)(params)   # params already sharded
        loss, params, opt_state = step(params, opt_state, tokens)
    """
    grad_map = _make_grad_map(
        mesh, cfg, dp=dp, tp=tp, attn_dropout=attn_dropout, remat=remat,
        vocab_parallel=vocab_parallel, compute_dtype=compute_dtype,
    )

    @jax.jit
    def step(params, opt_state, tokens, seed=0):
        loss, grads = grad_map(params, tokens, jnp.asarray(seed, jnp.int32))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        new_params = jax.tree.map(
            lambda p, u: (p + u.astype(p.dtype)), params, updates
        )
        return loss, new_params, opt_state

    return step


def make_train_step_packed(
    mesh: Mesh,
    cfg: ModelConfig,
    *,
    dp: str = "dp",
    tp: str = "tp",
    lr: float = 1e-3,
    attn_dropout: float | None = None,
    optimizer=None,
    remat: bool = False,
    vocab_parallel: bool = False,
    compute_dtype=None,
):
    """DP x TP training step over PACKED rows (round 3).

    ``step(params, tokens, segment_ids[, seed]) -> (loss, new_params)``:
    each row packs multiple documents marked by ``segment_ids`` (negative =
    padding).  Attention cannot cross document boundaries (kernel-level
    segment masking, ops/flash.py), RoPE positions restart per document
    (:func:`packed_positions`), and the loss masks out cross-document and
    padding targets — the packed step computes, token for token, what each
    document would get in its own row, with zero pad-token attention FLOPs
    wasted on real rows' budgets.  Loss = masked mean over valid next-token
    targets, globally weighted across DP shards by valid-token count.
    """
    grad_map = _make_grad_map(
        mesh, cfg, dp=dp, tp=tp, attn_dropout=attn_dropout, packed=True,
        remat=remat, vocab_parallel=vocab_parallel,
        compute_dtype=compute_dtype,
    )

    def grad_call(params, tokens, segment_ids, seed=0):
        return grad_map(
            params, tokens, segment_ids, jnp.asarray(seed, jnp.int32)
        )

    return _make_step(grad_call, lr, optimizer)


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
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
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


def _make_sp_packed_step(
    mesh, cfg, specs, *, dp, sp, lr, optimizer, attn_dropout, remat,
):
    """Packed-rows DP x SP step body (see make_train_step_sp(packed=True)):
    kv-segment chunks rotate the ring with their KV in both passes."""
    from flashattention_tpu.parallel.ring import ring_attention_vjp_local

    sp_size = mesh.shape[sp]
    g = cfg.group_size
    kvh = cfg.num_kv_heads
    gold = jnp.int32(-1640531527)

    def forward_local(params, tokens, positions, segs, seed):
        b, s_local = tokens.shape
        if attn_dropout is not None:
            seed = seed * gold + jax.lax.axis_index(dp) * jnp.int32(7919)
        ring = ring_attention_vjp_local(
            axis_name=sp, axis_size=sp_size, causal=True,
            scale=cfg.head_dim**-0.5,
            q_seq_len=s_local if g > 1 else None,
            window=cfg.sliding_window, logit_softcap=cfg.logit_softcap,
            dropout_rate=attn_dropout, segments=True,
        )
        # GQA-folded segment ids: q rows g-major per KV head (the fold's
        # layout); kv ids are the LOCAL chunk's, rotated inside the ring.
        seg_qf = jnp.tile(segs[:, None, :], (1, kvh, g)).reshape(
            b * kvh, g * s_local
        )
        seg_kvf = jnp.broadcast_to(segs[:, None, :], (b, kvh, s_local)).reshape(
            b * kvh, s_local
        )

        def one_layer(x, layer, lseed):
            h = _rmsnorm(x, layer["attn_norm"])
            q = (h @ layer["wq"]).reshape(b, s_local, cfg.num_q_heads, cfg.head_dim)
            k = (h @ layer["wk"]).reshape(b, s_local, kvh, cfg.head_dim)
            v = (h @ layer["wv"]).reshape(b, s_local, kvh, cfg.head_dim)
            q = _rope(q, positions, cfg.rope_theta)
            k = _rope(k, positions, cfg.rope_theta)
            qf = (
                q.reshape(b, s_local, kvh, g, cfg.head_dim)
                .transpose(0, 2, 3, 1, 4)
                .reshape(b * kvh, g * s_local, cfg.head_dim)
            )
            kf = k.transpose(0, 2, 1, 3).reshape(b * kvh, s_local, cfg.head_dim)
            vf = v.transpose(0, 2, 1, 3).reshape(b * kvh, s_local, cfg.head_dim)
            if attn_dropout is not None:
                o = ring(qf, kf, vf, seg_qf, seg_kvf, lseed)
            else:
                o = ring(qf, kf, vf, seg_qf, seg_kvf)
            o = (
                o.reshape(b, kvh, g, s_local, cfg.head_dim)
                .transpose(0, 3, 1, 2, 4)
                .reshape(b, s_local, -1)
            )
            x = x + o @ layer["wo"]
            return x + _mlp(
                _rmsnorm(x, layer["mlp_norm"]), layer, cfg.experts_per_token
            )

        if remat:
            one_layer = jax.checkpoint(one_layer)
        x = params["embed"][tokens]
        for li, layer in enumerate(params["layers"]):
            lseed = (
                seed * gold + jnp.int32(li + 1)
                if attn_dropout is not None else 0
            )
            x = one_layer(x, layer, lseed)
        x = _rmsnorm(x, params["final_norm"])
        return x @ params["lm_head"]

    def prep(tokens, segment_ids):
        # Global views first (per-doc positions, next-token validity), THEN
        # shard — each local row keeps its own next token and true position.
        positions = packed_positions(segment_ids)
        targets = jnp.concatenate(
            [tokens[:, 1:], jnp.zeros_like(tokens[:, :1])], axis=1
        )
        valid = jnp.concatenate(
            [
                (
                    (segment_ids[:, 1:] == segment_ids[:, :-1])
                    & (segment_ids[:, 1:] >= 0)
                ).astype(jnp.float32),
                jnp.zeros_like(tokens[:, :1], dtype=jnp.float32),
            ],
            axis=1,
        )
        return (tokens, positions, segment_ids), targets, valid

    return _make_seq_sharded_step(
        mesh, forward_local, specs, dp=dp, sp=sp, lr=lr, optimizer=optimizer,
        prep=prep, n_inputs=3,
    )


def make_train_step_sp(
    mesh: Mesh,
    cfg: ModelConfig,
    *,
    dp: str = "dp",
    sp: str = "sp",
    lr: float = 1e-3,
    zigzag: bool = False,
    optimizer=None,
    attn_dropout: float | None = None,
    remat: bool = False,
    packed: bool = False,
):
    """Sequence-parallel training step: sequences shard over the ``sp`` axis
    and attention runs through the *differentiable ring* (parallel/ring.py),
    so contexts longer than one chip's memory train end-to-end.

    tokens: (B, S) int32, B over dp, S over sp (S a multiple of
    sp_size * 128); params replicated. Gradients: each sp shard owns disjoint
    loss terms, so grads psum over sp and pmean over dp — no collective
    appears inside the differentiated region except the ring itself (whose
    VJP is hand-defined), keeping the reductions exact.

    GQA (round 2; VERDICT #4): grouped-query models fold the G query groups
    of each KV head into the ring's row dimension (ops.flash q_seq_len
    folding) — *unrepeated* KV shards rotate the ring, so KV HBM and ICI
    traffic stay 1/G of the repeated-KV layout.

    ``zigzag=True`` (round 2) uses the load-balanced zigzag ring in BOTH
    passes: the step internally permutes the sequence into the zigzag chunk
    order (device i holds half-chunks i and 2N-1-i), so under causal masking
    every device does constant work instead of the last shard doing N times
    the first's.  Tokens require S % (2 * sp_size * 128) == 0.

    ``optimizer`` (round 2): an optax optimizer; when given, the returned
    step has signature (params, opt_state, tokens) -> (loss, params,
    opt_state), with the update applied OUTSIDE shard_map so the state tree
    shards like the (replicated) params; otherwise plain SGD at ``lr`` with
    the original (params, tokens) -> (loss, params) signature.

    ``attn_dropout`` (round 3): attention dropout through the ring — each
    (device, source-chunk) partial draws an independent regenerated mask in
    BOTH passes (parallel/ring seed folds cover the sp rank; the dp rank and
    layer index fold in here).  The step then takes a trailing traced-int32
    ``seed`` argument, exactly like :func:`make_train_step`.

    ``packed=True`` (round 3): PACKED rows on the ring — long-context
    training over multi-document rows.  ``step(params, tokens,
    segment_ids[, seed])``: kv-segment chunks rotate the ring with their KV
    (attention and gradients never cross documents), RoPE positions restart
    per document (computed on the GLOBAL row then sharded), and the loss is
    the globally-weighted masked mean over valid next-token targets.
    Plain ring only (``zigzag=True`` is rejected: the zigzag permutation
    would interleave documents' halves).
    """
    from flashattention_tpu.parallel.ring import (
        ring_attention_vjp_local,
        zigzag_ring_attention_vjp_local,
    )

    if attn_dropout == 0.0:
        attn_dropout = None  # rate 0 is the identity, not an error
    if packed and zigzag:
        raise ValueError(
            "packed SP training runs on the plain ring only (the zigzag "
            "permutation would interleave documents' halves)"
        )

    sp_size = mesh.shape[sp]
    g = cfg.group_size
    specs = param_specs(cfg, tp="__none__")  # no tp axis: replicate weights
    specs = jax.tree.map(lambda s: P(), specs, is_leaf=lambda x: isinstance(x, P))

    if packed:
        return _make_sp_packed_step(
            mesh, cfg, specs, dp=dp, sp=sp, lr=lr, optimizer=optimizer,
            attn_dropout=attn_dropout, remat=remat,
        )

    def forward_local(params, tokens, seed):
        b, s_local = tokens.shape
        sp_idx = jax.lax.axis_index(sp)
        if attn_dropout is not None:
            # dp-rank fold: the ring itself only decorrelates over sp.  The
            # golden-ratio multiply keeps linear (step, rank) pairs from
            # aliasing (see _make_grad_map.fold_seed).
            seed = seed * jnp.int32(-1640531527) + jax.lax.axis_index(
                dp
            ) * jnp.int32(7919)
        if zigzag:
            # Local rows = [global half-chunk sp_idx ; half-chunk 2N-1-sp_idx].
            c = s_local // 2
            positions = jnp.concatenate(
                [
                    c * sp_idx + jnp.arange(c),
                    c * (2 * sp_size - 1 - sp_idx) + jnp.arange(c),
                ]
            )
            positions = jnp.broadcast_to(positions, (b, s_local))
            ring = zigzag_ring_attention_vjp_local(
                axis_name=sp, axis_size=sp_size, scale=cfg.head_dim**-0.5,
                q_seq_len=s_local if g > 1 else None,
                window=cfg.sliding_window, logit_softcap=cfg.logit_softcap,
                dropout_rate=attn_dropout,
            )
        else:
            positions = s_local * sp_idx + jnp.broadcast_to(
                jnp.arange(s_local), (b, s_local)
            )
            ring = ring_attention_vjp_local(
                axis_name=sp, axis_size=sp_size, causal=True,
                scale=cfg.head_dim**-0.5,
                q_seq_len=s_local if g > 1 else None,
                window=cfg.sliding_window, logit_softcap=cfg.logit_softcap,
                dropout_rate=attn_dropout,
            )
        kvh = cfg.num_kv_heads

        def one_layer(x, layer, lseed):
            h = _rmsnorm(x, layer["attn_norm"])
            q = (h @ layer["wq"]).reshape(b, s_local, cfg.num_q_heads, cfg.head_dim)
            k = (h @ layer["wk"]).reshape(b, s_local, kvh, cfg.head_dim)
            v = (h @ layer["wv"]).reshape(b, s_local, kvh, cfg.head_dim)
            q = _rope(q, positions, cfg.rope_theta)
            k = _rope(k, positions, cfg.rope_theta)
            # Native GQA on the ring: fold the G query groups of each KV head
            # into rows (head order h = kvh*G + g is g-major per KV head, the
            # fold's layout); KV rotates UNREPEATED (B*KVH, s_local, d).
            qf = (
                q.reshape(b, s_local, kvh, g, cfg.head_dim)
                .transpose(0, 2, 3, 1, 4)
                .reshape(b * kvh, g * s_local, cfg.head_dim)
            )
            kf = k.transpose(0, 2, 1, 3).reshape(b * kvh, s_local, cfg.head_dim)
            vf = v.transpose(0, 2, 1, 3).reshape(b * kvh, s_local, cfg.head_dim)
            if attn_dropout is not None:
                o = ring(qf, kf, vf, lseed)
            else:
                o = ring(qf, kf, vf)
            o = (
                o.reshape(b, kvh, g, s_local, cfg.head_dim)
                .transpose(0, 3, 1, 2, 4)
                .reshape(b, s_local, -1)
            )
            x = x + o @ layer["wo"]
            return x + _mlp(
                _rmsnorm(x, layer["mlp_norm"]), layer, cfg.experts_per_token
            )

        if remat:
            # Checkpoint each layer: the backward re-runs the forward ring
            # (same seed folds -> identical dropout masks), so activation
            # memory stays O(1) in depth at ring-scale sequence lengths.
            one_layer = jax.checkpoint(one_layer)
        x = params["embed"][tokens]
        for li, layer in enumerate(params["layers"]):
            if attn_dropout is not None:
                # Per-layer seed: golden-ratio odd multiplier (int32 wrap)
                # keeps consecutive step seeds' layer streams disjoint.
                lseed = seed * jnp.int32(-1640531527) + jnp.int32(li + 1)
            else:
                lseed = 0
            x = one_layer(x, layer, lseed)
        x = _rmsnorm(x, params["final_norm"])
        return x @ params["lm_head"]

    return _make_seq_sharded_step(
        mesh, forward_local, specs, dp=dp, sp=sp, lr=lr, optimizer=optimizer,
        prep=_next_token_prep(zigzag, sp_size),
    )


def make_train_step_3d(
    mesh: Mesh,
    cfg: ModelConfig,
    *,
    dp: str = "dp",
    tp: str = "tp",
    sp: str = "sp",
    lr: float = 1e-3,
    zigzag: bool = False,
    optimizer=None,
    attn_dropout: float | None = None,
    remat: bool = False,
):
    """3D-parallel training step: DP x Megatron-TP x ring-SP (round 3).

    The full production layout for models that are too wide for one chip's
    weights AND too long for one chip's activations: batch shards over
    ``dp``, heads/MLP Megatron-shard over ``tp`` (exact f/g collective
    gradients, as in :func:`make_train_step`), and the sequence shards over
    ``sp`` with attention running through the differentiable ring
    (:func:`make_train_step_sp` — plain causal or load-balanced ``zigzag``),
    GQA-folded so UNREPEATED local-KV-head shards rotate the ring.

    tokens: (B, S) int32, B over dp, S over sp; params from
    :func:`shard_params` on the 3-axis mesh (tp-sharded, dp/sp-replicated).
    Gradients: each (dp, sp) shard owns disjoint loss terms -> loss and
    grads psum over (dp, sp); tp needs no gradient collective (the f/g
    pairs inside the forward make tp-sharded AND replicated leaves exact,
    exactly as in the 2D TP step).

    ``attn_dropout``: trailing traced-int32 ``seed`` argument; masks fold
    (dp rank, tp rank, layer) here and the (sp rank, chunk, piece)
    coordinates inside the ring.
    """
    from flashattention_tpu.parallel.ring import (
        ring_attention_vjp_local,
        zigzag_ring_attention_vjp_local,
    )

    if attn_dropout == 0.0:
        attn_dropout = None  # rate 0 is the identity, not an error

    tp_size, sp_size = mesh.shape[tp], mesh.shape[sp]
    if cfg.num_kv_heads % tp_size:
        raise ValueError(
            f"tp={tp_size} must divide num_kv_heads={cfg.num_kv_heads}"
        )
    g = cfg.group_size
    hq_local = cfg.num_q_heads // tp_size
    hkv_local = cfg.num_kv_heads // tp_size
    hd = cfg.head_dim
    specs = param_specs(cfg, tp)
    gold = jnp.int32(-1640531527)

    def forward_local(params, tokens, seed):
        b, s_local = tokens.shape
        sp_idx = jax.lax.axis_index(sp)
        if attn_dropout is not None:
            # dp/tp rank folds; the ring folds sp rank + chunk + piece.
            seed = (
                seed * gold
                + jax.lax.axis_index(dp) * jnp.int32(7919)
                + jax.lax.axis_index(tp) * jnp.int32(104729)
            )
        if zigzag:
            c = s_local // 2
            positions = jnp.concatenate(
                [
                    c * sp_idx + jnp.arange(c),
                    c * (2 * sp_size - 1 - sp_idx) + jnp.arange(c),
                ]
            )
            positions = jnp.broadcast_to(positions, (b, s_local))
            ring = zigzag_ring_attention_vjp_local(
                axis_name=sp, axis_size=sp_size, scale=hd**-0.5,
                q_seq_len=s_local if g > 1 else None,
                window=cfg.sliding_window, logit_softcap=cfg.logit_softcap,
                dropout_rate=attn_dropout,
            )
        else:
            positions = s_local * sp_idx + jnp.broadcast_to(
                jnp.arange(s_local), (b, s_local)
            )
            ring = ring_attention_vjp_local(
                axis_name=sp, axis_size=sp_size, causal=True, scale=hd**-0.5,
                q_seq_len=s_local if g > 1 else None,
                window=cfg.sliding_window, logit_softcap=cfg.logit_softcap,
                dropout_rate=attn_dropout,
            )
        def one_layer(x, layer, lseed):
            h = _f_identity(_rmsnorm(x, layer["attn_norm"]), tp)
            q = (h @ layer["wq"]).reshape(b, s_local, hq_local, hd)
            k = (h @ layer["wk"]).reshape(b, s_local, hkv_local, hd)
            v = (h @ layer["wv"]).reshape(b, s_local, hkv_local, hd)
            q = _rope(q, positions, cfg.rope_theta)
            k = _rope(k, positions, cfg.rope_theta)
            # GQA fold on the LOCAL head shard (g-major per KV head, the
            # contiguous tp column slice of the global order); unrepeated
            # local KV rotates the sp ring.
            qf = q.transpose(0, 2, 1, 3).reshape(b * hkv_local, g * s_local, hd)
            kf = k.transpose(0, 2, 1, 3).reshape(b * hkv_local, s_local, hd)
            vf = v.transpose(0, 2, 1, 3).reshape(b * hkv_local, s_local, hd)
            if attn_dropout is not None:
                o = ring(qf, kf, vf, lseed)
            else:
                o = ring(qf, kf, vf)
            o = (
                o.reshape(b, hq_local, s_local, hd)
                .transpose(0, 2, 1, 3)
                .reshape(b, s_local, hq_local * hd)
            )
            x = x + _g_allreduce(o @ layer["wo"], tp)
            return x + _g_allreduce(
                _mlp(
                    _f_identity(_rmsnorm(x, layer["mlp_norm"]), tp),
                    layer, cfg.experts_per_token,
                ),
                tp,
            )

        if remat:
            one_layer = jax.checkpoint(one_layer)
        x = params["embed"][tokens]
        for li, layer in enumerate(params["layers"]):
            lseed = (
                seed * gold + jnp.int32(li + 1)
                if attn_dropout is not None else 0
            )
            x = one_layer(x, layer, lseed)
        x = _rmsnorm(x, params["final_norm"])
        return x @ params["lm_head"]

    # tp shards compute identical losses (x is tp-replicated after the g
    # collectives), so the shared (dp, sp)-reducing tail applies unchanged.
    return _make_seq_sharded_step(
        mesh, forward_local, specs, dp=dp, sp=sp, lr=lr, optimizer=optimizer,
        prep=_next_token_prep(zigzag, sp_size),
    )


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
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
            nll = jnp.mean(-jnp.take_along_axis(logp, targets[..., None], -1))
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
            logp = jax.nn.log_softmax(
                logits[:, :-1].astype(jnp.float32), axis=-1
            )
            nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
            return jnp.mean(nll)

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
