"""Local (per-shard) transformer forward + the DP x TP grad-map builder.

Split out of the former models/train.py monolith (round 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from flashattention_tpu.models.transformer import ModelConfig, _mlp, _rmsnorm, _rope
from flashattention_tpu.ops.backward import attention_vjp
from flashattention_tpu.models.train.common import _cast_floats, _f_identity, _g_allreduce, _vocab_parallel_nll, packed_positions, param_specs, token_nll


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
        return token_nll(logits, targets)

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


