"""Sequence-parallel (ring / zigzag) training steps, incl. packed SP.

Split out of the former models/train.py monolith (round 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from flashattention_tpu.models.transformer import ModelConfig, _mlp, _rmsnorm, _rope
from flashattention_tpu.models.train.common import _make_seq_sharded_step, _next_token_prep, packed_positions, param_specs
from flashattention_tpu.models.train.forward import _make_grad_map


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


