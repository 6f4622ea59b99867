"""3D DP x TP x SP training step.

Split out of the former models/train.py monolith (round 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from flashattention_tpu.models.transformer import ModelConfig, _mlp, _rmsnorm, _rope
from flashattention_tpu.models.train.common import _f_identity, _g_allreduce, _make_seq_sharded_step, _next_token_prep, param_specs, shard_params


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


