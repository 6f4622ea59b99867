"""Sharded decode serving: DP x TP paged attention + model decode step.

The multi-host half of the BASELINE.json north star ("continuous batching of
decode requests across hosts", ">=85% linear decode tokens/s scaling"): the
reference is single-GPU (SURVEY.md 2.15/2.16), so the scaling design is
TPU-native from scratch:

- **TP (axis "tp") over KV heads**: the page pools ``(L, P, KVH, ps, d)``
  shard their KVH axis; every chip runs the paged decode kernel on its local
  heads for the whole batch with *zero* attention-time communication (the
  head fold the reference's caller does into batch, lifted to the mesh), and
  one ``psum`` finishes each row-sharded output projection (Megatron).
- **DP (axis "dp") over requests**: the batch, its page table, and the pool's
  *page* axis shard together — each dp group owns a private page pool slice
  and its page indices are local to that slice.  Requests never cross dp
  groups, so decode tokens/s scales linearly with dp (request-level
  parallelism over DCN between hosts).

``make_sharded_paged_attention`` shards the kernel alone;
``make_sharded_decode_step`` shards the full transformer decode step
(scatter K/V writes into the local pool slice + paged attention + MLP), the
serving twin of ``models/train.py``'s training step.
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, PartitionSpec as P

from flashattention_tpu.models.train import param_specs
from flashattention_tpu.models.transformer import ModelConfig, decode_step_impl
from flashattention_tpu.ops.decode import paged_attention

__all__ = ["make_sharded_paged_attention", "make_sharded_decode_step"]


def make_sharded_paged_attention(
    mesh: Mesh,
    *,
    batch_axis: str = "dp",
    kv_head_axis: str = "tp",
    scale: float = 1.0,
    quantized: bool = False,
    interpret: bool | None = None,
):
    """Sharded paged decode attention over (dp, tp).

    Layout: q (B, KVH, G, d) with B over dp, KVH over tp; pools
    (P, KVH, ps, d) with P over dp (private pool slice per dp group) and KVH
    over tp; lengths (B,) and page_indices (B, pps) over dp, page ids local
    to the dp slice.  No communication at all — attention output shards
    exactly like q.

    With ``quantized=True`` the returned fn takes two extra trailing args,
    the (P, KVH, ps) k/v scale pools, sharded exactly like the payload pools
    (the int8/fp8 KV-cache serving mode of BASELINE.json).
    """
    q_spec = P(batch_axis, kv_head_axis, None, None)
    pool_spec = P(batch_axis, kv_head_axis, None, None)
    scale_spec = P(batch_axis, kv_head_axis, None)
    len_spec = P(batch_axis)
    pi_spec = P(batch_axis, None)

    if quantized:

        def local(q, k_pages, v_pages, lengths, page_indices, ks, vs):
            return paged_attention(
                q, k_pages, v_pages, lengths, page_indices,
                k_scales_pages=ks, v_scales_pages=vs,
                scale=scale, interpret=interpret,
            )

        in_specs = (
            q_spec, pool_spec, pool_spec, len_spec, pi_spec,
            scale_spec, scale_spec,
        )
    else:

        def local(q, k_pages, v_pages, lengths, page_indices):
            return paged_attention(
                q, k_pages, v_pages, lengths, page_indices,
                scale=scale, interpret=interpret,
            )

        in_specs = (q_spec, pool_spec, pool_spec, len_spec, pi_spec)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=q_spec,
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_decode_step(
    mesh: Mesh,
    cfg: ModelConfig,
    *,
    dp: str = "dp",
    tp: str = "tp",
    quantized: bool = False,
    interpret: bool | None = None,
):
    """Jitted sharded decode step: one token for a whole DP x TP batch.

    Runs ``models.transformer.decode_step_impl`` (the exact single-device
    body) inside shard_map with TP-local head counts and psum'd row-parallel
    projections:
    (params, tokens, positions, k_pages, v_pages, lengths, page_indices,
    write_pages, write_slots[, k_scales, v_scales]) ->
    (logits, k_pages, v_pages[, k_scales, v_scales]).

    Sharding: params per ``models.train.param_specs`` (Megatron column/row);
    tokens/positions/lengths/write_* (B,) over dp; page_indices (B, pps) over
    dp with page ids local to the dp pool slice; pools (L, P, KVH, ps, d)
    with P over dp and KVH over tp; with ``quantized=True``, scale pools
    (L, P, KVH, ps) shard the same way.
    """
    tp_size = mesh.shape[tp]
    if cfg.num_kv_heads % tp_size:
        raise ValueError(f"tp={tp_size} must divide num_kv_heads={cfg.num_kv_heads}")
    local_cfg = dataclasses.replace(
        cfg,
        num_q_heads=cfg.num_q_heads // tp_size,
        num_kv_heads=cfg.num_kv_heads // tp_size,
    )
    specs = param_specs(cfg, tp)
    pool_spec = P(None, dp, tp, None, None)
    scale_spec = P(None, dp, tp, None)
    vec_spec = P(dp)

    if quantized:

        def local_step(
            params, tokens, positions, k_pages, v_pages, lengths,
            page_indices, write_pages, write_slots, k_scales, v_scales,
        ):
            logits, kp, vp, ks, vs = decode_step_impl(
                params, tokens, positions, k_pages, v_pages, lengths,
                page_indices, write_pages, write_slots, local_cfg,
                k_scales, v_scales, interpret, tp_axis=tp,
            )
            return logits, kp, vp, ks, vs

        in_specs = (
            specs, vec_spec, vec_spec, pool_spec, pool_spec, vec_spec,
            P(dp, None), vec_spec, vec_spec, scale_spec, scale_spec,
        )
        out_specs = (vec_spec, pool_spec, pool_spec, scale_spec, scale_spec)
        donate = (3, 4, 9, 10)
    else:

        def local_step(
            params, tokens, positions, k_pages, v_pages, lengths,
            page_indices, write_pages, write_slots,
        ):
            logits, kp, vp, _, _ = decode_step_impl(
                params, tokens, positions, k_pages, v_pages, lengths,
                page_indices, write_pages, write_slots, local_cfg,
                None, None, interpret, tp_axis=tp,
            )
            return logits, kp, vp

        in_specs = (
            specs, vec_spec, vec_spec, pool_spec, pool_spec, vec_spec,
            P(dp, None), vec_spec, vec_spec,
        )
        out_specs = (vec_spec, pool_spec, pool_spec)
        donate = (3, 4)

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=donate)
