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

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashattention_tpu.models.transformer import (
    ModelConfig,
    _mlp,
    _qkv,
    _rmsnorm,
)
from flashattention_tpu.models.train import param_specs
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
    interpret: bool | None = None,
):
    """Jitted sharded decode step: one token for a whole DP x TP batch.

    Signature mirrors ``models.transformer.decode_step`` (unquantized pools):
    (params, tokens, positions, k_pages, v_pages, lengths, page_indices,
    write_pages, write_slots) -> (logits, k_pages, v_pages).

    Sharding: params per ``models.train.param_specs`` (Megatron column/row);
    tokens/positions/lengths/write_* (B,) over dp; page_indices (B, pps) over
    dp with page ids local to the dp pool slice; pools (L, P, KVH, ps, d)
    with P over dp and KVH over tp.
    """
    tp_size = mesh.shape[tp]
    if cfg.num_kv_heads % tp_size:
        raise ValueError(f"tp={tp_size} must divide num_kv_heads={cfg.num_kv_heads}")
    hq_local = cfg.num_q_heads // tp_size
    hkv_local = cfg.num_kv_heads // tp_size
    g = cfg.group_size
    specs = param_specs(cfg, tp)
    pool_spec = P(None, dp, tp, None, None)
    vec_spec = P(dp)

    def local_step(
        params, tokens, positions, k_pages, v_pages, lengths, page_indices,
        write_pages, write_slots,
    ):
        b = tokens.shape[0]
        x = params["embed"][tokens][:, None, :]  # (B_local, 1, d_model)
        pos = positions[:, None]
        local_cfg = ModelConfig(
            **{
                **cfg.__dict__,
                "num_q_heads": hq_local,
                "num_kv_heads": hkv_local,
            }
        )
        for li, layer in enumerate(params["layers"]):
            h = _rmsnorm(x, layer["attn_norm"])
            q, k, v = _qkv(h, layer, local_cfg, pos)  # (B, 1, H_local, d)
            k_row = k[:, 0].astype(k_pages.dtype)  # (B, KVH_local, d)
            v_row = v[:, 0].astype(v_pages.dtype)
            k_pages = k_pages.at[li, write_pages, :, write_slots, :].set(
                k_row, mode="drop"
            )
            v_pages = v_pages.at[li, write_pages, :, write_slots, :].set(
                v_row, mode="drop"
            )
            qg = q[:, 0].reshape(b, hkv_local, g, cfg.head_dim)
            o = paged_attention(
                qg, k_pages[li], v_pages[li], lengths, page_indices,
                scale=cfg.head_dim**-0.5, interpret=interpret,
            )  # (B, KVH_local, G, d)
            o = o.reshape(b, 1, hq_local * cfg.head_dim)
            x = x + jax.lax.psum(o @ layer["wo"], tp)
            x = x + jax.lax.psum(_mlp(_rmsnorm(x, layer["mlp_norm"]), layer), tp)
        x = _rmsnorm(x[:, 0], params["final_norm"])
        logits = x @ params["lm_head"]
        return logits, k_pages, v_pages

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            specs, vec_spec, vec_spec, pool_spec, pool_spec, vec_spec,
            P(dp, None), vec_spec, vec_spec,
        ),
        out_specs=(vec_spec, pool_spec, pool_spec),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(3, 4))
