"""Ring attention: sequence-parallel attention over a mesh axis.

This scales the reference's *intra-GPU* sequence-block parallelism
(grid.y over Q blocks, ``/root/reference/src/flashattention_lightning.cu:133-237``
and ``src/flashattention.cu:592``) *across chips*: the KV sequence is sharded
over a mesh axis, KV shards rotate around the ring via ``jax.lax.ppermute``
(point-to-point over ICI), and each step's partial result is merged with the
exact online-softmax rescale algebra the reference applies per KV block
(``src/flashattention.cu:277-291``) — the per-block (m, l, O) combiner *is*
the cross-device combiner, which is why the kernel exports (l, m) as
first-class outputs.

Used inside ``jax.shard_map`` (see :func:`make_ring_attention`): every chip
runs the single-chip Pallas flash kernel on its resident Q shard against the
KV shard currently in front of it, so ICI transfer overlaps the kernel's MXU
work (XLA schedules the ppermute concurrently with the next pallas_call).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashattention_tpu.ops.flash import BlockSizes, flash_attention

__all__ = ["ring_attention_local", "make_ring_attention", "merge_partials"]


def merge_partials(o1, l1, m1, o2, l2, m2):
    """Merge two normalized partial attention results.

    Each partial is (o, l, m) with o = softmax-weighted V over its KV subset,
    l = sum exp(s - m), m = row max.  This is the associative online-softmax
    combine (the reference's rescale step, src/flashattention.cu:277-291,
    lifted from per-block to per-device granularity).

    o: (BH, S, d); l, m: (BH, S), float32.
    """
    m_new = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m_new) * l1  # un-normalize weights of partial 1
    a2 = jnp.exp(m2 - m_new) * l2
    l_new = a1 + a2
    denom = jnp.where(l_new == 0.0, 1.0, l_new)
    o = (
        o1.astype(jnp.float32) * (a1 / denom)[..., None]
        + o2.astype(jnp.float32) * (a2 / denom)[..., None]
    )
    return o.astype(o1.dtype), l_new, m_new


def ring_attention_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    axis_size: int,
    causal: bool = False,
    scale: float = 1.0,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
):
    """Per-shard ring attention body (call inside shard_map).

    q, k, v: local shards (BH, S_local, d); the sequence axis of both Q and KV
    is sharded over ``axis_name`` with equal chunks in ring order.
    Returns the local O shard (full attention over the global KV sequence).
    """
    bh, s_local, d = q.shape
    my_idx = jax.lax.axis_index(axis_name)

    def partial_full(kb, vb):
        return flash_attention(
            q,
            kb,
            vb,
            causal=False,
            scale=scale,
            block_sizes=block_sizes,
            save_residuals=True,
            interpret=interpret,
        )

    def partial_diag(kb, vb):
        # KV chunk == own chunk: local causal attention (diagonal block).
        return flash_attention(
            q,
            kb,
            vb,
            causal=True,
            scale=scale,
            block_sizes=block_sizes,
            save_residuals=True,
            interpret=interpret,
        )

    def partial_skip(kb, vb):
        del kb, vb
        return (
            jnp.zeros((bh, s_local, d), q.dtype),
            jnp.zeros((bh, s_local), jnp.float32),
            jnp.full((bh, s_local), -jnp.inf, jnp.float32),
        )

    o = jnp.zeros((bh, s_local, d), q.dtype)
    l = jnp.zeros((bh, s_local), jnp.float32)
    m = jnp.full((bh, s_local), -jnp.inf, jnp.float32)

    kb, vb = k, v
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    for step in range(axis_size):
        # The KV chunk now resident came from ring position (my_idx - step).
        src = jax.lax.rem(my_idx - step + axis_size, axis_size)
        if causal:
            # 0: src < my_idx (past chunk, no mask), 1: src == my_idx
            # (diagonal, local causal mask), 2: src > my_idx (future, skip).
            case = jnp.where(src == my_idx, 1, jnp.where(src < my_idx, 0, 2))
            po, pl, pm = jax.lax.switch(
                case, [partial_full, partial_diag, partial_skip], kb, vb
            )
        else:
            po, pl, pm = partial_full(kb, vb)
        o, l, m = merge_partials(o, l, m, po, pl, pm)

        if step != axis_size - 1:
            # Rotate KV around the ring (point-to-point ICI transfer, scheduled
            # by XLA to overlap with the next step's pallas_call).
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)

    return o


def make_ring_attention(
    mesh: Mesh,
    *,
    axis_name: str = "sp",
    causal: bool = False,
    scale: float = 1.0,
    batch_axis: str | None = None,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
):
    """Build a jitted ring-attention fn over ``mesh``.

    Input/output layout: (BH, S, d) with S sharded over ``axis_name`` (and BH
    optionally sharded over ``batch_axis`` for combined DP/TP x SP).
    """
    axis_size = mesh.shape[axis_name]
    bh_spec = batch_axis if batch_axis else None
    spec = P(bh_spec, axis_name, None)

    local = functools.partial(
        ring_attention_local,
        axis_name=axis_name,
        axis_size=axis_size,
        causal=causal,
        scale=scale,
        block_sizes=block_sizes,
        interpret=interpret,
    )

    fn = jax.shard_map(
        lambda q, k, v: local(q, k, v),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)
