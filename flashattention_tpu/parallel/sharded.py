"""Mesh-sharded attention wrappers: DP over batch, TP over heads, CP variants.

The reference has *no* cross-device parallelism (SURVEY.md 2.15/2.16: its only
"backend" is cudaMemcpy + cudaDeviceSynchronize; heads are folded into batch
by the caller).  Here the same fold becomes mesh sharding: the (B*H) leading
dim shards over data/model axes with zero communication during attention
(each chip runs the single-chip Pallas kernel on its slice), and long
sequences shard over a sequence axis via either KV all-gather or ring
attention (:mod:`flashattention_tpu.parallel.ring`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flashattention_tpu.ops.flash import BlockSizes, flash_attention

__all__ = [
    "make_data_parallel_attention",
    "make_allgather_cp_attention",
    "make_reduce_cp_attention",
    "make_ulysses_attention",
    "make_ulysses_attention_vjp",
]


def make_data_parallel_attention(
    mesh: Mesh,
    *,
    axes=("dp",),
    causal: bool = False,
    scale: float = 1.0,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
):
    """Batch(+head) parallel attention: (BH, S, d) with BH sharded over axes.

    DP over batch and TP over heads are the same sharding once heads are
    folded (the reference's caller convention, bench_flashattention.py:31-33):
    no communication during attention at all.
    """
    spec = P(axes, None, None)

    def local(q, k, v):
        return flash_attention(
            q,
            k,
            v,
            causal=causal,
            scale=scale,
            block_sizes=block_sizes,
            interpret=interpret,
        )

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)


def make_allgather_cp_attention(
    mesh: Mesh,
    *,
    axis_name: str = "sp",
    causal: bool = False,
    scale: float = 1.0,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
):
    """Context parallelism, all-gather flavor: Q and KV sharded on S; each chip
    all-gathers the full KV then runs the local kernel on its Q shard.

    Simpler than ring attention, costs O(S * d) ICI bytes up front with no
    compute overlap; the right choice for short-to-moderate S.
    """
    spec = P(None, axis_name, None)

    def local(q, k, v):
        kf = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)
        vf = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
        s_local = q.shape[1]
        if causal:
            # Queries of shard i live at global offset i * s_local.  The
            # kernel takes q_offset as a scalar-prefetched traced value, so
            # ONE compiled program serves every shard at any axis size
            # (round 2; previously a lax.switch compiled O(N) variants).
            idx = jax.lax.axis_index(axis_name)
            return flash_attention(
                q, kf, vf, causal=True, scale=scale,
                q_offset=idx * s_local,
                block_sizes=block_sizes, interpret=interpret,
            )
        return flash_attention(
            q, kf, vf, causal=False, scale=scale,
            block_sizes=block_sizes, interpret=interpret,
        )

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)


def make_reduce_cp_attention(
    mesh: Mesh,
    *,
    axis_name: str = "sp",
    scale: float = 1.0,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
):
    """Context parallelism, reduce flavor (non-causal): Q replicated, KV
    sharded on S; each chip computes a partial (o, l, m) against its local KV
    shard and partials merge with the online-softmax combiner via collectives
    (pmax + psum) — O(d) bytes per query instead of O(S * d).
    """
    kv_spec = P(None, axis_name, None)
    q_spec = P(None, None, None)

    def local(q, k, v):
        o, l, m = flash_attention(
            q, k, v, causal=False, scale=scale, save_residuals=True,
            block_sizes=block_sizes, interpret=interpret,
        )
        m_g = jax.lax.pmax(m, axis_name)
        a = jnp.exp(m - m_g) * l
        l_g = jax.lax.psum(a, axis_name)
        o_g = jax.lax.psum(o.astype(jnp.float32) * a[..., None], axis_name)
        denom = jnp.where(l_g == 0.0, 1.0, l_g)
        return (o_g / denom[..., None]).astype(q.dtype)

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(q_spec, kv_spec, kv_spec), out_specs=q_spec,
        check_vma=False,
    )
    return jax.jit(fn)


def make_ulysses_attention(
    mesh: Mesh,
    *,
    axis_name: str = "sp",
    causal: bool = False,
    scale: float = 1.0,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
):
    """Ulysses-style sequence parallelism: all-to-all head scatter.

    The SURVEY.md section 5 alternative to ring attention: inputs arrive
    sequence-sharded as (B, H, S, d) with S over ``axis_name``; an all-to-all
    trades the sequence sharding for a head sharding (each device gets H/N
    heads x the FULL sequence), the local fused kernel runs with ordinary
    causal masking (no cross-device softmax merge needed at all), and a
    second all-to-all restores the sequence sharding.

    vs ring attention: two all-to-alls of O(S*d/N) per device instead of N-1
    ppermutes, no partial-merge numerics, but requires H % axis_size == 0 and
    peak memory holds the full sequence for the local heads.

    GQA (round 2): grouped-query inputs (KVH != H, even KVH < axis_size)
    all-gather the small KV along the sequence and slice each device's KV
    head range; q still head-scatters.  Requires the per-device q-head count
    to align with the group size.
    """
    axis_size = mesh.shape[axis_name]
    spec = P(None, None, axis_name, None)

    def local(q, k, v):
        b, h, s_local, d = q.shape
        kvh = k.shape[1]
        if h % axis_size:
            raise ValueError(f"heads ({h}) must divide over {axis_name}={axis_size}")
        h_local = h // axis_size
        s = s_local * axis_size
        # (B, H, S/N, d) -> (B, H/N, S, d): scatter heads, gather sequence.
        qh = jax.lax.all_to_all(
            q, axis_name, split_axis=1, concat_axis=2, tiled=True
        )
        if kvh == h:
            kh, vh = (
                jax.lax.all_to_all(
                    x, axis_name, split_axis=1, concat_axis=2, tiled=True
                )
                for x in (k, v)
            )
            o = flash_attention(
                qh.reshape(b * h_local, s, d),
                kh.reshape(b * h_local, s, d),
                vh.reshape(b * h_local, s, d),
                causal=causal,
                scale=scale,
                block_sizes=block_sizes,
                interpret=interpret,
            ).reshape(b, h_local, s, d)
        else:
            # GQA (round 2): KV heads are G-times fewer, possibly fewer than
            # the axis — all-gather the (small) KV along the sequence instead
            # of head-scattering it, then slice the KV heads this device's
            # contiguous q-head range maps to.  Comm: O(KVH*S*d) KV gather +
            # O(H*S*d/N) q all-to-all — the KV side is G-times smaller than
            # the q side, which is the GQA point.
            g = h // kvh
            if h_local % g and g % h_local:
                raise ValueError(
                    f"local q heads ({h_local}) must align with GQA groups "
                    f"({g}): need h_local % g == 0 or g % h_local == 0"
                )
            kf = jax.lax.all_gather(k, axis_name, axis=2, tiled=True)
            vf = jax.lax.all_gather(v, axis_name, axis=2, tiled=True)
            idx = jax.lax.axis_index(axis_name)
            kv_count = max(1, h_local // g)
            kv_start = (idx * h_local) // g
            ks_ = jax.lax.dynamic_slice_in_dim(kf, kv_start, kv_count, axis=1)
            vs_ = jax.lax.dynamic_slice_in_dim(vf, kv_start, kv_count, axis=1)
            from flashattention_tpu.ops.dispatch import attention as _attn

            o = _attn(
                qh,
                ks_,
                vs_,
                causal=causal,
                scale=scale,
                block_sizes=block_sizes,
                interpret=interpret,
            )
        # (B, H/N, S, d) -> (B, H, S/N, d): scatter sequence, gather heads.
        return jax.lax.all_to_all(
            o, axis_name, split_axis=2, concat_axis=1, tiled=True
        )

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)


def make_ulysses_attention_vjp(
    mesh: Mesh,
    *,
    axis_name: str = "sp",
    causal: bool = False,
    scale: float = 1.0,
    block_sizes: BlockSizes | None = None,
    interpret: bool | None = None,
):
    """Differentiable Ulysses sequence parallelism (round 3).

    Same layout and collectives as :func:`make_ulysses_attention`; the local
    kernel is the VJP-capable fused attention, and the gradient of the comm
    pattern falls out of autodiff — ``all_to_all`` is self-transposing (its
    cotangent is the reverse all_to_all) and the GQA KV ``all_gather``'s
    transpose is a reduce-scatter, so no hand-written backward schedule is
    needed (contrast the ring, whose custom VJP re-rotates KV).

    vs the differentiable ring for SP *training*: two all-to-alls per
    direction instead of N-1 ppermutes and no partial-merge numerics, at the
    cost of holding the full sequence for H/N heads (forward and backward).
    """
    from flashattention_tpu.ops.backward import attention_vjp

    axis_size = mesh.shape[axis_name]
    spec = P(None, None, axis_name, None)

    def local(q, k, v):
        b, h, s_local, d = q.shape
        kvh = k.shape[1]
        if h % axis_size:
            raise ValueError(f"heads ({h}) must divide over {axis_name}={axis_size}")
        h_local = h // axis_size
        s = s_local * axis_size
        qh = jax.lax.all_to_all(
            q, axis_name, split_axis=1, concat_axis=2, tiled=True
        )
        if kvh == h:
            kh, vh = (
                jax.lax.all_to_all(
                    x, axis_name, split_axis=1, concat_axis=2, tiled=True
                )
                for x in (k, v)
            )
            o = attention_vjp(
                qh.reshape(b * h_local, s, d),
                kh.reshape(b * h_local, s, d),
                vh.reshape(b * h_local, s, d),
                causal, scale, block_sizes, None, interpret,
            ).reshape(b, h_local, s, d)
        else:
            # GQA: all-gather the (G-times smaller) KV along sequence and
            # slice this device's KV-head range — identical to the forward-
            # only wrapper; the gather's transpose reduce-scatters dK/dV
            # back to their sequence shards automatically.
            g = h // kvh
            if h_local % g and g % h_local:
                raise ValueError(
                    f"local q heads ({h_local}) must align with GQA groups "
                    f"({g}): need h_local % g == 0 or g % h_local == 0"
                )
            kf = jax.lax.all_gather(k, axis_name, axis=2, tiled=True)
            vf = jax.lax.all_gather(v, axis_name, axis=2, tiled=True)
            idx = jax.lax.axis_index(axis_name)
            kv_count = max(1, h_local // g)
            kv_start = (idx * h_local) // g
            ks_ = jax.lax.dynamic_slice_in_dim(kf, kv_start, kv_count, axis=1)
            vs_ = jax.lax.dynamic_slice_in_dim(vf, kv_start, kv_count, axis=1)
            # Fold (B, H/N) and the per-KV-head q groups into the kernel's
            # GQA row layout: rows g-major per KV head, unrepeated KV.
            gl = h_local // kv_count  # q groups per local KV head
            qf = qh.reshape(b * kv_count, gl * s, d)
            o = attention_vjp(
                qf,
                ks_.reshape(b * kv_count, s, d),
                vs_.reshape(b * kv_count, s, d),
                causal, scale, block_sizes, None, interpret,
                s if gl > 1 else None,
            ).reshape(b, kv_count, gl, s, d).reshape(b, h_local, s, d)
        return jax.lax.all_to_all(
            o, axis_name, split_axis=2, concat_axis=1, tiled=True
        )

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)
