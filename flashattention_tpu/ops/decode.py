"""Decode attention over a paged KV cache (single query token per request).

The reference has no decode path at all (SURVEY.md section 0: no KV-cache, no
decode); this implements the BASELINE.json north-star serving kernel: causal
decode attention with a *paged* KV cache, optionally int8/fp8-quantized with
per-token scales dequantized in-kernel.

Design (TPU-native, not a CUDA translation):
- KV pages live in HBM (``memory_space=ANY``); the kernel gathers the pages
  of each compute block with one async DMA per page (non-contiguous pages
  can't be strided), double-buffered so the next block's DMA overlaps the
  current block's compute.
- Page indices and sequence lengths arrive via scalar prefetch
  (``PrefetchScalarGridSpec``) so DMA addresses are computable before the
  kernel body runs.
- GQA layout: q is (B, KVH, G, d) — the G query heads sharing one KV head are
  processed together, turning the decode matvec into a (G, bk) matmul.
- Online softmax with (m, l, acc) in VMEM scratch across KV blocks, same
  combiner as the prefill kernel (``ops/flash.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattention_tpu.ops.reference import DEFAULT_MASK_VALUE

__all__ = ["paged_attention", "paged_attention_reference"]


def paged_attention_reference(q, k_pages, v_pages, lengths, page_indices, *, scale=1.0):
    """Pure-jnp oracle: gather pages densely, mask by length, attend.

    q: (B, KVH, G, d); k_pages/v_pages: (KVH, P, page_size, d);
    lengths: (B,); page_indices: (B, pages_per_seq). Returns (B, KVH, G, d).
    """
    b, kvh, g, d = q.shape
    _, _, page_size, _ = k_pages.shape
    pages_per_seq = page_indices.shape[1]
    s_max = pages_per_seq * page_size

    # Gather: (KVH, B, pages_per_seq, page_size, d) -> (B, KVH, S_max, d)
    k = jnp.moveaxis(k_pages[:, page_indices], 1, 0).reshape(b, kvh, s_max, d)
    v = jnp.moveaxis(v_pages[:, page_indices], 1, 0).reshape(b, kvh, s_max, d)

    s = jnp.einsum(
        "bhgd,bhkd->bhgk",
        q.astype(jnp.float32),
        k.astype(jnp.float32),
        precision="highest",
    ) * scale
    mask = jnp.arange(s_max)[None, :] < lengths[:, None]  # (B, S_max)
    s = jnp.where(mask[:, None, None, :], s, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = (
        jnp.einsum("bhgk,bhkd->bhgd", p, v.astype(jnp.float32), precision="highest")
        / l
    )
    return o.astype(q.dtype)


def _paged_kernel(
    # scalar prefetch
    lengths_ref,
    page_indices_ref,  # flattened (B * pages_per_seq,)
    # inputs
    q_ref,  # (1, 1, G, d) VMEM
    k_pages_ref,  # (KVH, P, page_size, d) HBM
    v_pages_ref,
    k_scales_ref,  # (KVH, P, page_size) HBM (dummy when not quantized)
    v_scales_ref,
    # outputs
    o_ref,  # (1, 1, G, d) VMEM
    # scratch
    buf_idx,  # SMEM (1,) int32: which double-buffer slot holds this block
    k_buf,  # (2, pages_per_block, page_size, d) VMEM
    v_buf,
    ks_buf,  # (2, pages_per_block, page_size) VMEM
    vs_buf,
    sems,  # DMA semaphores (2, 4)
    m_scratch,  # (G8, 128) f32
    l_scratch,
    acc_scratch,  # (G8, d) f32
    *,
    batch_size: int,
    num_kv_heads: int,
    pages_per_seq: int,
    pages_per_block: int,
    page_size: int,
    scale: float,
    quantized: bool,
    mask_value: float = DEFAULT_MASK_VALUE,
):
    b, h, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    bk = pages_per_block * page_size
    length = lengths_ref[b]

    def dma(slot, p, kind, h_=None, page=None):
        """Descriptor for page p of buffer ``slot``; src only matters for
        start() (wait() uses it for the byte count, identical per page)."""
        h_ = 0 if h_ is None else h_
        page = 0 if page is None else page
        hbm = (k_pages_ref, v_pages_ref, k_scales_ref, v_scales_ref)[kind]
        buf = (k_buf, v_buf, ks_buf, vs_buf)[kind]
        return pltpu.make_async_copy(
            hbm.at[h_, page], buf.at[slot, p], sems.at[slot, kind]
        )

    def start_dma(b_, h_, i_, slot):
        kinds = (0, 1, 2, 3) if quantized else (0, 1)
        for p in range(pages_per_block):
            page = page_indices_ref[b_ * pages_per_seq + i_ * pages_per_block + p]
            for kind in kinds:
                dma(slot, p, kind, h_, page).start()

    def wait_dma(slot):
        kinds = (0, 1, 2, 3) if quantized else (0, 1)
        for p in range(pages_per_block):
            for kind in kinds:
                dma(slot, p, kind).wait()

    def next_block(b_, h_, i_):
        """Next (b, h, i) the grid will actually compute (skips the inactive
        tail blocks of each request), for cross-boundary prefetch."""
        i_n = i_ + 1
        rolled_h = i_n * bk >= lengths_ref[b_]
        h_n = jnp.where(rolled_h, h_ + 1, h_)
        i_n = jnp.where(rolled_h, 0, i_n)
        rolled_b = h_n == num_kv_heads
        b_n = jnp.where(rolled_b, b_ + 1, b_)
        h_n = jnp.where(rolled_b, 0, h_n)
        return b_n, h_n, i_n

    is_active = i * bk < length

    @pl.when(is_active)
    def _run():
        # Cold start: the very first grid step must issue its own DMA.
        @pl.when(jnp.logical_and(jnp.logical_and(b == 0, h == 0), i == 0))
        def _cold_start():
            buf_idx[0] = 0
            start_dma(0, 0, 0, 0)

        slot = buf_idx[0]

        @pl.when(i == 0)
        def _init():
            m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
            l_scratch[...] = jnp.zeros_like(l_scratch)
            acc_scratch[...] = jnp.zeros_like(acc_scratch)

        # Prefetch the next active block into the other slot while computing.
        b_n, h_n, i_n = next_block(b, h, i)

        @pl.when(b_n < batch_size)
        def _prefetch():
            start_dma(b_n, h_n, i_n, 1 - slot)

        wait_dma(slot)
        buf_idx[0] = 1 - slot

        g = q_ref.shape[2]
        g8 = m_scratch.shape[0]
        q = q_ref[0, 0].astype(jnp.float32)  # (G, d)
        k = k_buf[slot].reshape(bk, -1).astype(jnp.float32)  # (bk, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (G, bk)
        if quantized:
            s = s * ks_buf[slot].reshape(1, bk)
        if scale != 1.0:
            s = s * scale

        col_ids = i * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col_ids < length, s, mask_value)
        if g8 != g:
            # Pad query-head rows to the sublane quantum so all scratch
            # updates are full-shape (padded rows carry harmless junk).
            s = jnp.pad(s, ((0, g8 - g), (0, 0)), constant_values=mask_value)

        m_prev = m_scratch[:, 0:1]
        l_prev = l_scratch[:, 0:1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

        v = v_buf[slot].reshape(bk, -1).astype(jnp.float32)
        if quantized:
            p = p * vs_buf[slot].reshape(1, bk)
        pv = jax.lax.dot(p, v, preferred_element_type=jnp.float32)  # (G8, d)
        acc_scratch[...] = acc_scratch[...] * alpha + pv

        # Last active block for this (b, h): normalize and emit.
        @pl.when((i + 1) * bk >= length)
        def _epilogue():
            l = l_scratch[:, 0:1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0] = (acc_scratch[...] * l_inv)[:g].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "pages_per_compute_block", "interpret"),
)
def paged_attention(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    lengths: jax.Array,
    page_indices: jax.Array,
    *,
    k_scales_pages: jax.Array | None = None,
    v_scales_pages: jax.Array | None = None,
    scale: float = 1.0,
    pages_per_compute_block: int = 4,
    interpret: bool | None = None,
) -> jax.Array:
    """Decode attention over a paged KV cache.

    Args:
      q: (B, KVH, G, d) — current-token queries, grouped by KV head (GQA;
        G = num_q_heads // num_kv_heads, G=H for MHA with KVH=1... i.e. any
        grouping where the G heads share the KV head of their group).
      k_pages, v_pages: (KVH, P, page_size, d) page pool in HBM; quantized
        (int8/fp8) payloads if ``k_scales_pages``/``v_scales_pages`` (each
        (KVH, P, page_size) float32) are given.
      lengths: (B,) int32 — tokens valid per request (q attends to [0, len));
        every length must be >= 1.
      page_indices: (B, pages_per_seq) int32 — logical->physical page map.

    Returns (B, KVH, G, d).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, kvh, g, d = q.shape
    kvh2, total_pages, page_size, d2 = k_pages.shape
    if (kvh2, d2) != (kvh, d):
        raise ValueError(f"q/k_pages mismatch: {q.shape} vs {k_pages.shape}")
    if k_pages.shape != v_pages.shape:
        raise ValueError(f"k/v pages mismatch: {k_pages.shape} vs {v_pages.shape}")
    pages_per_seq = page_indices.shape[1]
    if pages_per_seq % pages_per_compute_block:
        raise ValueError(
            f"pages_per_seq ({pages_per_seq}) must be a multiple of "
            f"pages_per_compute_block ({pages_per_compute_block})"
        )
    quantized = k_scales_pages is not None
    if quantized and v_scales_pages is None:
        raise ValueError("k_scales_pages given without v_scales_pages")

    num_blocks = pages_per_seq // pages_per_compute_block
    grid = (b, kvh, num_blocks)
    g8 = -(-g // 8) * 8  # pad query-group rows to the fp32 sublane quantum

    kernel = functools.partial(
        _paged_kernel,
        batch_size=b,
        num_kv_heads=kvh,
        pages_per_seq=pages_per_seq,
        pages_per_block=pages_per_compute_block,
        page_size=page_size,
        scale=scale,
        quantized=quantized,
    )

    # Index maps receive the scalar-prefetch refs as trailing args.
    in_specs = [
        pl.BlockSpec((1, 1, g, d), lambda b, h, i, *_: (b, h, 0, 0)),  # q
        pl.BlockSpec(memory_space=pl.ANY),  # k_pages (HBM)
        pl.BlockSpec(memory_space=pl.ANY),  # v_pages
        pl.BlockSpec(memory_space=pl.ANY),  # k_scales (HBM or dummy)
        pl.BlockSpec(memory_space=pl.ANY),  # v_scales
    ]
    if not quantized:
        # Pallas needs concrete operands; tiny dummies for the unused scales.
        k_scales_pages = jnp.zeros((1, 1, page_size), jnp.float32)
        v_scales_pages = jnp.zeros((1, 1, page_size), jnp.float32)

    scratch_shapes = [
        pltpu.SMEM((1,), jnp.int32),  # double-buffer slot index
        pltpu.VMEM((2, pages_per_compute_block, page_size, d), k_pages.dtype),
        pltpu.VMEM((2, pages_per_compute_block, page_size, d), v_pages.dtype),
        pltpu.VMEM((2, pages_per_compute_block, page_size), jnp.float32),
        pltpu.VMEM((2, pages_per_compute_block, page_size), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 4)),
        pltpu.VMEM((g8, 128), jnp.float32),  # m
        pltpu.VMEM((g8, 128), jnp.float32),  # l
        pltpu.VMEM((g8, d), jnp.float32),  # acc
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, g, d), lambda b, h, i, *_: (b, h, 0, 0)),
        scratch_shapes=scratch_shapes,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        lengths,
        page_indices.reshape(-1),
        q,
        k_pages,
        v_pages,
        k_scales_pages,
        v_scales_pages,
    )
