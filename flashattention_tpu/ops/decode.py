"""Decode attention over a paged KV cache (single query token per request).

The reference has no decode path at all (SURVEY.md section 0: no KV-cache, no
decode); this implements the BASELINE.json north-star serving kernel: causal
decode attention with a *paged* KV cache, optionally int8/fp8-quantized with
per-token scales dequantized in-kernel.

Design (TPU-native):
- The page gather rides the Pallas pipeline itself: page indices arrive via
  scalar prefetch (``PrefetchScalarGridSpec``) and feed the K/V ``BlockSpec``
  index_maps, so Mosaic's automatic pipelining double-buffers the
  non-contiguous page loads (manual per-page DMA hits lane-alignment limits
  for head_dim < 128; BlockSpec blocks may use any head dim).
- Inactive tail blocks (past a request's length) clamp their index_map to the
  last active page: an unchanged block index means the pipeline skips the
  re-fetch, so short sequences don't pay for the padded page table.
- GQA layout: q is (B, KVH, G, d) — the G query heads sharing one KV head are
  processed together, turning the decode matvec into a (G, page_size) matmul.
- Online softmax with (m, l, acc) in VMEM scratch across a request's pages,
  the same combiner as the prefill kernel (``ops/flash.py``).
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
    # inputs (pipelined blocks)
    q_ref,  # (1, 1, G, d)
    k_ref,  # (1, 1, page_size, d) — the page selected by the index_map
    v_ref,
    ks_ref,  # (1, 1, page_size, 1) scales or dummy
    vs_ref,
    # outputs
    o_ref,  # (1, 1, G, d)
    # scratch
    m_scratch,  # (G8, 128) f32
    l_scratch,
    acc_scratch,  # (G8, d) f32
    *,
    page_size: int,
    scale: float,
    quantized: bool,
    mask_value: float = DEFAULT_MASK_VALUE,
):
    b, i = pl.program_id(0), pl.program_id(2)
    length = lengths_ref[b]
    is_active = i * page_size < length

    @pl.when(is_active)
    def _run():
        @pl.when(i == 0)
        def _init():
            m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
            l_scratch[...] = jnp.zeros_like(l_scratch)
            acc_scratch[...] = jnp.zeros_like(acc_scratch)

        g = q_ref.shape[2]
        g8 = m_scratch.shape[0]
        q = q_ref[0, 0].astype(jnp.float32)  # (G, d)
        k = k_ref[0, 0].astype(jnp.float32)  # (ps, d)
        if quantized:
            k = k * ks_ref[0, 0]  # (ps, 1) per-token dequant
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (G, ps)
        if scale != 1.0:
            s = s * scale

        col_ids = i * page_size + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col_ids < length, s, mask_value)
        if g8 != g:
            # Pad query-group rows to the sublane quantum so scratch updates
            # are full-shape (padded rows carry harmless junk).
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

        v = v_ref[0, 0].astype(jnp.float32)  # (ps, d)
        if quantized:
            v = v * vs_ref[0, 0]
        pv = jax.lax.dot(p, v, preferred_element_type=jnp.float32)  # (G8, d)
        acc_scratch[...] = acc_scratch[...] * alpha + pv

        # Last active page for this (b, h): normalize and emit.
        @pl.when((i + 1) * page_size >= length)
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
    pages_per_compute_block: int = 1,  # compat; compute block == one page
    interpret: bool | None = None,
) -> jax.Array:
    """Decode attention over a paged KV cache.

    Args:
      q: (B, KVH, G, d) — current-token queries, grouped by KV head (GQA;
        G = num_q_heads // num_kv_heads).
      k_pages, v_pages: (KVH, P, page_size, d) page pool in HBM; quantized
        (int8/fp8) payloads if ``k_scales_pages``/``v_scales_pages`` (each
        (KVH, P, page_size) float32) are given.
      lengths: (B,) int32 — tokens valid per request (q attends to [0, len));
        rows with length 0 produce undefined output (callers mask).
      page_indices: (B, pages_per_seq) int32 — logical->physical page map.

    Returns (B, KVH, G, d).
    """
    del pages_per_compute_block  # one page per pipeline step by design
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, kvh, g, d = q.shape
    kvh2, total_pages, page_size, d2 = k_pages.shape
    if (kvh2, d2) != (kvh, d):
        raise ValueError(f"q/k_pages mismatch: {q.shape} vs {k_pages.shape}")
    if k_pages.shape != v_pages.shape:
        raise ValueError(f"k/v pages mismatch: {k_pages.shape} vs {v_pages.shape}")
    pages_per_seq = page_indices.shape[1]
    quantized = k_scales_pages is not None
    if quantized and v_scales_pages is None:
        raise ValueError("k_scales_pages given without v_scales_pages")

    grid = (b, kvh, pages_per_seq)
    g8 = -(-g // 8) * 8  # pad query-group rows to the fp32 sublane quantum
    pps = pages_per_seq
    ps = page_size

    def page_for(b_, i_, lengths_ref, page_indices_ref):
        # Clamp inactive tail steps to the last active page: the unchanged
        # block index lets the pipeline skip the (useless) re-fetch.
        length = lengths_ref[b_]
        last_active = jnp.maximum(pl.cdiv(length, ps) - 1, 0)
        idx = jnp.minimum(i_, last_active)
        return page_indices_ref[b_ * pps + idx]

    kernel = functools.partial(
        _paged_kernel,
        page_size=page_size,
        scale=scale,
        quantized=quantized,
    )

    in_specs = [
        pl.BlockSpec((1, 1, g, d), lambda b, h, i, *refs: (b, h, 0, 0)),  # q
        pl.BlockSpec(
            (1, 1, ps, d),
            lambda b, h, i, lr, pr: (h, page_for(b, i, lr, pr), 0, 0),
        ),  # k page
        pl.BlockSpec(
            (1, 1, ps, d),
            lambda b, h, i, lr, pr: (h, page_for(b, i, lr, pr), 0, 0),
        ),  # v page
        pl.BlockSpec(
            (1, 1, ps, 1),
            lambda b, h, i, lr, pr: (
                (h, page_for(b, i, lr, pr), 0, 0) if quantized else (0, 0, 0, 0)
            ),
        ),  # k scales
        pl.BlockSpec(
            (1, 1, ps, 1),
            lambda b, h, i, lr, pr: (
                (h, page_for(b, i, lr, pr), 0, 0) if quantized else (0, 0, 0, 0)
            ),
        ),  # v scales
    ]
    if quantized:
        k_scales_in = k_scales_pages[..., None]
        v_scales_in = v_scales_pages[..., None]
    else:
        k_scales_in = jnp.zeros((1, 1, ps, 1), jnp.float32)
        v_scales_in = jnp.zeros((1, 1, ps, 1), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, g, d), lambda b, h, i, *refs: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((g8, 128), jnp.float32),  # m
            pltpu.VMEM((g8, 128), jnp.float32),  # l
            pltpu.VMEM((g8, d), jnp.float32),  # acc
        ],
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
        k_scales_in,
        v_scales_in,
    )
