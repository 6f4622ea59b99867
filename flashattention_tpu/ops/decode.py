"""Decode attention over a paged KV cache (single query token per request).

The reference has no decode path at all (SURVEY.md section 0: no KV-cache, no
decode); this implements the BASELINE.json north-star serving kernel: causal
decode attention with a *paged* KV cache, optionally int8/fp8-quantized with
per-token scales dequantized in-kernel.

Design (TPU-native):
- **Head-major pages**: the physical page pool is ``(P, KVH, page_size, d)``
  — one logical page holds the tokens' K/V for *all* KV heads.  A single
  BlockSpec fetch then moves ``KVH * page_size * d`` elements, so the grid is
  only (B, pages_per_seq) and each pipeline step's DMA is KVH-times larger
  than a per-head page.  This is what makes decode run near HBM speed of
  light: on v5e the kernel sustains ~75% of peak HBM bandwidth (vs ~20% for
  the per-(b, head, page) grid it replaces — decode is bandwidth-bound, and
  tiny per-step DMAs leave the memory system idle between pipeline steps).
- Quantized payloads (int8/fp8) run bf16 MXU matmuls with the per-token
  scales folded into score columns / p rows.  int8 decode beats bf16 latency
  (less HBM traffic); fp8 is functional everywhere but only fast on chips
  with native fp8 conversions (v6e+) — on v5e Mosaic scalarizes every
  e4m3 conversion route inside pipelined kernels (measured ~8x: direct
  astype, via fp32, and bitcast-from-int8 all ~55us/page-set vs 7us for
  int8), so int8 is the production 8-bit path on this generation.
- The page gather rides the Pallas pipeline itself: page indices arrive via
  scalar prefetch (``PrefetchScalarGridSpec``) and feed the K/V ``BlockSpec``
  index_maps, so Mosaic's automatic pipelining double-buffers the
  non-contiguous page loads.
- Inactive tail blocks (past a request's length) clamp their index_map to the
  last active page: an unchanged block index means the pipeline skips the
  re-fetch, so short sequences don't pay for the padded page table.
- GQA layout: q is (B, KVH, G, d) — all KV heads' query groups are processed
  in one grid step as a KVH-batched (G, page_size) matmul on the MXU.
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

__all__ = [
    "paged_attention",
    "paged_attention_reference",
    "paged_prefill_attention",
    "paged_prefill_attention_batched",
]


def paged_attention_reference(q, k_pages, v_pages, lengths, page_indices, *, scale=1.0):
    """Pure-jnp oracle: gather pages densely, mask by length, attend.

    q: (B, KVH, G, d); k_pages/v_pages: (P, KVH, page_size, d) head-major;
    lengths: (B,); page_indices: (B, pages_per_seq). Returns (B, KVH, G, d).
    """
    b, kvh, g, d = q.shape
    _, _, page_size, _ = k_pages.shape
    pages_per_seq = page_indices.shape[1]
    s_max = pages_per_seq * page_size

    # Gather: (B, pages_per_seq, KVH, page_size, d) -> (B, KVH, S_max, d)
    k = k_pages[page_indices].transpose(0, 2, 1, 3, 4).reshape(b, kvh, s_max, d)
    v = v_pages[page_indices].transpose(0, 2, 1, 3, 4).reshape(b, kvh, s_max, d)

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
    q_ref,  # (1, KVH, G, d)
    k_ref,  # (1, KVH, page_size, d) — the page selected by the index_map
    v_ref,
    ks_ref,  # (1, KVH, page_size) scales or dummy
    vs_ref,
    # outputs
    o_ref,  # (1, KVH, G, d)
    # scratch
    m_scratch,  # (KVH * G8, 128) f32
    l_scratch,
    acc_scratch,  # (KVH * G8, d) f32
    *,
    page_size: int,
    scale: float,
    quantized: bool,
    draft_k: int = 1,
    window: int | None = None,
    logit_softcap: float | None = None,
    mask_value: float = DEFAULT_MASK_VALUE,
):
    b, i = pl.program_id(0), pl.program_id(1)
    length = lengths_ref[b]
    is_active = i * page_size < length
    if window is not None:
        # Sliding window: pages entirely before the earliest attending
        # query row's window are dead (earliest row pos = length - draft_k).
        is_active = is_active & (
            (i + 1) * page_size - 1 >= length - draft_k - window + 1
        )

    if window is not None:
        first_active = jnp.maximum(0, (length - draft_k - window + 1) // page_size)
    else:
        first_active = 0

    @pl.when(is_active)
    def _run():
        @pl.when(i == first_active)
        def _init():
            m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
            l_scratch[...] = jnp.zeros_like(l_scratch)
            acc_scratch[...] = jnp.zeros_like(acc_scratch)

        kvh, g = q_ref.shape[1], q_ref.shape[2]
        g8 = m_scratch.shape[0] // kvh
        d = q_ref.shape[3]
        ps = page_size
        # fp32 caches get exact (HIGHEST, multi-pass) matmuls; everything
        # else runs the MXU natively in bf16 with fp32 accumulation.  The
        # per-token dequant scales of quantized payloads fold into the score
        # columns — a (KVH, 1, ps) row-scale instead of rescaling the K page.
        exact = k_ref.dtype == jnp.float32
        mm_prec = (
            jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
        )
        in_dtype = jnp.float32 if exact else jnp.bfloat16
        q = q_ref[0].astype(in_dtype)  # (KVH, G, d)
        k = k_ref[0].astype(in_dtype)  # (KVH, ps, d)
        # KVH-batched (G, d) x (d, ps) on the MXU.
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=mm_prec,
        )  # (KVH, G, ps)
        if quantized:
            s = s * ks_ref[0][:, None, :]
        if scale != 1.0:
            s = s * scale
        if logit_softcap is not None:
            s = logit_softcap * jnp.tanh(s * (1.0 / logit_softcap))
        if g8 != g:
            # Pad query-group rows to the sublane quantum so scratch updates
            # are full-shape (padded rows carry harmless junk).
            s = jnp.pad(s, ((0, 0), (0, g8 - g), (0, 0)), constant_values=mask_value)
        s = s.reshape(kvh * g8, ps)

        col_ids = i * ps + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        if window is not None:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            dp = jax.lax.rem(jax.lax.rem(row, g8), draft_k) if draft_k > 1 else 0
            row_pos = length - draft_k + dp  # absolute position per row
            win_mask = col_ids > row_pos - window
            s = jnp.where(win_mask, s, mask_value)
        if draft_k > 1:
            # Speculative verification: the within-head rows are (G, k)
            # k-minor — draft position dp's row attends cols
            # <= length - k + dp (lengths INCLUDE all k draft tokens).
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            dp = jax.lax.rem(jax.lax.rem(row, g8), draft_k)
            s = jnp.where(col_ids <= length - draft_k + dp, s, mask_value)
        else:
            s = jnp.where(col_ids < length, s, mask_value)

        m_prev = m_scratch[:, 0:1]
        l_prev = l_scratch[:, 0:1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

        p3 = p.reshape(kvh, g8, ps)
        v = v_ref[0].astype(in_dtype)  # (KVH, ps, d)
        if quantized:
            # Fold the V dequant scale into p: one VPU row-scale instead of
            # dequantizing the whole V page; run the payload matmul in bf16.
            p3 = (p3 * vs_ref[0][:, None, :]).astype(jnp.bfloat16)
        elif not exact:
            p3 = p3.astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            p3, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=mm_prec,
        )  # (KVH, G8, d)
        acc_scratch[...] = acc_scratch[...] * alpha + pv.reshape(kvh * g8, d)

        # Last active page for this request: normalize and emit.
        @pl.when((i + 1) * page_size >= length)
        def _epilogue():
            l = l_scratch[:, 0:1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o = (acc_scratch[...] * l_inv).reshape(kvh, g8, d)[:, :g]
            o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "pages_per_compute_block", "draft_k", "window",
        "logit_softcap", "interpret",
    ),
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
    draft_k: int = 1,
    window: int | None = None,
    logit_softcap: float | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Decode attention over a paged KV cache.

    Args:
      q: (B, KVH, G, d) — current-token queries, grouped by KV head (GQA;
        G = num_q_heads // num_kv_heads).  With ``draft_k`` = k > 1
        (speculative verification), G carries G_heads * k rows laid out
        k-minor: row (g, j) is query-group g at draft position j, attending
        cols <= length - k + j — all k draft tokens verified in ONE pass at
        the decode kernel's HBM bandwidth.
      k_pages, v_pages: (P, KVH, page_size, d) head-major page pool in HBM
        (one page spans all KV heads; see module docstring); quantized
        (int8/fp8) payloads if ``k_scales_pages``/``v_scales_pages`` (each
        (P, KVH, page_size) float32) are given.
      lengths: (B,) int32 — tokens valid per request (q attends to [0, len));
        rows with length 0 produce undefined output (callers mask).
      page_indices: (B, pages_per_seq) int32 — logical->physical page map.

    Returns (B, KVH, G, d).
    """
    del pages_per_compute_block  # one (all-head) page per pipeline step
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, kvh, g, d = q.shape
    total_pages, kvh2, page_size, d2 = k_pages.shape
    if (kvh2, d2) != (kvh, d):
        raise ValueError(f"q/k_pages mismatch: {q.shape} vs {k_pages.shape}")
    if k_pages.shape != v_pages.shape:
        raise ValueError(f"k/v pages mismatch: {k_pages.shape} vs {v_pages.shape}")
    pages_per_seq = page_indices.shape[1]
    quantized = k_scales_pages is not None
    if (k_scales_pages is None) != (v_scales_pages is None):
        raise ValueError("k_scales_pages and v_scales_pages must be given together")
    if quantized:
        want = k_pages.shape[:3]  # (P, KVH, page_size)
        if k_scales_pages.shape != want or v_scales_pages.shape != want:
            raise ValueError(
                f"scale pools must be {want} (head-major, like the payload "
                f"pools), got {k_scales_pages.shape} / {v_scales_pages.shape}"
            )

    grid = (b, pages_per_seq)
    g8 = -(-g // 8) * 8  # pad query-group rows to the fp32 sublane quantum
    pps = pages_per_seq
    ps = page_size

    def page_for(b_, i_, lengths_ref, page_indices_ref):
        # Clamp inactive steps to the active page range: an unchanged block
        # index lets the pipeline skip the (useless) re-fetch — tail pages
        # past the length, and (with a sliding window) head pages before it.
        length = lengths_ref[b_]
        last_active = jnp.maximum(pl.cdiv(length, ps) - 1, 0)
        idx = jnp.minimum(i_, last_active)
        if window is not None:
            first = jnp.maximum(0, (length - draft_k - window + 1) // ps)
            idx = jnp.maximum(idx, jnp.minimum(first, last_active))
        return page_indices_ref[b_ * pps + idx]

    if draft_k > 1 and g % draft_k:
        raise ValueError(f"q group rows ({g}) must be a multiple of draft_k ({draft_k})")
    kernel = functools.partial(
        _paged_kernel,
        page_size=page_size,
        scale=scale,
        quantized=quantized,
        draft_k=draft_k,
        window=window,
        logit_softcap=logit_softcap,
    )

    in_specs = [
        pl.BlockSpec((1, kvh, g, d), lambda b, i, *refs: (b, 0, 0, 0)),  # q
        pl.BlockSpec(
            (1, kvh, ps, d),
            lambda b, i, lr, pr: (page_for(b, i, lr, pr), 0, 0, 0),
        ),  # k page
        pl.BlockSpec(
            (1, kvh, ps, d),
            lambda b, i, lr, pr: (page_for(b, i, lr, pr), 0, 0, 0),
        ),  # v page
        pl.BlockSpec(
            (1, kvh, ps),
            lambda b, i, lr, pr: (
                (page_for(b, i, lr, pr), 0, 0) if quantized else (0, 0, 0)
            ),
        ),  # k scales
        pl.BlockSpec(
            (1, kvh, ps),
            lambda b, i, lr, pr: (
                (page_for(b, i, lr, pr), 0, 0) if quantized else (0, 0, 0)
            ),
        ),  # v scales
    ]
    if quantized:
        k_scales_in = k_scales_pages
        v_scales_in = v_scales_pages
    else:
        k_scales_in = jnp.zeros((1, kvh, ps), jnp.float32)
        v_scales_in = jnp.zeros((1, kvh, ps), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, kvh, g, d), lambda b, i, *refs: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((kvh * g8, 128), jnp.float32),  # m
            pltpu.VMEM((kvh * g8, 128), jnp.float32),  # l
            pltpu.VMEM((kvh * g8, d), jnp.float32),  # acc
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
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


def _paged_prefill_kernel(
    # scalar prefetch
    scal_ref,  # [ctx_len]
    page_indices_ref,  # (pps,)
    # inputs
    q_ref,  # (KVH, bq, d) — folded GQA rows
    k_ref,  # (1, KVH, ps, d) — the page selected by the index map
    v_ref,
    ks_ref,  # (1, KVH, ps) scales or dummy
    vs_ref,
    # outputs
    o_ref,  # (KVH, bq, d)
    # scratch
    m_scratch,  # (KVH * bq, 128) f32
    l_scratch,
    acc_scratch,  # (KVH * bq, d) f32
    *,
    page_size: int,
    chunk: int,  # live tokens per GQA segment (q positions ctx-chunk..ctx-1)
    seg: int,  # padded segment length (bq divides seg)
    scale: float,
    quantized: bool,
    window: int | None = None,
    logit_softcap: float | None = None,
    mask_value: float = DEFAULT_MASK_VALUE,
    batched: bool = False,
):
    if batched:
        # (b, i, j) grid: per-request ctx_len, shared scratch per (b, i)
        # because j is the innermost (sequential) dim.  q/o refs carry a
        # leading singleton batch-block dim.
        b, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        ctx_len = scal_ref[b]
        q_ref, o_ref = q_ref.at[0], o_ref.at[0]
    else:
        i, j = pl.program_id(0), pl.program_id(1)
        ctx_len = scal_ref[0]
    kvh, bq, d = q_ref.shape
    ps = page_size

    # Row r of q block i sits at segment position (i*bq + r) % seg; its
    # absolute position is ctx_len - chunk + segpos (pad rows segpos >= chunk
    # land past the context; their outputs are sliced away by the caller).
    blk_seg0 = (i * bq) % seg  # bq | seg: all rows of a block share a segment
    pos0 = ctx_len - chunk + blk_seg0

    # Skip pages entirely past this block's last row or past the context
    # (and, under a sliding window, before the first row's window).
    run = (j * ps <= pos0 + bq - 1) & (j * ps < ctx_len)
    if window is not None:
        run = run & ((j + 1) * ps - 1 >= pos0 - window + 1)
        first_j = jnp.maximum(0, (pos0 - window + 1) // ps)
    else:
        first_j = 0

    @pl.when(run)
    def _run():
        @pl.when(j == first_j)
        def _init():
            m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
            l_scratch[...] = jnp.zeros_like(l_scratch)
            acc_scratch[...] = jnp.zeros_like(acc_scratch)

        # fp32 pools get exact (HIGHEST) matmuls, everything else runs the
        # MXU natively in bf16 — same policy as _paged_kernel.
        exact = k_ref.dtype == jnp.float32
        mm_prec = (
            jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
        )
        in_dtype = jnp.float32 if exact else jnp.bfloat16
        q = q_ref[...].astype(in_dtype)  # (KVH, bq, d)
        k = k_ref[0].astype(in_dtype)  # (KVH, ps, d)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=mm_prec,
        )  # (KVH, bq, ps)
        if quantized:
            s = s * ks_ref[0][:, None, :]
        if scale != 1.0:
            s = s * scale
        if logit_softcap is not None:
            s = logit_softcap * jnp.tanh(s * (1.0 / logit_softcap))

        row_pos = pos0 + jax.lax.broadcasted_iota(jnp.int32, (bq, ps), 0)
        col = j * ps + jax.lax.broadcasted_iota(jnp.int32, (bq, ps), 1)
        mask = (col <= row_pos) & (col < ctx_len)
        if window is not None:
            mask = mask & (col > row_pos - window)
        s = jnp.where(mask[None], s, mask_value)
        s = s.reshape(kvh * bq, ps)

        m_prev = m_scratch[:, 0:1]
        l_prev = l_scratch[:, 0:1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_scratch[...] = jnp.broadcast_to(
            alpha * l_prev + jnp.sum(p, axis=1, keepdims=True), l_scratch.shape
        )
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)

        p3 = p.reshape(kvh, bq, ps)
        v = v_ref[0].astype(in_dtype)
        if quantized:
            p3 = p3 * vs_ref[0][:, None, :]
        pv = jax.lax.dot_general(
            p3.astype(in_dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=mm_prec,
        )
        acc_scratch[...] = acc_scratch[...] * alpha + pv.reshape(kvh * bq, d)

    # Last page any row of this block attends: min(last live page, page of
    # the block's maximum row position).
    last = jnp.minimum(
        (ctx_len - 1) // ps, jnp.maximum(pos0 + bq - 1, 0) // ps
    )

    @pl.when(j == last)
    def _epilogue():
        l = l_scratch[:, 0:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[...] = (
            (acc_scratch[...] * l_inv).reshape(kvh, bq, d).astype(o_ref.dtype)
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "seg", "scale", "block_q", "window", "logit_softcap",
        "interpret",
    ),
)
def paged_prefill_attention(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    page_indices: jax.Array,
    ctx_len: jax.Array | int,
    *,
    chunk: int,
    seg: int | None = None,
    k_scales_pages: jax.Array | None = None,
    v_scales_pages: jax.Array | None = None,
    scale: float = 1.0,
    block_q: int = 512,
    window: int | None = None,
    logit_softcap: float | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Chunked-prefill attention DIRECTLY over the paged KV pool.

    The round-2 chunked prefill gathered the (capacity-padded) context into a
    dense array before calling the flash kernel — up to ~2x the live bytes
    through HBM per layer.  This kernel streams the pages themselves: the
    page table rides scalar prefetch into the KV index maps (exactly like
    :func:`paged_attention`), pages past the live context or a q block's
    causal extent are skipped (compute AND DMA, traced ``ctx_len``), and the
    head-major pool layout gives the same all-heads-per-DMA behavior that
    makes decode run near HBM speed of light.  Also the building block for
    speculative-decoding verification (multi-token q against a paged cache).

    Args:
      q: (KVH, R, d) — GQA row folding: R = G * seg rows, G query groups per
        KV head, each a ``seg``-row segment whose first ``chunk`` rows are
        real (segment position p => absolute position ctx_len - chunk + p;
        pad rows' outputs are garbage for the caller to slice off).
      k_pages / v_pages: (P, KVH, page_size, d) head-major pool (quantized
        int8/fp8 payloads when the scale pools are given).
      page_indices: (pps,) int32 fixed-capacity table for THIS request.
      ctx_len: live context tokens INCLUDING this chunk (traced ok).
      chunk: live tokens per segment.  seg: padded segment length — PASS IT
        whenever q carries G > 1 group segments (R = G * seg); the default
        (None) treats ALL rows as one segment (G = 1).

    Returns (KVH, R, d).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kvh, rows, d = q.shape
    ps = k_pages.shape[2]
    pps = page_indices.shape[0]
    seg = seg or rows
    if rows % seg:
        raise ValueError(f"q rows ({rows}) must be a multiple of seg ({seg})")
    bq = min(block_q, seg)
    while bq > 8 and seg % bq:
        bq -= 8
    if bq <= 0 or seg % bq:
        raise ValueError(
            f"seg ({seg}) needs a divisor <= block_q ({block_q}) that is a "
            "multiple of 8; pad the segment length"
        )
    quantized = k_scales_pages is not None

    def page_for(i, j, scal, pi):
        last_live = jnp.maximum(pl.cdiv(scal[0], ps) - 1, 0)
        pos0 = scal[0] - chunk + (i * bq) % seg
        # Clamp to the q block's causal extent too (not just the live range):
        # pages past its last row repeat an index, so their DMA is elided —
        # without this, early q blocks of a large chunk stream ~chunk^2/(2*bq)
        # tokens of dead K/V per layer (round-2 review finding).
        last_needed = jnp.clip((pos0 + bq - 1) // ps, 0, last_live)
        j = jnp.minimum(j, last_needed)
        if window is not None:
            first = jnp.maximum(0, (pos0 - window + 1) // ps)
            j = jnp.maximum(j, jnp.minimum(first, last_needed))
        return pi[j]

    in_specs = [
        pl.BlockSpec((kvh, bq, d), lambda i, j, s_, pi: (0, i, 0)),
        pl.BlockSpec(
            (1, kvh, ps, d), lambda i, j, s_, pi: (page_for(i, j, s_, pi), 0, 0, 0)
        ),
        pl.BlockSpec(
            (1, kvh, ps, d), lambda i, j, s_, pi: (page_for(i, j, s_, pi), 0, 0, 0)
        ),
        pl.BlockSpec(
            (1, kvh, ps),
            lambda i, j, s_, pi: (
                (page_for(i, j, s_, pi), 0, 0) if quantized else (0, 0, 0)
            ),
        ),
        pl.BlockSpec(
            (1, kvh, ps),
            lambda i, j, s_, pi: (
                (page_for(i, j, s_, pi), 0, 0) if quantized else (0, 0, 0)
            ),
        ),
    ]
    if quantized:
        ks_in, vs_in = k_scales_pages, v_scales_pages
    else:
        ks_in = jnp.zeros((1, kvh, ps), jnp.float32)
        vs_in = jnp.zeros((1, kvh, ps), jnp.float32)

    kernel = functools.partial(
        _paged_prefill_kernel,
        page_size=ps,
        chunk=chunk,
        seg=seg,
        scale=scale,
        quantized=quantized,
        window=window,
        logit_softcap=logit_softcap,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rows // bq, pps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((kvh, bq, d), lambda i, j, s_, pi: (0, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((kvh * bq, 128), jnp.float32),
                pltpu.VMEM((kvh * bq, 128), jnp.float32),
                pltpu.VMEM((kvh * bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((kvh, rows, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(ctx_len, jnp.int32).reshape(1), page_indices, q, k_pages,
      v_pages, ks_in, vs_in)


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "seg", "scale", "block_q", "window", "logit_softcap",
        "interpret",
    ),
)
def paged_prefill_attention_batched(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    page_indices: jax.Array,
    ctx_lens: jax.Array,
    *,
    chunk: int,
    seg: int | None = None,
    k_scales_pages: jax.Array | None = None,
    v_scales_pages: jax.Array | None = None,
    scale: float = 1.0,
    block_q: int = 512,
    window: int | None = None,
    logit_softcap: float | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Batched chunked-prefill attention over the paged KV pool (round 3).

    Many requests prefill one chunk each in ONE kernel dispatch: the grid
    grows a leading batch dim, ``page_indices`` is (B, pps) and ``ctx_lens``
    is (B,) — both ride scalar prefetch, so every request keeps its own
    causal anchor (``ctx_lens[b] - chunk``) and page table while sharing the
    compiled program.  On a tunneled host this also divides the per-dispatch
    round-trip cost by B; on-device it deepens the grid (B x rows/bq x pps
    steps), keeping the pipeline out of ramp-up for small chunks — the same
    lever as the flash kernel's ``block_h``.

    Args are :func:`paged_prefill_attention`'s with a leading batch dim on
    ``q`` (B, KVH, R, d) and per-request tables/lengths.  A dummy row (batch
    padding) is ``ctx_lens[b] = 0``: every page is skipped and its output
    block is left unwritten (garbage for the caller to drop).

    Returns (B, KVH, R, d).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, kvh, rows, d = q.shape
    ps = k_pages.shape[2]
    pps = page_indices.shape[1]
    seg = seg or rows
    if rows % seg:
        raise ValueError(f"q rows ({rows}) must be a multiple of seg ({seg})")
    bq = min(block_q, seg)
    while bq > 8 and seg % bq:
        bq -= 8
    if bq <= 0 or seg % bq:
        raise ValueError(
            f"seg ({seg}) needs a divisor <= block_q ({block_q}) that is a "
            "multiple of 8; pad the segment length"
        )
    quantized = k_scales_pages is not None

    def page_for(bb, i, j, scal, pi):
        ctx = scal[bb]
        last_live = jnp.maximum(pl.cdiv(ctx, ps) - 1, 0)
        pos0 = ctx - chunk + (i * bq) % seg
        last_needed = jnp.clip((pos0 + bq - 1) // ps, 0, last_live)
        j = jnp.minimum(j, last_needed)
        if window is not None:
            first = jnp.maximum(0, (pos0 - window + 1) // ps)
            j = jnp.maximum(j, jnp.minimum(first, last_needed))
        return pi[bb, j]

    in_specs = [
        pl.BlockSpec((1, kvh, bq, d), lambda bb, i, j, s_, pi: (bb, 0, i, 0)),
        pl.BlockSpec(
            (1, kvh, ps, d),
            lambda bb, i, j, s_, pi: (page_for(bb, i, j, s_, pi), 0, 0, 0),
        ),
        pl.BlockSpec(
            (1, kvh, ps, d),
            lambda bb, i, j, s_, pi: (page_for(bb, i, j, s_, pi), 0, 0, 0),
        ),
        pl.BlockSpec(
            (1, kvh, ps),
            lambda bb, i, j, s_, pi: (
                (page_for(bb, i, j, s_, pi), 0, 0) if quantized else (0, 0, 0)
            ),
        ),
        pl.BlockSpec(
            (1, kvh, ps),
            lambda bb, i, j, s_, pi: (
                (page_for(bb, i, j, s_, pi), 0, 0) if quantized else (0, 0, 0)
            ),
        ),
    ]
    if quantized:
        ks_in, vs_in = k_scales_pages, v_scales_pages
    else:
        ks_in = jnp.zeros((1, kvh, ps), jnp.float32)
        vs_in = jnp.zeros((1, kvh, ps), jnp.float32)

    kernel = functools.partial(
        _paged_prefill_kernel,
        page_size=ps,
        chunk=chunk,
        seg=seg,
        scale=scale,
        quantized=quantized,
        window=window,
        logit_softcap=logit_softcap,
        batched=True,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, rows // bq, pps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, kvh, bq, d), lambda bb, i, j, s_, pi: (bb, 0, i, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((kvh * bq, 128), jnp.float32),
                pltpu.VMEM((kvh * bq, 128), jnp.float32),
                pltpu.VMEM((kvh * bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, kvh, rows, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(ctx_lens, jnp.int32), page_indices, q, k_pages,
      v_pages, ks_in, vs_in)
