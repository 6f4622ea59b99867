"""Flash-attention backward pass: dQ and dK/dV Pallas kernels + custom_vjp.

The reference is forward-only (SURVEY.md section 0: "no backward pass");
training support is part of generalizing it into a framework.  Standard
flash backward from the saved softmax statistics (l, m) — the same residuals
the forward already exports for ring attention:

With LSE_i = m_i + log l_i and P_ij = exp(scale * q_i . k_j - LSE_i):
  dV_j = sum_i P_ij dO_i
  dP_ij = dO_i . V_j
  dS_ij = P_ij * (dP_ij - D_i) * scale,   D_i = dO_i . O_i
  dQ_i = sum_j dS_ij K_j
  dK_j = sum_i dS_ij Q_i

Two kernels with opposite iteration orders (dQ accumulates over KV blocks per
Q block; dK/dV accumulate over Q blocks per KV block), mirroring the
structure of JAX's reference implementation but built on this repo's forward
conventions (q_offset decode alignment, reference-parity scale semantics).

``attention_vjp`` is the differentiable entry: forward = the fused forward
kernel saving (o, lse); backward = these kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattention_tpu.ops.flash import (
    NUM_LANES,
    BlockSizes,
    _dot_g,
    _pack2,
    dropout_keep_mask,
    flash_attention,
    resolve_precision,
    resolve_q_seq_blocks,
)
from flashattention_tpu.ops.reference import DEFAULT_MASK_VALUE

__all__ = ["flash_attention_bwd", "attention_vjp"]


# ── lane-packed fp32 emulation (round 3; VERDICT #5) ─────────────────────────
# The forward's packed schedule (ops.flash:~727): fp32 operands stream as
# [hi|lo] bf16 pairs (same HBM bytes), so a d-contraction runs at full MXU
# width in 2 passes (4 at d<=32 collapse into 1 via the 4-group layout)
# instead of bf16_3x's 3 — and keeps the lo*lo term, so it is MORE accurate.
# These helpers port it to the backward's five block matmuls.


def _packed_nt(a, b, head_dim):
    """Full-product a . b^T for [hi|lo]-packed operands (contracts 2d lanes).

    a: (m, 2d), b: (n, 2d) bf16 packed.  a@b^T gives ah.bh + al.bl; the
    swapped copy pairs each half against the other's opposite half
    (ah.bl + al.bh) — the sum is the exact 4-term product.  At 4d <= 128
    both passes fuse into ONE full-width contraction.
    """
    dims = (((1,), (1,)), ((), ()))
    b_swap = jnp.concatenate([b[:, head_dim:], b[:, :head_dim]], axis=1)
    if 4 * head_dim <= NUM_LANES:
        a2 = jnp.concatenate([a, a], axis=1)
        return jax.lax.dot_general(
            a2,
            jnp.concatenate([b, b_swap], axis=1),
            dims,
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(a, b_swap, dims, preferred_element_type=jnp.float32)


def _packed_fold(x, packed, dims, head_dim):
    """fp32 score-tile x against a packed operand; fold the [hi|lo] halves.

    x is split (hi, lo) on the fly (it is freshly computed, not streamed);
    each half contracts against the full packed operand in one pass, and the
    two output lane-halves sum to the exact product — 2 full-width passes
    instead of 3 half-width ones.
    """
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        xh, packed, dims, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(xl, packed, dims, preferred_element_type=jnp.float32)
    return out[..., :head_dim] + out[..., head_dim:]


def _csplit(f, a, b, ca, cb, n):
    """Split a contraction into n independent partial-sum chains.

    The forward's pv_split finding (measurements/D128_CEILING.md) applies to
    the backward's thin-N accumulations too: dQ/dK/dV outputs are a single
    128-lane tile at d <= 128, so the MXU serializes the contraction's
    accumulation passes into one dependency chain.  Splitting contraction
    axis ``ca`` of ``a`` / ``cb`` of ``b`` into ``n`` chunks gives Mosaic
    interleavable chains at the cost of (n-1) VPU tile adds.
    """
    length = a.shape[ca]
    if n == 1 or length % n:
        return f(a, b)
    c = length // n

    def _sl(x, ax, i):
        idx = [slice(None)] * x.ndim
        idx[ax] = slice(i * c, (i + 1) * c)
        return x[tuple(idx)]

    out = f(_sl(a, ca, 0), _sl(b, cb, 0))
    for i in range(1, n):
        out = out + f(_sl(a, ca, i), _sl(b, cb, i))
    return out


def _masks(s_shape, q_start, kv_start, causal, kv_len, q_offset, window=None,
           bm_mask_fn=None):
    mask = None
    if causal:
        row_ids = q_offset + q_start + jax.lax.broadcasted_iota(jnp.int32, s_shape, 0)
        col_ids = kv_start + jax.lax.broadcasted_iota(jnp.int32, s_shape, 1)
        mask = col_ids <= row_ids
        if window is not None:
            mask = mask & (col_ids > row_ids - window)
    if bm_mask_fn is not None:
        # Block-sparse pattern (round 4): the SAME position predicate the
        # forward pair grid uses, re-evaluated on iota tiles (ops.flash
        # BlockMask); q_offset is a static 0 whenever block_mask is set.
        row_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, s_shape, 0)
        col_ids = kv_start + jax.lax.broadcasted_iota(jnp.int32, s_shape, 1)
        bm = bm_mask_fn(row_ids, col_ids)
        mask = bm if mask is None else (mask & bm)
    if kv_len is not None:
        col_ids = kv_start + jax.lax.broadcasted_iota(jnp.int32, s_shape, 1)
        len_mask = col_ids < kv_len
        mask = len_mask if mask is None else (mask & len_mask)
    return mask


def _dq_kernel(
    qoff_ref,
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    di_ref,
    *rest,
    causal,
    scale,
    kv_len,
    num_kv_blocks,
    precision,
    q_seq_blocks,
    window=None,
    logit_softcap=None,
    packed=False,
    head_dim=None,
    dropout_rate=None,
    has_segments=False,
    bm_mask_fn=None,
    bm_element_mask=False,
    bm_num_kv=None,
    acc_split=1,
):
    rest = list(rest)
    if has_segments:
        seg_q_ref, seg_kv_ref = rest.pop(0), rest.pop(0)
    dq_ref, dq_scratch = rest
    q_offset = qoff_ref[0]  # prefetched traced scalar (one program, any offset)
    bh_idx = pl.program_id(0)  # hoisted: program_id is illegal inside pl.when
    q_idx, kv_idx = pl.program_id(1), pl.program_id(2)
    # GQA row folding (see ops.flash): the causal *position* of a block is its
    # index within the group segment; init/epilogue keep the raw grid index.
    q_pos = jax.lax.rem(q_idx, q_seq_blocks) if q_seq_blocks is not None else q_idx
    block_q = q_ref.shape[1]
    block_kv = k_ref.shape[1]

    @pl.when(kv_idx == 0)
    def _init():
        dq_scratch[...] = jnp.zeros_like(dq_scratch)

    if causal:
        should_run = (q_offset + (q_pos + 1) * block_q - 1) >= (kv_idx * block_kv)
        if window is not None:
            should_run = should_run & (
                ((kv_idx + 1) * block_kv - 1)
                >= (q_offset + q_pos * block_q - window + 1)
            )
    elif bm_num_kv is not None:
        # Block-sparse (round 4): liveness table rides the scalar-prefetch
        # vector after [q_offset, dropout_seed]; dead blocks skip compute.
        should_run = qoff_ref[2 + q_idx * bm_num_kv + kv_idx] > 0
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0] if packed else do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, None]  # (bq, 1)
        di = di_ref[0, 0][:, None]

        if packed:
            s = _packed_nt(q, k, head_dim)
        else:
            s = _dot_g(q, k, (((1,), (1,)), ((), ())), precision)
        if scale != 1.0:
            s = s * scale
        cap_factor = None
        if logit_softcap is not None:
            s = logit_softcap * jnp.tanh(s * (1.0 / logit_softcap))
            cap_factor = 1.0 - (s * (1.0 / logit_softcap)) ** 2
        mask = _masks(s.shape, q_pos * block_q, kv_idx * block_kv, causal,
                      kv_len, q_offset, window,
                      bm_mask_fn if bm_element_mask else None)
        if has_segments:
            # Packed sequences: (bq, 1) == (1, bkv) broadcast compare; p is
            # zero at masked positions, so dV/dS need no extra masking.
            seg_m = seg_q_ref[0] == seg_kv_ref[0]
            mask = seg_m if mask is None else (mask & seg_m)
        if mask is not None:
            s = s + jnp.where(mask, 0.0, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse)  # (bq, bkv)

        if packed:
            dp = _packed_nt(do, v, head_dim)
        else:
            dp = _dot_g(do, v, (((1,), (1,)), ((), ())), precision)
        if dropout_rate is not None:
            # dP = (dO V^T) o M / (1-r): regenerate the forward's keep mask
            # from (seed, RAW grid coords).  The D_i = dO.O trick survives
            # dropout unchanged (sum_j P dP = dO . (Z V) = dO . O).
            keep = dropout_keep_mask(
                qoff_ref[1], bh_idx, q_idx * block_q,
                kv_idx * block_kv, p.shape, dropout_rate,
            )
            dp = jnp.where(keep, dp, 0.0) * (1.0 / (1.0 - dropout_rate))
        ds = p * (dp - di) * scale
        if cap_factor is not None:
            ds = ds * cap_factor
        # dQ_i = sum_j dS_ij K_j: a thin-N (bq, d) output — split the bkv
        # contraction into independent chains (see _csplit).
        dims_dq = (((1,), (0,)), ((), ()))
        if packed:
            dq_scratch[...] += _csplit(
                lambda a, b: _packed_fold(a, b, dims_dq, head_dim),
                ds, k, 1, 0, acc_split,
            )
        else:
            dq_scratch[...] += _csplit(
                lambda a, b: _dot_g(a, b, dims_dq, precision),
                ds, k, 1, 0, acc_split,
            )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _epilogue():
        dq_ref[0] = dq_scratch[...].astype(dq_ref.dtype)


def _dkv_kernel(
    qoff_ref,
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    di_ref,
    *rest,
    causal,
    scale,
    kv_len,
    num_q_blocks,
    precision,
    q_seq_blocks,
    window=None,
    logit_softcap=None,
    packed=False,
    head_dim=None,
    dropout_rate=None,
    has_segments=False,
    bm_mask_fn=None,
    bm_element_mask=False,
    bm_num_kv=None,
    acc_split=1,
):
    rest = list(rest)
    if has_segments:
        seg_q_ref, seg_kv_ref = rest.pop(0), rest.pop(0)
    dk_ref, dv_ref, dk_scratch, dv_scratch = rest
    q_offset = qoff_ref[0]  # prefetched traced scalar (one program, any offset)
    bh_idx = pl.program_id(0)  # hoisted: program_id is illegal inside pl.when
    kv_idx, q_idx = pl.program_id(1), pl.program_id(2)
    q_pos = jax.lax.rem(q_idx, q_seq_blocks) if q_seq_blocks is not None else q_idx
    block_q = q_ref.shape[1]
    block_kv = k_ref.shape[1]

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[...] = jnp.zeros_like(dk_scratch)
        dv_scratch[...] = jnp.zeros_like(dv_scratch)

    if causal:
        # Q blocks entirely above the diagonal contribute nothing to this KV
        # block (their masked P is zero).
        should_run = (q_offset + (q_pos + 1) * block_q - 1) >= (kv_idx * block_kv)
    elif bm_num_kv is not None:
        # Same flattened (q, kv) liveness table as _dq_kernel.
        should_run = qoff_ref[2 + q_idx * bm_num_kv + kv_idx] > 0
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0] if packed else do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, None]
        di = di_ref[0, 0][:, None]

        if packed:
            s = _packed_nt(q, k, head_dim)
        else:
            s = _dot_g(q, k, (((1,), (1,)), ((), ())), precision)
        if scale != 1.0:
            s = s * scale
        cap_factor = None
        if logit_softcap is not None:
            s = logit_softcap * jnp.tanh(s * (1.0 / logit_softcap))
            cap_factor = 1.0 - (s * (1.0 / logit_softcap)) ** 2
        mask = _masks(s.shape, q_pos * block_q, kv_idx * block_kv, causal,
                      kv_len, q_offset, window,
                      bm_mask_fn if bm_element_mask else None)
        if has_segments:
            # Packed sequences: (bq, 1) == (1, bkv) broadcast compare; p is
            # zero at masked positions, so dV/dS need no extra masking.
            seg_m = seg_q_ref[0] == seg_kv_ref[0]
            mask = seg_m if mask is None else (mask & seg_m)
        if mask is not None:
            s = s + jnp.where(mask, 0.0, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse)  # (bq, bkv)

        p_z = p
        if dropout_rate is not None:
            # Z = P o M/(1-r): dV sums the DROPPED weights; dP gets the same
            # mask.  Coordinates match the forward (RAW q grid index).
            keep = dropout_keep_mask(
                qoff_ref[1], bh_idx, q_idx * block_q,
                kv_idx * block_kv, p.shape, dropout_rate,
            )
            inv = 1.0 / (1.0 - dropout_rate)
            p_z = jnp.where(keep, p, 0.0) * inv

        # dV_j = sum_i Z_ij dO_i  -> Z^T @ dO: thin-N (bkv, d) output — split
        # the bq contraction into independent chains (see _csplit).
        dims_t = (((0,), (0,)), ((), ()))
        if packed:
            dv_scratch[...] += _csplit(
                lambda a, b: _packed_fold(a, b, dims_t, head_dim),
                p_z, do, 0, 0, acc_split,
            )
            dp = _packed_nt(do, v, head_dim)
        else:
            dv_scratch[...] += _csplit(
                lambda a, b: _dot_g(a, b, dims_t, precision),
                p_z, do, 0, 0, acc_split,
            )
            dp = _dot_g(do, v, (((1,), (1,)), ((), ())), precision)
        if dropout_rate is not None:
            dp = jnp.where(keep, dp, 0.0) * inv
        ds = p * (dp - di) * scale  # (bq, bkv)
        if cap_factor is not None:
            ds = ds * cap_factor
        # dK_j = sum_i dS_ij Q_i  -> dS^T @ Q (same thin-N split as dV)
        if packed:
            dk_scratch[...] += _csplit(
                lambda a, b: _packed_fold(a, b, dims_t, head_dim),
                ds, q, 0, 0, acc_split,
            )
        else:
            dk_scratch[...] += _csplit(
                lambda a, b: _dot_g(a, b, dims_t, precision),
                ds, q, 0, 0, acc_split,
            )

    @pl.when(q_idx == num_q_blocks - 1)
    def _epilogue():
        dk_ref[0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[...].astype(dv_ref.dtype)


def _fused_bwd_kernel(
    qoff_ref,
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    di_ref,
    dq_ref,
    dk_ref,
    dv_ref,
    dq_all,
    dk_scratch,
    dv_scratch,
    *,
    causal,
    scale,
    kv_len,
    num_q_blocks,
    num_kv_blocks,
    precision,
    q_seq_blocks,
    window=None,
    logit_softcap=None,
    dropout_rate=None,
):
    """Single-pass fused backward: grid (bh, num_kv, num_q), kv-major.

    Computes s/p/dp/ds ONCE per (q, kv) block pair and feeds all three
    gradients from it: dk/dv accumulate in per-KV-block scratch (flushed per
    kv row), dq accumulates in a full-sequence VMEM scratch (flushed once per
    batch*head).  vs the two-pass scheme this saves ~2/7 of the matmul work
    (5 instead of 7 block matmuls) and streams q/k/v/do from HBM once instead
    of twice (round 2; VERDICT #7).
    """
    q_offset = qoff_ref[0]
    bh_idx = pl.program_id(0)  # hoisted: program_id is illegal inside pl.when
    kv_idx, q_raw = pl.program_id(1), pl.program_id(2)
    q_pos = jax.lax.rem(q_raw, q_seq_blocks) if q_seq_blocks is not None else q_raw
    block_q = q_ref.shape[1]
    block_kv = k_ref.shape[1]

    @pl.when((kv_idx == 0) & (q_raw == 0))
    def _init_dq():
        dq_all[...] = jnp.zeros_like(dq_all)

    @pl.when(q_raw == 0)
    def _init_kv():
        dk_scratch[...] = jnp.zeros_like(dk_scratch)
        dv_scratch[...] = jnp.zeros_like(dv_scratch)

    if causal:
        should_run = (q_offset + (q_pos + 1) * block_q - 1) >= (kv_idx * block_kv)
        if window is not None:
            should_run = should_run & (
                ((kv_idx + 1) * block_kv - 1)
                >= (q_offset + q_pos * block_q - window + 1)
            )
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, None]
        di = di_ref[0, 0][:, None]

        s = _dot_g(q, k, (((1,), (1,)), ((), ())), precision)
        if scale != 1.0:
            s = s * scale
        cap_factor = None
        if logit_softcap is not None:
            s = logit_softcap * jnp.tanh(s * (1.0 / logit_softcap))
            cap_factor = 1.0 - (s * (1.0 / logit_softcap)) ** 2
        mask = _masks(
            s.shape, q_pos * block_q, kv_idx * block_kv, causal, kv_len,
            q_offset, window,
        )
        if mask is not None:
            s = s + jnp.where(mask, 0.0, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse)  # (bq, bkv)

        p_z = p
        if dropout_rate is not None:
            keep = dropout_keep_mask(
                qoff_ref[1], bh_idx, q_raw * block_q,
                kv_idx * block_kv, p.shape, dropout_rate,
            )
            inv = 1.0 / (1.0 - dropout_rate)
            p_z = jnp.where(keep, p, 0.0) * inv

        # dV_j += Z^T dO ; dP = (dO V^T) o M/(1-r) ; dS = P (dP - D) scale
        dv_scratch[...] += _dot_g(p_z, do, (((0,), (0,)), ((), ())), precision)
        dp = _dot_g(do, v, (((1,), (1,)), ((), ())), precision)
        if dropout_rate is not None:
            dp = jnp.where(keep, dp, 0.0) * inv
        ds = p * (dp - di) * scale
        if cap_factor is not None:
            ds = ds * cap_factor
        dk_scratch[...] += _dot_g(ds, q, (((0,), (0,)), ((), ())), precision)
        dq_all[pl.ds(q_raw * block_q, block_q), :] += _dot_g(
            ds, k, (((1,), (0,)), ((), ())), precision
        )

    @pl.when(q_raw == num_q_blocks - 1)
    def _flush_kv():
        dk_ref[0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[...].astype(dv_ref.dtype)

    @pl.when((kv_idx == num_kv_blocks - 1) & (q_raw == num_q_blocks - 1))
    def _flush_dq():
        dq_ref[0] = dq_all[...].astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "scale", "block_sizes", "kv_len", "precision",
        "q_seq_len", "interpret", "fused", "window", "logit_softcap",
        "dropout_rate", "block_mask",
    ),
)
def flash_attention_bwd(
    q,
    k,
    v,
    o,
    lse,
    do,
    *,
    causal=False,
    scale=1.0,
    block_sizes: BlockSizes | None = None,
    kv_len=None,
    q_offset=0,  # int or traced int32 scalar (scalar-prefetched)
    precision: str | None = None,
    q_seq_len: int | None = None,
    interpret=None,
    fused: bool | None = None,
    window: int | None = None,
    logit_softcap: float | None = None,
    dropout_rate: float | None = None,
    dropout_seed=0,
    q_segment_ids=None,
    kv_segment_ids=None,
    block_mask=None,
):
    """dQ, dK, dV from saved output + logsumexp residuals.

    q, do, o: (BH, S_q, d); k, v: (BH, S_kv, d); lse: (BH, S_q) float32 with
    lse = m + log(l) in the forward's statistics.

    ``fused`` runs the one-pass kv-major kernel (:func:`_fused_bwd_kernel`):
    5 block matmuls and one HBM stream of q/k/v/do instead of the two-pass
    scheme's 7 and two.  **Default since round 5** wherever it applies (no
    segment ids / block_mask, dQ scratch fits VMEM): the honest A/B
    (measurements/probe_fused_bwd.txt) has it winning at every
    (dtype, head_dim) — bf16 d=64 1.26 vs 2.05 ms, fp32 d=128 4.42 vs
    6.38.  The old "two-pass faster (1.50 vs 0.93)" verdict compared
    against a DCE-corrupted two-pass timing (the dq kernel alone).
    ``fused=False`` forces the two-pass kernels (needed for segment ids
    and block-sparse masks).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if dropout_rate == 0.0:
        dropout_rate = None  # rate 0 is the identity, not an error
    bh, s_q, d = q.shape
    s_kv = k.shape[1]
    precision = resolve_precision(precision, q.dtype)
    bm = block_mask is not None
    if bm:
        # Block-sparse backward (round 4): rectangular grid + a prefetched
        # per-(q, kv)-block liveness table — dead blocks skip compute (their
        # DMA is not elided; the fwd pair grid owns that optimization), and
        # partial blocks re-apply the mask_fn exactly like the forward.
        if causal or window is not None or q_seq_len is not None:
            raise ValueError(
                "block_mask is mutually exclusive with causal/window/"
                "q_seq_len in the backward too — encode them in the mask_fn"
            )
        if (block_mask.s_q, block_mask.s_kv) != (s_q, s_kv):
            raise ValueError(
                f"block_mask built for ({block_mask.s_q}, {block_mask.s_kv}) "
                f"but inputs are ({s_q}, {s_kv})"
            )
        if block_sizes is None:
            block_sizes = BlockSizes(
                block_mask.block_q, block_mask.block_kv, block_mask.block_kv
            )
        elif (
            block_sizes.block_q != block_mask.block_q
            or block_sizes.block_kv != block_mask.block_kv
        ):
            raise ValueError(
                f"block_sizes {block_sizes} disagree with block_mask blocks "
                f"({block_mask.block_q}, {block_mask.block_kv})"
            )
    # One-pass fused vs two-pass (round 5; probe_fused_bwd.txt): the fused
    # kernel WINS at every (dtype, head_dim) once timed honestly —
    #   bf16 d=64:  1.255 vs 2.047 ms   bf16 d=128: 1.824 vs 2.416
    #   fp32 d=64:  3.775 vs 4.400      fp32 d=128: 4.420 vs 6.382
    # — 5 block matmuls and one HBM stream instead of 7 and two.  The old
    # "two-pass faster" verdict compared the fused kernel against a
    # DCE-corrupted two-pass number (dq kernel alone).  Default: fused
    # wherever it applies (no segment ids / block_mask, dQ scratch fits).
    if fused is None:
        fused = (
            q_segment_ids is None
            and not bm
            and s_q * d * 4 <= 32 * 1024 * 1024
        )
    if block_sizes is None and fused:
        # Fused-path winners from the same honest sweep.
        if precision == "bf16":
            bq_kv = (1024, 1024) if d < 128 else (512, 1024)
        else:
            bq_kv = (512, 512)
        block_sizes = BlockSizes.fit(
            q_seq_len or s_q, s_kv, d, precision, False,
            max_block_q=bq_kv[0], max_block_kv=bq_kv[1],
        )
        block_sizes = BlockSizes(
            block_sizes.block_q, block_sizes.block_kv,
            block_sizes.block_kv_compute, 1, 1,
        )
    if block_sizes is None:
        # The backward kernels live with ~4 score-sized (bq x bkv) fp32 tiles
        # (s, p, dp, ds) at once plus (bkv, d) dk/dv scratch, so the forward's
        # tuned 2048-wide KV blocks blow the VMEM budget.  Defaults re-swept
        # HONESTLY in round 5 (measurements/tune_bwd_r5.txt): every round-4
        # number timed the dq kernel alone — the `...[0]` timing lambda let
        # XLA dead-code-eliminate the dkv pallas_call (fixed in
        # scripts/tune_bwd.py) — so the old records (45.8/117/57.2/188.8
        # TF/s) were ~2x optimistic AND picked wrong winners.  True sweep:
        #   bf16 d=64:  512/1024 @ split=2 -> 1.965 ms  43.7 TF/s
        #   bf16 d=128: 1024/1024 @ split=1 -> 2.564 ms  67.0 TF/s
        #   fp32 d=64:  1024/1024 @ split=1 -> 3.761 ms  22.8 TF/s
        #   fp32 d=128: 512/512  @ split=1 -> 6.442 ms  26.7 TF/s
        # acc_split (_csplit independent accumulation chains) only pays on
        # the single-pass bf16 d=64 matmuls; the multi-pass fp32 emulations
        # already break each accumulation into hi/lo passes, and further
        # splits just add VPU tile sums.
        # causal=False below: fit()'s causal branch tunes the FORWARD tri
        # grid (block_q/bkv caps that lose here — the sweep above ran
        # causal); block_h/pv_split are forward-tuned, so both come from the
        # backward sweep instead.  Explicit block_sizes pass through
        # untouched.
        if precision == "bf16" and d < 128:
            acc_split, max_bq, max_bkv = 2, 512, 1024
        elif precision == "bf16":
            acc_split, max_bq, max_bkv = 1, 1024, 1024
        elif d >= 128:  # fp32 multi-pass (bf16_3x)
            acc_split, max_bq, max_bkv = 1, 512, 512
        else:  # fp32 lane-packed
            acc_split, max_bq, max_bkv = 1, 1024, 1024
        block_sizes = BlockSizes.fit(
            q_seq_len or s_q, s_kv, d, precision, False,
            max_block_q=max_bq, max_block_kv=max_bkv,
        )
        if (
            block_sizes.block_kv_compute % (acc_split * 128)
            or block_sizes.block_q % (acc_split * 128)
        ):
            acc_split = 1  # tiny blocks on either split axis: nothing to split
        block_sizes = BlockSizes(
            block_sizes.block_q, block_sizes.block_kv,
            block_sizes.block_kv_compute, 1, acc_split,
        )
    # acc_split rides BlockSizes.pv_split (documented overload, round-4/5
    # advisor finding): the backward has no PV matmul, so the field names the
    # contraction-split knob of whichever pass owns it — forward PV there,
    # dQ/dK/dV accumulation chains here.  tune_bwd.py sweeps it explicitly.
    # Gate on BOTH split axes (advisor r4: the dq kernels split block_kv, the
    # dkv kernels split block_q; guarding only one could leave them split
    # differently / drop into an unmeasured sub-128 chunk regime).
    acc_split = block_sizes.pv_split
    if (
        block_sizes.block_kv_compute % (acc_split * 128)
        or block_sizes.block_q % (acc_split * 128)
    ):
        acc_split = 1
    bq, bkv = block_sizes.block_q, block_sizes.block_kv
    if s_q % bq or s_kv % bkv:
        raise ValueError(
            f"sequence lengths ({s_q}, {s_kv}) must be multiples of blocks ({bq}, {bkv})"
        )
    num_q, num_kv = s_q // bq, s_kv // bkv
    q_seq_blocks = resolve_q_seq_blocks(s_q, bq, q_seq_len)

    # Scalar-prefetched: [q_offset, dropout_seed] (seed traced — a fresh
    # per-step seed never recompiles; ignored when dropout is off).  With a
    # block_mask, the flattened (num_q, num_kv) liveness table rides the
    # same vector from index 2 (keeps every BlockSpec lambda's arity fixed).
    qoff = jnp.stack([
        jnp.asarray(q_offset, jnp.int32),
        jnp.asarray(dropout_seed, jnp.int32),
    ])
    if bm:
        live = np.zeros((s_q // bq) * (s_kv // bkv), np.int32)
        for qi, kj in zip(block_mask.qi, block_mask.kj):
            live[qi * (s_kv // bkv) + kj] = 1
        qoff = jnp.concatenate([qoff, jnp.asarray(live)])
    di = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1
    )  # (BH, S_q), shared by both kernels (~ the reference guide's di)
    lse3 = lse[:, None, :]  # (BH, 1, S_q) for sublane-legal blocks
    di3 = di[:, None, :]

    # Lane-packed fp32 (round 3; VERDICT #5): port of the forward's packed
    # schedule — q/k/v/do stream as [hi|lo] bf16 pairs (same HBM bytes) and
    # all five block matmuls run full-width 2-pass (1-pass at d<=32 for the
    # d-contractions) instead of bf16_3x's 3 half-width passes, keeping the
    # lo*lo term (more accurate than 3x).  dq/dk/dv outputs stay fp32.
    out_dtypes = (q.dtype, k.dtype, v.dtype)
    packed = (
        precision == "bf16_3x"
        and not fused
        and 2 * d <= NUM_LANES
        and q.dtype == k.dtype == v.dtype == do.dtype == jnp.float32
    )
    qk_width = d
    if packed:
        q, k, v, do = _pack2(q), _pack2(k), _pack2(v), _pack2(do)
        qk_width = 2 * d

    if causal:
        # Clamp block indices of causally-skipped steps to the last/first
        # needed block: an unchanged index makes the Pallas pipeline elide
        # the DMA (the forward's trick, ops.flash), halving causal backward
        # HBM traffic.
        def dq_kv_index(i, j, qoff):
            if q_seq_blocks is not None:
                i = jax.lax.rem(i, q_seq_blocks)
            last = jnp.minimum(num_kv - 1, (qoff[0] + (i + 1) * bq - 1) // bkv)
            j = jnp.minimum(j, last)
            if window is not None:
                first = jnp.maximum(0, (qoff[0] + i * bq - window + 1) // bkv)
                j = jnp.maximum(j, jnp.minimum(first, last))
            return j

        def dkv_q_index(j, i, qoff):
            # For KV block j, q blocks at segment position < first_pos are
            # skipped; clamp the *within-segment* position up to first_pos
            # (and, under a sliding window, down to the last position whose
            # window still reaches this KV block).
            first_pos = jnp.maximum(0, (j * bkv - qoff[0]) // bq)
            if q_seq_blocks is None:
                i = jnp.minimum(jnp.maximum(i, first_pos), num_q - 1)
                if window is not None:
                    last_pos = ((j + 1) * bkv + window - 2 - qoff[0]) // bq
                    i = jnp.minimum(i, jnp.maximum(last_pos, first_pos))
                return i
            seg = jax.lax.div(i, q_seq_blocks)
            pos = jnp.maximum(jax.lax.rem(i, q_seq_blocks), first_pos)
            pos = jnp.minimum(pos, q_seq_blocks - 1)
            if window is not None:
                last_pos = ((j + 1) * bkv + window - 2 - qoff[0]) // bq
                pos = jnp.minimum(pos, jnp.maximum(last_pos, first_pos))
            return seg * q_seq_blocks + pos

    else:
        dq_kv_index = lambda i, j, qoff: j
        dkv_q_index = lambda j, i, qoff: i

    has_segments = q_segment_ids is not None
    if has_segments and (kv_segment_ids is None):
        raise ValueError("q_segment_ids and kv_segment_ids must be given together")
    if has_segments:
        seg_q3 = q_segment_ids[:, :, None].astype(jnp.int32)   # (BH, S_q, 1)
        seg_kv3 = kv_segment_ids[:, None, :].astype(jnp.int32)  # (BH, 1, S_kv)

    if fused:
        if has_segments:
            raise ValueError(
                "fused backward does not support segment ids; use fused=False"
            )
        if bm:
            raise ValueError(
                "fused backward does not support block_mask; use fused=False"
            )
        if s_q * d * 4 > 32 * 1024 * 1024:
            raise ValueError(
                f"fused backward dQ scratch ({s_q}x{d} f32) exceeds the VMEM "
                "budget; use fused=False"
            )
        fused_specs = [
            pl.BlockSpec((1, bq, d), lambda b, j, i, qo: (b, dkv_q_index(j, i, qo), 0)),  # q
            pl.BlockSpec((1, bkv, d), lambda b, j, i, qo: (b, j, 0)),  # k
            pl.BlockSpec((1, bkv, d), lambda b, j, i, qo: (b, j, 0)),  # v
            pl.BlockSpec((1, bq, d), lambda b, j, i, qo: (b, dkv_q_index(j, i, qo), 0)),  # do
            pl.BlockSpec((1, 1, bq), lambda b, j, i, qo: (b, 0, dkv_q_index(j, i, qo))),  # lse
            pl.BlockSpec((1, 1, bq), lambda b, j, i, qo: (b, 0, dkv_q_index(j, i, qo))),  # di
        ]
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _fused_bwd_kernel,
                causal=causal,
                scale=scale,
                kv_len=kv_len,
                num_q_blocks=num_q,
                num_kv_blocks=num_kv,
                precision=precision,
                q_seq_blocks=q_seq_blocks,
                window=window,
                logit_softcap=logit_softcap,
                dropout_rate=dropout_rate,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bh, num_kv, num_q),
                in_specs=fused_specs,
                out_specs=[
                    pl.BlockSpec((1, s_q, d), lambda b, j, i, qo: (b, 0, 0)),
                    pl.BlockSpec((1, bkv, d), lambda b, j, i, qo: (b, j, 0)),
                    pl.BlockSpec((1, bkv, d), lambda b, j, i, qo: (b, j, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((s_q, d), jnp.float32),  # dq accumulator
                    pltpu.VMEM((bkv, d), jnp.float32),  # dk
                    pltpu.VMEM((bkv, d), jnp.float32),  # dv
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
                jax.ShapeDtypeStruct((bh, s_kv, d), k.dtype),
                jax.ShapeDtypeStruct((bh, s_kv, d), v.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            interpret=interpret,
        )(qoff, q, k, v, do, lse3, di3)
        return dq, dk, dv

    row_specs = [
        pl.BlockSpec((1, bq, qk_width), lambda b, i, j, qo: (b, i, 0)),  # q
        pl.BlockSpec((1, bkv, qk_width), lambda b, i, j, qo: (b, dq_kv_index(i, j, qo), 0)),  # k
        pl.BlockSpec((1, bkv, qk_width), lambda b, i, j, qo: (b, dq_kv_index(i, j, qo), 0)),  # v
        pl.BlockSpec((1, bq, qk_width), lambda b, i, j, qo: (b, i, 0)),  # do
        pl.BlockSpec((1, 1, bq), lambda b, i, j, qo: (b, 0, i)),  # lse
        pl.BlockSpec((1, 1, bq), lambda b, i, j, qo: (b, 0, i)),  # di
    ]
    dq_inputs = [qoff, q, k, v, do, lse3, di3]
    if has_segments:
        row_specs += [
            pl.BlockSpec((1, bq, 1), lambda b, i, j, qo: (b, i, 0)),
            pl.BlockSpec(
                (1, 1, bkv), lambda b, i, j, qo: (b, 0, dq_kv_index(i, j, qo))
            ),
        ]
        dq_inputs += [seg_q3, seg_kv3]

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel,
            causal=causal,
            scale=scale,
            kv_len=kv_len,
            num_kv_blocks=num_kv,
            precision=precision,
            q_seq_blocks=q_seq_blocks,
            window=window,
            logit_softcap=logit_softcap,
            packed=packed,
            head_dim=d,
            dropout_rate=dropout_rate,
            has_segments=has_segments,
            bm_mask_fn=block_mask.mask_fn if bm else None,
            bm_element_mask=bm and block_mask.needs_element_mask,
            bm_num_kv=num_kv if bm else None,
            acc_split=acc_split,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, num_q, num_kv),
            in_specs=row_specs,
            out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j, qo: (b, i, 0)),
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, s_q, d), out_dtypes[0]),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # v5e has 128 MB VMEM; the default 16 MB scoped limit rejects
            # valid large-block configs with an opaque compile error.
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*dq_inputs)

    kv_specs = [
        pl.BlockSpec((1, bq, qk_width), lambda b, j, i, qo: (b, dkv_q_index(j, i, qo), 0)),  # q
        pl.BlockSpec((1, bkv, qk_width), lambda b, j, i, qo: (b, j, 0)),  # k
        pl.BlockSpec((1, bkv, qk_width), lambda b, j, i, qo: (b, j, 0)),  # v
        pl.BlockSpec((1, bq, qk_width), lambda b, j, i, qo: (b, dkv_q_index(j, i, qo), 0)),  # do
        pl.BlockSpec((1, 1, bq), lambda b, j, i, qo: (b, 0, dkv_q_index(j, i, qo))),  # lse
        pl.BlockSpec((1, 1, bq), lambda b, j, i, qo: (b, 0, dkv_q_index(j, i, qo))),  # di
    ]
    kv_inputs = [qoff, q, k, v, do, lse3, di3]
    if has_segments:
        kv_specs += [
            pl.BlockSpec(
                (1, bq, 1), lambda b, j, i, qo: (b, dkv_q_index(j, i, qo), 0)
            ),
            pl.BlockSpec((1, 1, bkv), lambda b, j, i, qo: (b, 0, j)),
        ]
        kv_inputs += [seg_q3, seg_kv3]
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel,
            causal=causal,
            scale=scale,
            kv_len=kv_len,
            num_q_blocks=num_q,
            precision=precision,
            q_seq_blocks=q_seq_blocks,
            window=window,
            logit_softcap=logit_softcap,
            packed=packed,
            head_dim=d,
            dropout_rate=dropout_rate,
            has_segments=has_segments,
            bm_mask_fn=block_mask.mask_fn if bm else None,
            bm_element_mask=bm and block_mask.needs_element_mask,
            bm_num_kv=num_kv if bm else None,
            acc_split=acc_split,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, num_kv, num_q),
            in_specs=kv_specs,
            out_specs=[
                pl.BlockSpec((1, bkv, d), lambda b, j, i, qo: (b, j, 0)),
                pl.BlockSpec((1, bkv, d), lambda b, j, i, qo: (b, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bkv, d), jnp.float32),
                pltpu.VMEM((bkv, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_kv, d), out_dtypes[1]),
            jax.ShapeDtypeStruct((bh, s_kv, d), out_dtypes[2]),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # v5e has 128 MB VMEM; the default 16 MB scoped limit rejects
            # valid large-block configs with an opaque compile error.
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*kv_inputs)
    return dq, dk, dv


# ── differentiable public op ─────────────────────────────────────────────────


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 15)
)
def attention_vjp(
    q,
    k,
    v,
    causal: bool = False,
    scale: float = 1.0,
    block_sizes: BlockSizes | None = None,
    precision: str | None = None,
    interpret: bool | None = None,
    q_seq_len: int | None = None,
    window: int | None = None,
    logit_softcap: float | None = None,
    dropout_rate: float | None = None,
    dropout_seed=0,
    q_segment_ids=None,
    kv_segment_ids=None,
    block_mask=None,
    kv_len=None,
    q_offset=0,
):
    """Differentiable fused attention on (BH, S, d) (block-aligned shapes).

    ``kv_len``/``q_offset`` (round 5): traced ragged-tail/offset scalars —
    the same args the kernels take — so the public dispatch path (which
    pads unaligned shapes and masks the tail via kv_len) is differentiable
    end-to-end.  Their cotangents are symbolic zeros.

    ``q_seq_len`` enables GQA row folding (see ops.flash.flash_attention):
    q is (B*KVH, G*q_seq_len, d) against k/v (B*KVH, S_kv, d) — the backward
    kernels accumulate dK/dV over all G groups' rows automatically.

    ``dropout_rate``/``dropout_seed`` (round 3): attention dropout on the
    softmax weights with inverted scaling.  The (S_q, S_kv) mask is never
    materialized — both backward kernels regenerate it from the seed
    (:func:`ops.flash.dropout_keep_mask`), the flash-dropout memory property.
    The seed is a traced int32 scalar (fresh per-step seeds don't recompile);
    its cotangent is the symbolic zero (float0).
    """
    return flash_attention(
        q, k, v, causal=causal, scale=scale, block_sizes=block_sizes,
        precision=precision, q_seq_len=q_seq_len, interpret=interpret,
        window=window, logit_softcap=logit_softcap,
        dropout_rate=dropout_rate, dropout_seed=dropout_seed,
        q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
        block_mask=block_mask, kv_len=kv_len, q_offset=q_offset,
    )


def _vjp_fwd(q, k, v, causal, scale, block_sizes, precision, interpret,
             q_seq_len, window, logit_softcap, dropout_rate, dropout_seed,
             q_segment_ids, kv_segment_ids, block_mask=None, kv_len=None,
             q_offset=0):
    o, l, m = flash_attention(
        q, k, v, causal=causal, scale=scale, block_sizes=block_sizes,
        save_residuals=True, precision=precision, q_seq_len=q_seq_len,
        interpret=interpret, window=window, logit_softcap=logit_softcap,
        dropout_rate=dropout_rate, dropout_seed=dropout_seed,
        q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
        block_mask=block_mask, kv_len=kv_len, q_offset=q_offset,
    )
    lse = m + jnp.log(jnp.where(l == 0.0, 1.0, l))
    return o, (q, k, v, o, lse, dropout_seed, q_segment_ids, kv_segment_ids,
               kv_len, q_offset)


def _vjp_bwd(causal, scale, block_sizes, precision, interpret, q_seq_len,
             window, logit_softcap, dropout_rate, block_mask, res, do):
    (q, k, v, o, lse, dropout_seed, q_segment_ids, kv_segment_ids,
     kv_len, q_offset) = res
    dq, dk, dv = flash_attention_bwd(
        q, k, v, o, lse, do,
        causal=causal, scale=scale, block_sizes=block_sizes,
        precision=precision, q_seq_len=q_seq_len, interpret=interpret,
        window=window, logit_softcap=logit_softcap,
        dropout_rate=dropout_rate, dropout_seed=dropout_seed,
        q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
        block_mask=block_mask, kv_len=kv_len, q_offset=q_offset,
    )

    # Integer inputs: symbolic-zero cotangents (float0); None stays None.
    def _zero(x):
        if x is None:
            return None
        return np.zeros(np.shape(x), jax.dtypes.float0)

    return dq, dk, dv, _zero(dropout_seed), _zero(q_segment_ids), _zero(
        kv_segment_ids
    ), _zero(kv_len), _zero(q_offset)


attention_vjp.defvjp(_vjp_fwd, _vjp_bwd)
