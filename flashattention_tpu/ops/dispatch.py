"""Public attention API: shape handling, padding, kernel dispatch.

TPU-native equivalent of the reference's host-launcher + binding layers:
``forward()`` (``/root/reference/src/flashattention.cu:603-617``, which
allocates outputs, asserts d==64, and picks the causal vs non-causal kernel)
and the pybind11 module (``/root/reference/src/main.cpp:5-7``).  On TPU no FFI
layer is needed: the "binding" is a plain jitted Python function, output
allocation is XLA's job, and the causal flag selects a kernel specialization at
trace time.

Improvements over the reference contract (SURVEY.md "behavioral contracts"):
- any head_dim (the reference asserts d == 64);
- ragged sequence lengths handled by padding + in-kernel masking (the
  reference's main kernels silently mis-handle non-multiple-of-32 tails);
- ``scale`` exposed (reference hardcodes 1.0); ``sdpa`` helper applies the
  standard 1/sqrt(d);
- accepts both (B, H, S, d) and the reference's folded (B*H, S, d) layout.

Round 4 (VERDICT #7): every kernel capability is reachable from this ONE
entry point — the single-op contract of ``/root/reference/src/main.cpp:5-7``
as a superset.  Feature matrix (all composable unless noted):

| kwarg                          | effect                                    |
|--------------------------------|-------------------------------------------|
| ``causal``                     | lower-triangular masking                  |
| ``scale``                      | score scale (``sdpa`` = 1/sqrt(d))        |
| ``window``                     | sliding-window (Mistral), causal only     |
| ``logit_softcap``              | tanh score capping (Gemma-2)              |
| ``dropout_rate/dropout_seed``  | fused attention dropout (traced seed)     |
| ``q/kv_segment_ids``           | packed-sequence block-diagonal masking    |
| ``k/v_scales``                 | quantized (int8/fp8) KV, fused dequant    |
| ``kv_len``                     | ragged/traced KV length (chunked prefill) |
| ``q_offset``                   | traced absolute query position (decode)   |
| ``block_mask``                 | block-sparse masks (prefix-LM, strided)   |
| ``save_residuals``             | also return softmax stats (l, m)          |
| ``precision``                  | fp32 matmul emulation ladder              |
| ``block_sizes``                | manual kernel tile config                 |
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from flashattention_tpu.ops import reference
from flashattention_tpu.ops.backward import attention_vjp
from flashattention_tpu.ops.flash import BlockSizes, flash_attention, resolve_precision

__all__ = ["attention", "sdpa"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal",
        "scale",
        "block_sizes",
        "save_residuals",
        "implementation",
        "precision",
        "interpret",
        "window",
        "logit_softcap",
        "dropout_rate",
        "block_mask",
    ),
)
def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    scale: float = 1.0,
    block_sizes: BlockSizes | None = None,
    save_residuals: bool = False,
    implementation: str = "pallas",
    precision: str | None = None,
    interpret: bool | None = None,
    window: int | None = None,
    logit_softcap: float | None = None,
    dropout_rate: float | None = None,
    dropout_seed: int | jax.Array = 0,
    q_segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    kv_len: int | jax.Array | None = None,
    q_offset: int | jax.Array | None = None,
    block_mask=None,
):
    """Fused attention ``O = softmax(scale * Q K^T) V``.

    Args:
      q, k, v: ``(B, H, S, d)`` or ``(B*H, S, d)``; k/v may have a different
        (KV) sequence length than q.  Fewer KV than Q heads = grouped-query
        attention (folded internally; no repeated KV is materialized).
      causal: lower-triangular masking; when ``S_q != S_kv`` queries are
        aligned to the *end* of the KV sequence (standard incremental-decode
        convention).
      scale: score scale. 1.0 matches the reference kernel's hardcoded default
        (``src/flashattention.cu:586,593,600``); use :func:`sdpa` for 1/sqrt(d).
      implementation: "pallas" (tuned kernel), "xla" (jnp oracle, runs
        anywhere, also the autodiff-able fallback).
      precision: matmul precision mode for fp32 inputs ("bf16" / "bf16_3x" /
        "float32"); see :func:`ops.flash.flash_attention`.
      save_residuals: also return softmax stats ``(l, m)`` shaped like
        ``q[..., 0]`` — needed by ring attention and the backward pass.
      window: sliding-window attention (causal only): query i attends keys
        in ``(i - window, i]`` — Mistral-style local attention; out-of-window
        KV blocks skip compute AND DMA.
      logit_softcap: Gemma-2-style score capping ``cap * tanh(s / cap)``.
      dropout_rate: fused attention dropout in (0, 1); drops normalized
        weights with inverted 1/(1-rate) scaling.  ``dropout_seed`` may be a
        traced int32 (fresh per-step seeds never recompile).
      q_segment_ids / kv_segment_ids: packed-sequence masking — query rows
        attend only same-segment KV columns.  ``(B, S)`` for 4D inputs
        (shared across heads) or ``(B*H, S)`` matching 3D inputs.  Ids must
        be >= 0 (padding uses negative sentinels internally).
      k_scales / v_scales: per-token dequant scales for quantized (int8/fp8)
        KV payloads, fused into the kernel. ``(B, H_kv, S_kv)`` for 4D inputs
        or ``(B*H_kv, S_kv)`` for 3D.
      kv_len: live KV prefix length; columns >= kv_len are masked AND their
        blocks skip compute/DMA.  May be a traced int32 scalar (one compiled
        program serves every chunked-prefill length).
      q_offset: absolute position of query row 0 (causal decode/prefill
        chunks).  Defaults to ``S_kv - S_q`` for causal (suffix alignment);
        may be a traced int32 scalar.
      block_mask: a :class:`ops.flash.BlockMask` for block-sparse attention
        patterns beyond causal (prefix-LM, strided, document masks); built
        via ``BlockMask.from_mask_fn``.  Mutually exclusive with ``causal``.

    Returns:
      ``o`` with q's shape (and dtype), or ``(o, l, m)``.
    """
    q_shape = q.shape
    groups = 1
    b_lead = None
    if q.ndim == 4:
        b, h, s_q, d = q.shape
        b_lead = b
        hkv = k.shape[1]
        if h != hkv:
            # Grouped-query attention: fold the G = H // KVH query groups into
            # the row dim of each KV head's Q — the kernel attends them to one
            # un-repeated KV head (``q_seq_len`` row folding in ops.flash), so
            # no repeated KV is materialized or streamed from HBM.
            if h % hkv:
                raise ValueError(f"q heads ({h}) not a multiple of kv heads ({hkv})")
            groups = h // hkv
            # (B, H, S, d) -> (B, KVH, G, S, d) -> (B*KVH, G*S, d), g-major
            # rows so each length-S segment is position-contiguous.
            q3 = q.reshape(b, hkv, groups, s_q, d).reshape(b * hkv, groups * s_q, d)
        else:
            q3 = q.reshape(b * h, s_q, d)
        k3 = k.reshape(k.shape[0] * k.shape[1], *k.shape[2:])
        v3 = v.reshape(v.shape[0] * v.shape[1], *v.shape[2:])
    elif q.ndim == 3:
        q3, k3, v3 = q, k, v
        if k3.shape[0] != q3.shape[0]:
            raise ValueError(
                f"3D GQA not supported; fold groups yourself or pass 4D "
                f"(got q {q3.shape}, k {k3.shape})"
            )
    else:
        raise ValueError(f"expected 3D or 4D q, got shape {q_shape}")

    bh, s_q_rows, d = q3.shape
    s_q = s_q_rows // groups  # per-segment (true) query length
    s_kv = k3.shape[1]
    bh_kv = k3.shape[0]
    if q_offset is None:
        q_offset = s_kv - s_q if causal else 0
    if causal and s_kv < s_q:
        raise ValueError(f"causal attention requires S_kv >= S_q, got {s_kv} < {s_q}")
    if block_mask is not None and causal:
        raise ValueError("block_mask and causal are mutually exclusive; encode "
                         "causality in the mask_fn instead")

    # Broadcast per-(batch, head) side inputs to the folded (BH, S) layout.
    if q_segment_ids is not None and groups > 1:
        # GQA fold: each (B, S_q) id row serves all KVH x G folded rows,
        # g-major to match q3's row layout.
        if q_segment_ids.shape != (b_lead, s_q):
            raise ValueError(
                f"q_segment_ids with GQA must be (B, S_q)=({b_lead}, {s_q}), "
                f"got {q_segment_ids.shape}"
            )
        seg_q3 = jnp.broadcast_to(
            q_segment_ids[:, None, None, :],
            (b_lead, k.shape[1], groups, s_q),
        ).reshape(bh, groups * s_q)
    else:
        seg_q3 = _fold_side_input(
            q_segment_ids, b_lead, bh, s_q, "q_segment_ids"
        )
    seg_kv3 = _fold_side_input(kv_segment_ids, b_lead, bh_kv, s_kv, "kv_segment_ids")
    ks3 = _fold_scales(k_scales, b_lead, bh_kv, s_kv, "k_scales")
    vs3 = _fold_scales(v_scales, b_lead, bh_kv, s_kv, "v_scales")

    if implementation == "xla":
        if dropout_rate is not None:
            raise NotImplementedError(
                "dropout is kernel-PRNG-defined; implementation='xla' has no "
                "matching oracle (tests regenerate masks via dropout_keep_mask)"
            )
        if groups > 1:  # the oracle wants equal heads: repeat KV (it's the
            # correctness reference, not the fast path)
            k3 = jnp.repeat(k3.reshape(bh, 1, s_kv, d), groups, 1).reshape(
                bh * groups, s_kv, d
            )
            v3 = jnp.repeat(v3.reshape(bh, 1, s_kv, d), groups, 1).reshape(
                bh * groups, s_kv, d
            )
            q3 = q3.reshape(bh * groups, s_q, d)
        if ks3 is not None:
            k3 = k3.astype(jnp.float32) * _rep_scales(ks3, groups)[..., None]
            v3 = v3.astype(jnp.float32) * _rep_scales(vs3, groups)[..., None]
        out = reference.attention_reference_with_stats(
            q3, k3, v3, causal=causal, scale=scale, q_offset=q_offset,
            window=window, logit_softcap=logit_softcap, kv_len=kv_len,
        )
        o, l, m = out
        if seg_q3 is not None or block_mask is not None:
            raise NotImplementedError(
                "segment ids / block_mask via implementation='xla': use "
                "ops.reference directly with an explicit mask"
            )
        if ks3 is not None:
            o = o.astype(q.dtype)
        if groups > 1:
            o = o.reshape(bh, groups * s_q, d)
            l = l.reshape(bh, groups * s_q)
            m = m.reshape(bh, groups * s_q)
    elif implementation == "pallas":
        if block_sizes is None:
            if block_mask is not None:
                block_sizes = BlockSizes.for_mask(block_mask, n_heads=bh)
            else:
                block_sizes = BlockSizes.fit(
                    _round_up(s_q, 128), _round_up(s_kv, 128), d,
                    resolve_precision(precision, q3.dtype), causal,
                    # Mirror flash_attention's internal fit: head batching
                    # only for plain (unfolded) layouts (round 5 — without
                    # this the dispatch path never saw block_h or the
                    # small-packed fp32 regime, measurements/
                    # probe_small_fp32.txt's 15% "fit() mis-tune").
                    n_heads=bh if groups == 1 else None,
                )
        bq, bkv = block_sizes.block_q, block_sizes.block_kv
        s_q_pad = _round_up(s_q, bq)
        s_kv_pad = _round_up(s_kv, bkv)
        if block_mask is not None and (s_q_pad, s_kv_pad) != (
            block_mask.s_q, block_mask.s_kv
        ):
            raise ValueError(
                f"block_mask covers (S_q, S_kv)=({block_mask.s_q}, "
                f"{block_mask.s_kv}) but the padded inputs are ({s_q_pad}, "
                f"{s_kv_pad}); build the mask at the padded lengths (its "
                "mask_fn decides what padding rows may attend)"
            )
        if groups > 1:
            if s_q_pad != s_q:
                # Pad each group segment independently, keeping g-major rows.
                q3 = _pad_seq(q3.reshape(bh * groups, s_q, d), s_q_pad).reshape(
                    bh, groups * s_q_pad, d
                )
                if seg_q3 is not None:
                    seg_q3 = _pad_ids(
                        seg_q3.reshape(bh * groups, s_q), s_q_pad, -1
                    ).reshape(bh, groups * s_q_pad)
        else:
            q3 = _pad_seq(q3, s_q_pad)
            if seg_q3 is not None:
                seg_q3 = _pad_ids(seg_q3, s_q_pad, -1)
        kp = _pad_seq(k3, s_kv_pad)
        vp = _pad_seq(v3, s_kv_pad)
        if seg_kv3 is not None:
            # -2 never equals a (>= 0) user id nor the -1 q-row padding, so
            # padded KV columns are masked even without a kv_len.
            seg_kv3 = _pad_ids(seg_kv3, s_kv_pad, -2)
        if ks3 is not None:
            ks3 = _pad_ids(ks3, s_kv_pad, 0.0)
            vs3 = _pad_ids(vs3, s_kv_pad, 0.0)
        eff_kv_len = kv_len
        if eff_kv_len is None and s_kv_pad != s_kv:
            eff_kv_len = s_kv
        eff_q_seq_len = s_q_pad if groups > 1 else None
        if ks3 is None and not save_residuals:
            # Differentiable route (round 5): the custom-VJP wrapper makes
            # jax.grad through the public attention() work — the pad/fold/
            # slice plumbing around it is linear, so autodiff handles it
            # once the kernel call itself has a VJP.  Quantized KV and
            # save_residuals callers keep the raw kernel (no bwd exists
            # for int8 payload streams; residuals are a fwd-only protocol).
            # NB custom_vjp + nondiff_argnums: positional args only.
            out = attention_vjp(
                q3, kp, vp, causal, scale, block_sizes, precision,
                interpret, eff_q_seq_len, window, logit_softcap,
                dropout_rate, dropout_seed, seg_q3, seg_kv3, block_mask,
                eff_kv_len, q_offset,
            )
        else:
            out = flash_attention(
                q3,
                kp,
                vp,
                ks3,
                vs3,
                causal=causal,
                scale=scale,
                block_sizes=block_sizes,
                kv_len=eff_kv_len,
                q_offset=q_offset,
                save_residuals=save_residuals,
                precision=precision,
                q_seq_len=eff_q_seq_len,
                interpret=interpret,
                window=window,
                logit_softcap=logit_softcap,
                dropout_rate=dropout_rate,
                dropout_seed=dropout_seed,
                q_segment_ids=seg_q3,
                kv_segment_ids=seg_kv3,
                block_mask=block_mask,
            )
        o, l, m = out if save_residuals else (out, None, None)
        if groups > 1 and s_q_pad != s_q:
            o = o.reshape(bh * groups, s_q_pad, d)[:, :s_q].reshape(
                bh, groups * s_q, d
            )
            if save_residuals:
                l = l.reshape(bh * groups, s_q_pad)[:, :s_q].reshape(
                    bh, groups * s_q
                )
                m = m.reshape(bh * groups, s_q_pad)[:, :s_q].reshape(
                    bh, groups * s_q
                )
        else:
            o = o[:, : groups * s_q]
            if save_residuals:
                l = l[:, : groups * s_q]
                m = m[:, : groups * s_q]
    else:
        raise ValueError(f"unknown implementation: {implementation!r}")

    o = o.reshape(q_shape)
    if save_residuals:
        stat_shape = q_shape[:-1]
        return o, l.reshape(stat_shape), m.reshape(stat_shape)
    return o


def sdpa(q, k, v, *, causal=False, **kwargs):
    """Scaled dot-product attention: :func:`attention` with scale = 1/sqrt(d)."""
    return attention(q, k, v, causal=causal, scale=q.shape[-1] ** -0.5, **kwargs)


def _pad_seq(x: jax.Array, target: int) -> jax.Array:
    if x.shape[1] == target:
        return x
    return jnp.pad(x, ((0, 0), (0, target - x.shape[1]), (0, 0)))


def _pad_ids(x: jax.Array, target: int, fill) -> jax.Array:
    if x.shape[1] == target:
        return x
    return jnp.pad(
        x, ((0, 0), (0, target - x.shape[1])), constant_values=fill
    )


def _fold_side_input(ids, b_lead, bh, s, name):
    """(B, S) per-batch ids -> (BH, S) folded, or pass (BH, S) through."""
    if ids is None:
        return None
    if ids.ndim != 2:
        raise ValueError(f"{name} must be 2D (B, S) or (B*H, S), got {ids.shape}")
    if ids.shape == (bh, s):
        return ids
    if b_lead is not None and ids.shape == (b_lead, s):
        reps = bh // b_lead
        return jnp.broadcast_to(ids[:, None, :], (b_lead, reps, s)).reshape(bh, s)
    raise ValueError(
        f"{name} shape {ids.shape} matches neither (B, S)=({b_lead}, {s}) "
        f"nor (B*H, S)=({bh}, {s})"
    )


def _fold_scales(scales, b_lead, bh_kv, s_kv, name):
    """(B, H_kv, S) scales -> (B*H_kv, S), or pass (B*H_kv, S) through."""
    if scales is None:
        return None
    if scales.ndim == 3:
        if b_lead is None or scales.shape[0] * scales.shape[1] != bh_kv:
            raise ValueError(
                f"{name} shape {scales.shape} does not fold to (B*H_kv, S)="
                f"({bh_kv}, {s_kv})"
            )
        scales = scales.reshape(bh_kv, scales.shape[2])
    if scales.shape != (bh_kv, s_kv):
        raise ValueError(
            f"{name} must be (B*H_kv, S_kv)=({bh_kv}, {s_kv}), got {scales.shape}"
        )
    return scales


def _rep_scales(scales, groups):
    if groups == 1:
        return scales
    bh, s = scales.shape
    return jnp.repeat(scales.reshape(bh, 1, s), groups, 1).reshape(bh * groups, s)
