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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from flashattention_tpu.ops import reference
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
):
    """Fused attention ``O = softmax(scale * Q K^T) V``.

    Args:
      q, k, v: ``(B, H, S, d)`` or ``(B*H, S, d)``; k/v may have a different
        (KV) sequence length than q.
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

    Returns:
      ``o`` with q's shape (and dtype), or ``(o, l, m)``.
    """
    q_shape = q.shape
    groups = 1
    if q.ndim == 4:
        b, h, s_q, d = q.shape
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
    q_offset = s_kv - s_q if causal else 0
    if causal and s_kv < s_q:
        raise ValueError(f"causal attention requires S_kv >= S_q, got {s_kv} < {s_q}")

    if implementation == "xla":
        if groups > 1:  # the oracle wants equal heads: repeat KV (it's the
            # correctness reference, not the fast path)
            k3 = jnp.repeat(k3.reshape(bh, 1, s_kv, d), groups, 1).reshape(
                bh * groups, s_kv, d
            )
            v3 = jnp.repeat(v3.reshape(bh, 1, s_kv, d), groups, 1).reshape(
                bh * groups, s_kv, d
            )
            q3 = q3.reshape(bh * groups, s_q, d)
        out = reference.attention_reference_with_stats(
            q3, k3, v3, causal=causal, scale=scale, q_offset=q_offset,
            window=window, logit_softcap=logit_softcap,
        )
        o, l, m = out
        if groups > 1:
            o = o.reshape(bh, groups * s_q, d)
            l = l.reshape(bh, groups * s_q)
            m = m.reshape(bh, groups * s_q)
    elif implementation == "pallas":
        if block_sizes is None:
            block_sizes = BlockSizes.fit(
                _round_up(s_q, 128), _round_up(s_kv, 128), d,
                resolve_precision(precision, q3.dtype), causal,
            )
        bq, bkv = block_sizes.block_q, block_sizes.block_kv
        s_q_pad = _round_up(s_q, bq)
        s_kv_pad = _round_up(s_kv, bkv)
        if groups > 1:
            if s_q_pad != s_q:
                # Pad each group segment independently, keeping g-major rows.
                q3 = _pad_seq(q3.reshape(bh * groups, s_q, d), s_q_pad).reshape(
                    bh, groups * s_q_pad, d
                )
        else:
            q3 = _pad_seq(q3, s_q_pad)
        kp = _pad_seq(k3, s_kv_pad)
        vp = _pad_seq(v3, s_kv_pad)
        out = flash_attention(
            q3,
            kp,
            vp,
            causal=causal,
            scale=scale,
            block_sizes=block_sizes,
            kv_len=s_kv if s_kv_pad != s_kv else None,
            q_offset=q_offset,
            save_residuals=save_residuals,
            precision=precision,
            q_seq_len=s_q_pad if groups > 1 else None,
            interpret=interpret,
            window=window,
            logit_softcap=logit_softcap,
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
