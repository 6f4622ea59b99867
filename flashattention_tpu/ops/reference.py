"""Pure-jnp reference attention oracles.

TPU-native re-design of the reference's two golden implementations:

- ``attention_reference`` generalizes the eager PyTorch reference
  (``/root/reference/bench_flashattention.py:36-48`` ``manual_attention_unmasked`` /
  ``manual_attention_masking``): plain matmul -> softmax -> matmul, causal via a
  lower-triangular mask.  Note the reference *omits* the 1/sqrt(d) scale (both
  sides of its comparison do), so ``scale`` defaults to 1.0 for parity and can be
  set to ``d**-0.5`` for real use (see SURVEY.md "behavioral contracts").
- ``attention_reference_with_stats`` additionally returns the online-softmax
  statistics (row max ``m`` and row sum ``l``), the CPU-golden analog of
  ``attention_forward_cpu`` (``/root/reference/src/llm.c/attention_forward.cu:53-125``)
  which materializes ``preatt``/``att`` intermediates; on TPU the useful
  intermediates are (m, l) because they are the cross-device ring-attention
  combiner state.

These run anywhere (CPU included) and are the oracles every Pallas kernel is
differentially tested against (SURVEY.md section 4).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "attention_reference",
    "attention_reference_with_stats",
    "causal_mask",
    "DEFAULT_MASK_VALUE",
]

# Large-negative instead of -inf so exp(mask - max) never hits exp(-inf - (-inf)).
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def causal_mask(s_q: int, s_kv: int, *, q_offset: int = 0) -> jnp.ndarray:
    """Boolean (s_q, s_kv) mask, True where query i may attend to key j.

    ``q_offset`` shifts query positions (used when queries are a suffix of the
    KV sequence, e.g. decode with a cache: query position = q_offset + i).
    """
    q_ids = jnp.arange(s_q)[:, None] + q_offset
    kv_ids = jnp.arange(s_kv)[None, :]
    return kv_ids <= q_ids


def attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    scale: float = 1.0,
    kv_len: int | None = None,
    q_offset: int = 0,
    window: int | None = None,
    logit_softcap: float | None = None,
):
    """Dense reference attention ``O = softmax(scale * Q K^T) V``.

    Accepts ``(..., S, d)`` tensors with any number of leading batch/head dims
    (the reference folds heads into batch: ``bench_flashattention.py:31-33``).
    ``kv_len`` masks out padded KV columns (ragged-tail support the reference
    lacks except in ``attention_forward_torch.cu:162-168``).
    """
    o, _, _ = attention_reference_with_stats(
        q, k, v, causal=causal, scale=scale, kv_len=kv_len, q_offset=q_offset,
        window=window, logit_softcap=logit_softcap,
    )
    return o


def attention_reference_with_stats(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    scale: float = 1.0,
    kv_len: int | None = None,
    q_offset: int = 0,
    window: int | None = None,
    logit_softcap: float | None = None,
):
    """Reference attention returning ``(o, l, m)``.

    ``m``: per-row max of the (scaled, masked) scores; ``l``: per-row sum of
    ``exp(s - m)``.  These are exactly the running statistics a flash kernel
    maintains, and the state ring attention merges across devices.
    Computation is in float32 regardless of input dtype (the reference
    accumulates in fp32 throughout).
    """
    in_dtype = q.dtype
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # HIGHEST precision so the oracle stays a valid fp32 golden on TPU MXUs.
    s = jnp.einsum("...qd,...kd->...qk", qf, kf, precision="highest") * scale
    if logit_softcap is not None:
        # Gemma-2-style score capping: s -> cap * tanh(s / cap).
        s = logit_softcap * jnp.tanh(s / logit_softcap)

    if window is not None and not causal:
        raise ValueError("window (sliding-window attention) requires causal=True")
    s_q, s_kv = s.shape[-2], s.shape[-1]
    mask = None
    if causal:
        mask = causal_mask(s_q, s_kv, q_offset=q_offset)
        if window is not None:
            # Sliding window: query i sees keys in (i - window, i].
            q_ids = jnp.arange(s_q)[:, None] + q_offset
            kv_ids = jnp.arange(s_kv)[None, :]
            mask = mask & (kv_ids > q_ids - window)
    if kv_len is not None:
        len_mask = jnp.arange(s_kv)[None, :] < kv_len
        mask = len_mask if mask is None else (mask & len_mask)
    if mask is not None:
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("...qk,...kd->...qd", p, vf, precision="highest") / l[..., None]
    return o.astype(in_dtype), l, m
