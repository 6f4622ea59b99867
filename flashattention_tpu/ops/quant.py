"""KV quantization: INT8 / FP8 payloads with per-token (or per-head) scales.

The reference is FP32-only (SURVEY.md section 0 "What it is NOT"); this is the
north-star extension from BASELINE.json: "KV-cache stored quantized (per-head
INT8/FP8 scales) and dequantized inside the Pallas kernel".  Dequant is fused
into the flash kernel's score/p tiles (see ``ops.flash._kernel``): the MXU
contracts the raw payloads (cast bf16) and a single VPU row-scale applies the
scales, so KV HBM traffic drops 4x (fp32->int8) / 2x (bf16->int8) with no
extra matmul work.

Scale granularities:
- ``"token"`` (default): one scale per (batch*head, position) row — the
  standard KV-cache choice, accuracy ~1e-2;
- ``"head"``: one scale per batch*head, replicated over positions (uniform
  (BH, S) scale layout keeps the kernel single-path; overhead is 4
  bytes/token either way, negligible next to the d-byte payload).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from flashattention_tpu.ops.flash import BlockSizes, flash_attention

__all__ = [
    "QuantizedTensor",
    "quantize",
    "dequantize",
    "quantize_kv",
    "attention_quantized",
    "QuantizedWeight",
    "quantize_weight",
    "quantize_weights",
    "dequantize_weight",
    "QUANT_DTYPES",
]

QUANT_DTYPES = {
    "int8": (jnp.int8, 127.0),
    "fp8": (jnp.float8_e4m3fn, 448.0),
}


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedTensor:
    """Quantized payload + float32 scales.

    payload: (BH, S, d) int8 or fp8; scales: (BH, S) float32 such that
    ``dequantized = payload.astype(f32) * scales[..., None]``.
    """

    payload: jax.Array
    scales: jax.Array

    def tree_flatten(self):
        return (self.payload, self.scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.payload.shape

    @property
    def dtype(self):
        return self.payload.dtype


def quantize(
    x: jax.Array, dtype: str = "int8", *, granularity: str = "token"
) -> QuantizedTensor:
    """Quantize (BH, S, d) to int8/fp8 with absmax scaling."""
    if dtype not in QUANT_DTYPES:
        raise ValueError(f"dtype must be one of {list(QUANT_DTYPES)}, got {dtype!r}")
    qdtype, qmax = QUANT_DTYPES[dtype]
    xf = x.astype(jnp.float32)
    if granularity == "token":
        absmax = jnp.max(jnp.abs(xf), axis=-1)  # (BH, S)
    elif granularity == "head":
        absmax = jnp.broadcast_to(
            jnp.max(jnp.abs(xf), axis=(-2, -1), keepdims=True)[..., 0], xf.shape[:-1]
        )  # (BH, S), replicated over S
    else:
        raise ValueError(f"granularity must be 'token' or 'head', got {granularity!r}")
    scales = jnp.where(absmax == 0.0, 1.0, absmax / qmax)
    scaled = xf / scales[..., None]
    if qdtype == jnp.int8:
        payload = jnp.clip(jnp.round(scaled), -qmax, qmax).astype(jnp.int8)
    else:
        payload = scaled.astype(qdtype)
    return QuantizedTensor(payload, scales)


def dequantize(qt: QuantizedTensor, dtype=jnp.float32) -> jax.Array:
    return (qt.payload.astype(jnp.float32) * qt.scales[..., None]).astype(dtype)


def quantize_kv(
    k: jax.Array, v: jax.Array, dtype: str = "int8", *, granularity: str = "token"
) -> tuple[QuantizedTensor, QuantizedTensor]:
    return (
        quantize(k, dtype, granularity=granularity),
        quantize(v, dtype, granularity=granularity),
    )


def attention_quantized(
    q: jax.Array,
    k: QuantizedTensor,
    v: QuantizedTensor,
    *,
    causal: bool = False,
    scale: float = 1.0,
    block_sizes: BlockSizes | None = None,
    kv_len: int | None = None,
    q_offset: int = 0,
    save_residuals: bool = False,
    precision: str | None = None,
    q_seq_len: int | None = None,
    interpret: bool | None = None,
    window: int | None = None,
    logit_softcap: float | None = None,
) -> Any:
    """Flash attention over a quantized KV pair (fused in-kernel dequant).

    Unlike the low-level :func:`ops.flash.flash_attention`, sequence lengths
    need not be block multiples: payloads and scales pad automatically and
    the tail masks via ``kv_len`` (matching :func:`ops.dispatch.attention`'s
    contract for the unquantized path).

    ``q_seq_len`` enables GQA row folding (see ops.flash.flash_attention)."""
    import jax.numpy as jnp

    from flashattention_tpu.ops.flash import BlockSizes as _BS

    bh, s_q, d = q.shape
    s_kv = k.payload.shape[1]
    if block_sizes is None:
        block_sizes = _BS.fit(
            q_seq_len or ((s_q + 127) // 128 * 128),
            (s_kv + 127) // 128 * 128,
            d,
            "bf16",
            causal,
        )
    bq, bkv = block_sizes.block_q, block_sizes.block_kv
    s_kv_pad = -(-s_kv // bkv) * bkv

    def pad_seq(x, target):
        if x.shape[1] == target:
            return x
        pads = [(0, 0), (0, target - x.shape[1])] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, pads)

    groups = None  # set when folded-GQA segments needed padding
    if q_seq_len is None:
        s_q_pad = -(-s_q // bq) * bq
        qp = pad_seq(q, s_q_pad)
    else:
        # GQA row folding: q stacks G = s_q // q_seq_len group segments along
        # rows.  Pad each *segment* to a block_q multiple (padded rows sit at
        # segment tails with positions >= the real ones; their outputs are
        # sliced away below), so non-block-multiple folded lengths work too.
        if s_q % q_seq_len:
            raise ValueError(
                f"q_seq_len ({q_seq_len}) must divide s_q ({s_q})"
            )
        seg_pad = -(-q_seq_len // bq) * bq
        if seg_pad == q_seq_len:
            qp = q
        else:
            groups = s_q // q_seq_len
            qp = jnp.pad(
                q.reshape(bh, groups, q_seq_len, d),
                [(0, 0), (0, 0), (0, seg_pad - q_seq_len), (0, 0)],
            ).reshape(bh, groups * seg_pad, d)
        s_q_pad = qp.shape[1]
        q_seq_len = seg_pad
    kp = pad_seq(k.payload, s_kv_pad)
    vp = pad_seq(v.payload, s_kv_pad)
    ksc = pad_seq(k.scales, s_kv_pad)
    vsc = pad_seq(v.scales, s_kv_pad)
    if kv_len is None and s_kv_pad != s_kv:
        kv_len = s_kv

    out = flash_attention(
        qp,
        kp,
        vp,
        ksc,
        vsc,
        causal=causal,
        scale=scale,
        block_sizes=block_sizes,
        kv_len=kv_len,
        q_offset=q_offset,
        save_residuals=save_residuals,
        precision=precision,
        q_seq_len=q_seq_len,
        interpret=interpret,
        window=window,
        logit_softcap=logit_softcap,
    )
    if s_q_pad == s_q:
        return out

    def unpad(x):
        if groups is None:
            return x[:, :s_q]
        # Per-segment slice: (bh, G*seg_pad, ...) -> (bh, G*q_seq_len, ...).
        seg_pad = s_q_pad // groups
        xs = x.reshape((bh, groups, seg_pad) + x.shape[2:])
        return xs[:, :, : s_q // groups].reshape((bh, s_q) + x.shape[2:])

    if save_residuals:
        o, l, m = out
        return unpad(o), unpad(l), unpad(m)
    return unpad(out)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedWeight:
    """Weight-only quantization: int8/fp8 payload + per-OUTPUT-channel
    scales (round 3).

    payload: (..., d_in, d_out) int8/fp8; scales: (..., d_out) float32 such
    that ``dequantized = payload.astype(f32) * scales[..., None, :]`` —
    absmax over the CONTRACTION dim, one scale per output column, the
    weight-only standard.  The matmul helpers apply the scale to the
    (small) OUTPUT instead of re-materializing the dequantized weight:
    ``x @ (p * s) == (x @ p) * s`` exactly in the per-column layout, so the
    weight streams from HBM at 1/2 (bf16) to 1/4 (fp32) the bytes — the
    decode-path bandwidth win (decode is weight-streaming-bound at small
    batch).
    """

    payload: jax.Array
    scales: jax.Array
    ldtype: str = "float32"  # the original weight's (logical) dtype

    def tree_flatten(self):
        return (self.payload, self.scales), self.ldtype

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)

    @property
    def shape(self):
        return self.payload.shape

    @property
    def dtype(self):  # the LOGICAL dtype callers see
        return jnp.dtype(self.ldtype)


def quantize_weight(w: jax.Array, dtype: str = "int8") -> QuantizedWeight:
    """Per-output-channel absmax quantization of a (..., d_in, d_out) weight."""
    qdtype, qmax = QUANT_DTYPES[dtype]
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2)  # (..., d_out)
    scales = jnp.maximum(absmax, 1e-30) / qmax
    q = wf / scales[..., None, :]
    if dtype == "int8":
        q = jnp.clip(jnp.round(q), -127, 127)
    return QuantizedWeight(q.astype(qdtype), scales, str(w.dtype))


def dequantize_weight(qw: QuantizedWeight, dtype=None) -> jax.Array:
    return (qw.payload.astype(jnp.float32) * qw.scales[..., None, :]).astype(
        dtype or qw.ldtype
    )


# Leaves that must stay full precision: norms are 1-D (no contraction dim)
# and the router's logits feed a top-k (quantization would flip routings).
_WEIGHT_QUANT_SKIP = ("attn_norm", "mlp_norm", "final_norm", "router")


def quantize_weights(params, dtype: str = "int8", skip=_WEIGHT_QUANT_SKIP):
    """Quantize a transformer param tree for weight-only serving.

    Every >=2-D floating leaf (projections, MLP / expert stacks, embedding
    table, lm_head) becomes a :class:`QuantizedWeight`; ``skip``-named and
    1-D leaves stay as-is.  The result serves through the same
    prefill/decode/engine paths (models/transformer.py matmul helpers
    dispatch on the leaf type).
    """

    def walk(node, name=""):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, name) for v in node)
        if (
            name not in skip
            and hasattr(node, "ndim")
            and node.ndim >= 2
            and jnp.issubdtype(node.dtype, jnp.floating)
        ):
            return quantize_weight(node, dtype)
        return node

    return walk(params)
