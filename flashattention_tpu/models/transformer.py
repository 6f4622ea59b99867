"""Flagship model: a Llama-style decoder-only transformer on the fused kernels.

The reference exposes attention only (heads folded into batch by the caller,
``/root/reference/bench_flashattention.py:31-33``); the north star embeds it
in a real serving stack, so this module provides the model family the engine
runs: RMSNorm + RoPE + GQA attention + SwiGLU, decoder-only.

Two jittable entry points per model:
- ``prefill``: full-sequence forward on the causal flash kernel
  (``ops/flash.py``), returning logits and the per-layer K/V rows for the
  cache (the engine writes them into the paged pool);
- ``decode_step``: one-token forward over the paged KV cache
  (``ops/decode.py``) for a whole continuous batch.

Llama-7B shape (BASELINE.json config 5) = ``ModelConfig.llama7b_attention()``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from flashattention_tpu.ops.decode import (
    paged_attention,
    paged_prefill_attention,
    paged_prefill_attention_batched,
)
from flashattention_tpu.ops.dispatch import attention
from flashattention_tpu.ops.flash import BlockSizes, flash_attention

__all__ = [
    "ModelConfig",
    "init_params",
    "prefill",
    "prefill_chunk",
    "decode_step",
    "decode_loop",
    "verify_step",
    "speculative_accept",
]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 32000
    num_layers: int = 2
    d_model: int = 512
    num_q_heads: int = 8
    num_kv_heads: int = 4
    head_dim: int = 64
    intermediate: int = 1408
    rope_theta: float = 10000.0
    dtype: str = "bfloat16"
    sliding_window: int | None = None  # Mistral-style local attention
    logit_softcap: float | None = None  # Gemma-2-style score capping
    num_experts: int | None = None  # Mixtral-style MoE MLP (None = dense)
    experts_per_token: int = 2  # top-k routing when num_experts is set

    @property
    def group_size(self) -> int:
        if self.num_q_heads % self.num_kv_heads:
            raise ValueError("num_q_heads must be a multiple of num_kv_heads")
        return self.num_q_heads // self.num_kv_heads

    @property
    def jnp_dtype(self):
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[self.dtype]

    @classmethod
    def tiny(cls) -> "ModelConfig":
        return cls(
            vocab_size=256,
            num_layers=2,
            d_model=128,
            num_q_heads=4,
            num_kv_heads=2,
            head_dim=32,
            intermediate=256,
        )

    @classmethod
    def llama7b_attention(cls) -> "ModelConfig":
        """Llama-7B attention geometry (H=32, d=128; BASELINE.json config 5)."""
        return cls(
            vocab_size=32000,
            num_layers=2,  # attention-scope benchmark: 2 layers stand in
            d_model=4096,
            num_q_heads=32,
            num_kv_heads=32,
            head_dim=128,
            intermediate=11008,
        )

    # ── model-family presets (round 3) ──────────────────────────────────
    # Geometry presets for the architecture families every feature in this
    # stack exists to serve; num_layers defaults to a 2-layer slice for
    # benchmarking (pass num_layers= for the full depth).

    @classmethod
    def mistral7b(cls, num_layers: int = 2) -> "ModelConfig":
        """Mistral-7B-class: GQA 32q/8kv, d=128, sliding window 4096."""
        return cls(
            vocab_size=32000, num_layers=num_layers, d_model=4096,
            num_q_heads=32, num_kv_heads=8, head_dim=128,
            intermediate=14336, sliding_window=4096,
        )

    @classmethod
    def gemma2_9b(cls, num_layers: int = 2) -> "ModelConfig":
        """Gemma-2-9B-class: GQA 16q/8kv, d=256, logit softcaps."""
        return cls(
            vocab_size=256128, num_layers=num_layers, d_model=3584,
            num_q_heads=16, num_kv_heads=8, head_dim=256,
            intermediate=14336, sliding_window=4096, logit_softcap=50.0,
        )

    @classmethod
    def mixtral8x7b(cls, num_layers: int = 2) -> "ModelConfig":
        """Mixtral-8x7B-class: Mistral geometry + 8-expert top-2 MoE MLP."""
        return cls(
            vocab_size=32000, num_layers=num_layers, d_model=4096,
            num_q_heads=32, num_kv_heads=8, head_dim=128,
            intermediate=14336, num_experts=8, experts_per_token=2,
        )


def init_params(key: jax.Array, cfg: ModelConfig):
    """Random-init parameter pytree (scaled normal, fan-in)."""
    d, hq, hkv, hd = cfg.d_model, cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    dt = cfg.jnp_dtype

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) * fan_in**-0.5).astype(dt)

    keys = jax.random.split(key, 3 + cfg.num_layers)
    params = {
        "embed": dense(keys[0], (cfg.vocab_size, d), 1.0),
        "final_norm": jnp.ones((d,), dt),
        "lm_head": dense(keys[1], (d, cfg.vocab_size), d),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[3 + i], 8)
        layer = {
            "attn_norm": jnp.ones((d,), dt),
            "wq": dense(lk[0], (d, hq * hd), d),
            "wk": dense(lk[1], (d, hkv * hd), d),
            "wv": dense(lk[2], (d, hkv * hd), d),
            "wo": dense(lk[3], (hq * hd, d), hq * hd),
            "mlp_norm": jnp.ones((d,), dt),
        }
        if cfg.num_experts is None:
            layer.update({
                "w_gate": dense(lk[4], (d, cfg.intermediate), d),
                "w_up": dense(lk[5], (d, cfg.intermediate), d),
                "w_down": dense(lk[6], (cfg.intermediate, d), cfg.intermediate),
            })
        else:
            # Mixtral-style MoE (round 3): per-expert SwiGLU stacks with a
            # leading E dim (the axis expert parallelism shards) + a
            # replicated router.
            e = cfg.num_experts
            layer.update({
                "router": dense(lk[7], (d, e), d),
                "w_gate": dense(lk[4], (e, d, cfg.intermediate), d),
                "w_up": dense(lk[5], (e, d, cfg.intermediate), d),
                "w_down": dense(
                    lk[6], (e, cfg.intermediate, d), cfg.intermediate
                ),
            })
        params["layers"].append(layer)
    return params


def _rmsnorm(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    norm = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (norm * w.astype(jnp.float32)).astype(x.dtype)


def _rope(x, positions, theta):
    """Rotate-half RoPE. x: (..., S, H, d); positions: (..., S)."""
    d = x.shape[-1]
    freqs = 1.0 / (
        theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    )  # (d/2,)
    angles = positions[..., None].astype(jnp.float32) * freqs  # (..., S, d/2)
    cos = jnp.cos(angles)[..., None, :]  # (..., S, 1, d/2)
    sin = jnp.sin(angles)[..., None, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1
    ).astype(x.dtype)


def _mm(x, w):
    """x @ w, transparently serving weight-only-quantized leaves (round 3).

    For a :class:`~flashattention_tpu.ops.quant.QuantizedWeight` the
    per-output-channel scale applies to the (small) matmul OUTPUT —
    ``x @ (p * s) == (x @ p) * s`` in that layout — so the weight streams
    from HBM as int8 and is never re-materialized at full width."""
    from flashattention_tpu.ops.quant import QuantizedWeight

    if isinstance(w, QuantizedWeight):
        return (x @ w.payload.astype(x.dtype)) * w.scales.astype(x.dtype)
    return x @ w


def _es(spec, x, w):
    """einsum(spec, x, w) with QuantizedWeight support (expert stacks:
    scales (E, d_out) broadcast over the output's trailing dims)."""
    from flashattention_tpu.ops.quant import QuantizedWeight

    if isinstance(w, QuantizedWeight):
        return jnp.einsum(spec, x, w.payload.astype(x.dtype)) * w.scales.astype(
            x.dtype
        )
    return jnp.einsum(spec, x, w)


def _lookup(emb, tokens):
    """Embedding lookup with QuantizedWeight support: gather int8 rows,
    scale per column, restore the logical dtype."""
    from flashattention_tpu.ops.quant import QuantizedWeight

    if isinstance(emb, QuantizedWeight):
        rows = emb.payload[tokens].astype(jnp.float32) * emb.scales
        return rows.astype(emb.ldtype)
    return emb[tokens]


def _mlp(x, layer, top_k: int = 2):
    """Dense SwiGLU, or (when the layer carries a router) top-k MoE.

    The MoE path here computes EVERY expert on every token and combines the
    top-k by routing weight — exact, TP-composable (the E-stacked weights
    column/row-shard their intermediate dim like the dense MLP, the call
    sites' f/g collectives finish the partial sums), and the right choice
    for correctness paths and small-scale serving.  The sparse
    capacity-dispatch computation (only routed tokens reach an expert)
    lives in the expert-parallel training step
    (models/train.py::make_train_step_ep).
    """
    if "router" not in layer:
        gate = jax.nn.silu(_mm(x, layer["w_gate"]))
        return _mm(gate * _mm(x, layer["w_up"]), layer["w_down"])
    e = layer["router"].shape[-1]
    logits = _mm(x, layer["router"])  # (..., E)
    wk, idx = jax.lax.top_k(logits, top_k)
    wk = jax.nn.softmax(wk.astype(jnp.float32), axis=-1)
    gate = jax.nn.silu(_es("...d,edf->...ef", x, layer["w_gate"]))
    up = _es("...d,edf->...ef", x, layer["w_up"])
    ye = _es("...ef,efd->...ed", gate * up, layer["w_down"])  # (..., E, d)
    sel = jax.nn.one_hot(idx, e, dtype=wk.dtype)  # (..., k, E)
    w_e = jnp.einsum("...ke,...k->...e", sel, wk)
    return jnp.einsum("...e,...ed->...d", w_e.astype(x.dtype), ye)


def _qkv(x, layer, cfg, positions):
    b, s, _ = x.shape
    q = _mm(x, layer["wq"]).reshape(b, s, cfg.num_q_heads, cfg.head_dim)
    k = _mm(x, layer["wk"]).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    v = _mm(x, layer["wv"]).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)
    return q, k, v


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def prefill(params, tokens: jax.Array, cfg: ModelConfig, interpret=None):
    """Full-sequence forward.

    tokens: (B, S) int32.  Returns (logits (B, S, V), k_cache, v_cache) with
    k_cache/v_cache: (L, B, S, KVH, d) rows for the paged cache.
    """
    b, s = tokens.shape
    x = _lookup(params["embed"], tokens)
    positions = jnp.broadcast_to(jnp.arange(s), (b, s))
    k_rows, v_rows = [], []
    for layer in params["layers"]:
        h = _rmsnorm(x, layer["attn_norm"])
        q, k, v = _qkv(h, layer, cfg, positions)
        k_rows.append(k)
        v_rows.append(v)
        # Native GQA prefill: q heads grouped by KV head via the kernel's row
        # folding (ops.dispatch handles H != KVH) — no repeated KV heads are
        # materialized or streamed from HBM.
        # (B, S, H, d) -> (B, H, S, d); q's H axis is (KVH, G) g-major, which
        # is exactly the grouping dispatch folds.
        qf = q.transpose(0, 2, 1, 3)
        kf = k.transpose(0, 2, 1, 3)
        vf = v.transpose(0, 2, 1, 3)
        # q projection orders heads h = kvh * G + g already (contiguous
        # reshape of (B, S, KVH*G*d)), matching dispatch's (KVH, G) split.
        o = attention(
            qf, kf, vf, causal=True, scale=cfg.head_dim**-0.5,
            window=cfg.sliding_window, logit_softcap=cfg.logit_softcap,
            interpret=interpret,
        )
        o = o.transpose(0, 2, 1, 3)
        x = x + _mm(o.reshape(b, s, -1), layer["wo"])
        x = x + _mlp(_rmsnorm(x, layer["mlp_norm"]), layer, cfg.experts_per_token)
    x = _rmsnorm(x, params["final_norm"])
    logits = _mm(x, params["lm_head"])
    return logits, jnp.stack(k_rows), jnp.stack(v_rows)


def _quantize_row(x, dtype):
    """Per-token absmax quantization of (B, KVH, d) rows -> (payload, scales)."""
    qmax = 127.0 if dtype == jnp.int8 else 448.0
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scales = jnp.where(absmax == 0.0, 1.0, absmax / qmax)
    payload = x.astype(jnp.float32) / scales[..., None]
    if dtype == jnp.int8:
        payload = jnp.clip(jnp.round(payload), -qmax, qmax).astype(jnp.int8)
    else:
        payload = payload.astype(dtype)
    return payload, scales


def decode_step_impl(
    params,
    tokens: jax.Array,
    positions: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    lengths: jax.Array,
    page_indices: jax.Array,
    write_pages: jax.Array,
    write_slots: jax.Array,
    cfg: ModelConfig,
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    interpret=None,
    tp_axis: str | None = None,
):
    """Decode-step body shared by the single-device and sharded entries.

    With ``tp_axis`` set (called inside shard_map with TP-local head counts in
    ``cfg`` and Megatron column/row-sharded weights) the row-parallel output
    projections all-reduce over that axis; otherwise identical.
    """
    b = tokens.shape[0]
    x = _lookup(params["embed"], tokens)  # (B, d_model)
    x = x[:, None, :]  # (B, 1, d_model)
    pos = positions[:, None]
    quantized = k_scales is not None
    for li, layer in enumerate(params["layers"]):
        h = _rmsnorm(x, layer["attn_norm"])
        q, k, v = _qkv(h, layer, cfg, pos)  # (B, 1, H, d)
        k_row, v_row = k[:, 0], v[:, 0]  # (B, KVH, d)
        if quantized:
            k_pay, k_sc = _quantize_row(k_row, k_pages.dtype)
            v_pay, v_sc = _quantize_row(v_row, v_pages.dtype)
            # Advanced-indexing note: the integer layer index and the (B,)
            # page/slot arrays are separated by a slice, so the broadcast
            # axes land at the *front*: target shape (B, KVH, ...) — exactly
            # the row layout, no transpose needed.
            k_scales = k_scales.at[li, write_pages, :, write_slots].set(
                k_sc, mode="drop"
            )
            v_scales = v_scales.at[li, write_pages, :, write_slots].set(
                v_sc, mode="drop"
            )
        else:
            k_pay = k_row.astype(k_pages.dtype)
            v_pay = v_row.astype(v_pages.dtype)
        k_pages = k_pages.at[li, write_pages, :, write_slots, :].set(
            k_pay, mode="drop"
        )
        v_pages = v_pages.at[li, write_pages, :, write_slots, :].set(
            v_pay, mode="drop"
        )
        # (B, 1, Hq, d) -> (B, KVH, G, d) grouped layout for the paged kernel.
        qg = q[:, 0].reshape(b, cfg.num_kv_heads, cfg.group_size, cfg.head_dim)
        o = paged_attention(
            qg,
            k_pages[li],
            v_pages[li],
            lengths,
            page_indices,
            k_scales_pages=None if k_scales is None else k_scales[li],
            v_scales_pages=None if v_scales is None else v_scales[li],
            scale=cfg.head_dim**-0.5,
            window=cfg.sliding_window,
            logit_softcap=cfg.logit_softcap,
            interpret=interpret,
        )  # (B, KVH, G, d)
        o = o.reshape(b, 1, cfg.num_q_heads * cfg.head_dim)
        attn_out = _mm(o, layer["wo"])
        if tp_axis is not None:
            attn_out = jax.lax.psum(attn_out, tp_axis)
        x = x + attn_out
        mlp_out = _mlp(_rmsnorm(x, layer["mlp_norm"]), layer, cfg.experts_per_token)
        if tp_axis is not None:
            mlp_out = jax.lax.psum(mlp_out, tp_axis)
        x = x + mlp_out
    x = _rmsnorm(x[:, 0], params["final_norm"])
    logits = _mm(x, params["lm_head"])
    return logits, k_pages, v_pages, k_scales, v_scales


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "interpret"),
    donate_argnums=(3, 4),
    donate_argnames=("k_scales", "v_scales"),
)
def decode_step(
    params,
    tokens: jax.Array,  # (B,) int32 current tokens
    positions: jax.Array,  # (B,) int32 positions (= old length) of those tokens
    k_pages: jax.Array,  # (L, P, KVH, ps, d) head-major, donated
    v_pages: jax.Array,  # donated
    lengths: jax.Array,  # (B,) int32 *including* the current token
    page_indices: jax.Array,  # (B, pages_per_seq)
    write_pages: jax.Array,  # (B,) physical page receiving this token's K/V
    write_slots: jax.Array,  # (B,) slot within that page
    cfg: ModelConfig,
    k_scales: jax.Array | None = None,  # (L, P, KVH, ps) when quantized
    v_scales: jax.Array | None = None,
    interpret=None,
):
    """One decode token for a whole continuous batch over the paged cache.

    The current token's K/V rows are computed layer-by-layer inside this jit
    and scattered into the (donated) page pools *before* the layer's paged
    attention runs, so the token attends to itself (lengths include it).
    Inactive batch slots: point write_pages at an out-of-range page (dropped).

    Returns (logits (B, V), k_pages, v_pages, k_scales, v_scales) — the
    updated pools (scales None when not quantized).
    """
    return decode_step_impl(
        params, tokens, positions, k_pages, v_pages, lengths, page_indices,
        write_pages, write_slots, cfg, k_scales, v_scales, interpret,
    )




@functools.partial(
    jax.jit,
    static_argnames=("cfg", "interpret"),
    donate_argnums=(3, 4),
    donate_argnames=("k_scales", "v_scales"),
)
def verify_step(
    params,
    tokens: jax.Array,  # (B, k) — [current token, draft_1 .. draft_{k-1}]
    positions: jax.Array,  # (B,) position of tokens[:, 0]
    k_pages: jax.Array,  # (L, P, KVH, ps, d) head-major, donated
    v_pages: jax.Array,
    page_indices: jax.Array,  # (B, pages_per_seq) covering positions + k
    write_pages: jax.Array,  # (B, k) page per fed token
    write_slots: jax.Array,  # (B, k)
    cfg: ModelConfig,
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    interpret=None,
):
    """Speculative-decoding verification: score k fed tokens in ONE pass.

    Feeds ``tokens[:, j]`` at positions ``positions + j`` (scattering their
    K/V like decode does) and returns logits (B, k, V): ``logits[:, j]``
    is the model's next-token distribution AFTER token j — compare against
    the drafts with :func:`speculative_accept`.  Attention runs the paged
    decode kernel with ``draft_k=k`` (per-row causal offsets), so
    verification costs one decode-bandwidth sweep of the KV cache instead
    of k sequential steps.

    Rejected drafts' K/V rows land in the cache; the caller MUST trim the
    sequence back to the accepted length (the engine's recompute machinery:
    ``cache.trim``) before the next step.
    """
    b, kk = tokens.shape
    x = _lookup(params["embed"], tokens.reshape(-1)).reshape(b, kk, -1)
    pos = positions[:, None] + jnp.arange(kk)[None]  # (B, k)
    lengths = positions + kk  # includes every fed token
    quantized = k_scales is not None
    for li, layer in enumerate(params["layers"]):
        h = _rmsnorm(x, layer["attn_norm"])
        q, k, v = _qkv(h, layer, cfg, pos)  # (B, k, H, d)
        k_rows = k.reshape(b * kk, cfg.num_kv_heads, cfg.head_dim)
        v_rows = v.reshape(b * kk, cfg.num_kv_heads, cfg.head_dim)
        wp = write_pages.reshape(-1)
        ws = write_slots.reshape(-1)
        if quantized:
            k_pay, k_sc = _quantize_row(k_rows, k_pages.dtype)
            v_pay, v_sc = _quantize_row(v_rows, v_pages.dtype)
            k_scales = k_scales.at[li, wp, :, ws].set(k_sc, mode="drop")
            v_scales = v_scales.at[li, wp, :, ws].set(v_sc, mode="drop")
        else:
            k_pay = k_rows.astype(k_pages.dtype)
            v_pay = v_rows.astype(v_pages.dtype)
        k_pages = k_pages.at[li, wp, :, ws, :].set(k_pay, mode="drop")
        v_pages = v_pages.at[li, wp, :, ws, :].set(v_pay, mode="drop")
        # (B, k, H, d) -> (B, KVH, G*k, d) k-minor per query group.
        qg = (
            q.reshape(b, kk, cfg.num_kv_heads, cfg.group_size, cfg.head_dim)
            .transpose(0, 2, 3, 1, 4)
            .reshape(b, cfg.num_kv_heads, cfg.group_size * kk, cfg.head_dim)
        )
        o = paged_attention(
            qg,
            k_pages[li],
            v_pages[li],
            lengths,
            page_indices,
            k_scales_pages=None if k_scales is None else k_scales[li],
            v_scales_pages=None if v_scales is None else v_scales[li],
            scale=cfg.head_dim**-0.5,
            draft_k=kk,
            window=cfg.sliding_window,
            logit_softcap=cfg.logit_softcap,
            interpret=interpret,
        )  # (B, KVH, G*k, d)
        o = (
            o.reshape(b, cfg.num_kv_heads, cfg.group_size, kk, cfg.head_dim)
            .transpose(0, 3, 1, 2, 4)
            .reshape(b, kk, cfg.num_q_heads * cfg.head_dim)
        )
        x = x + _mm(o, layer["wo"])
        x = x + _mlp(_rmsnorm(x, layer["mlp_norm"]), layer, cfg.experts_per_token)
    x = _rmsnorm(x, params["final_norm"])
    logits = _mm(x, params["lm_head"])
    return logits, k_pages, v_pages, k_scales, v_scales


def speculative_accept(drafts: jax.Array, logits: jax.Array):
    """Greedy accept/reject for speculative decoding.

    drafts: (B, k-1) proposed tokens d_1..d_{k-1} (the continuations of the
    k tokens fed to :func:`verify_step`); logits: (B, k, V) from it.
    Greedy acceptance: d_j is accepted iff it equals argmax(logits[:, j-1]);
    the first mismatch is replaced by the model's own argmax.  Returns
    (n_emitted (B,), emitted (B, k)): for each row, ``emitted[:n_emitted]``
    are the tokens to append — the accepted prefix plus the model's
    correction/extension token (so 1 <= n_emitted <= k).
    """
    b, km1 = drafts.shape
    preds = jnp.argmax(logits, axis=-1).astype(drafts.dtype)  # (B, k)
    match = preds[:, :km1] == drafts  # (B, k-1)
    n_accept = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
    # Emit the accepted drafts then the model's token at the first mismatch
    # (or its extension token if everything matched).
    idx = jnp.arange(km1 + 1)[None]
    emitted = jnp.where(
        idx < n_accept[:, None],
        jnp.pad(drafts, ((0, 0), (0, 1))),
        jnp.take_along_axis(preds, jnp.minimum(n_accept, km1)[:, None], axis=1),
    )
    return n_accept + 1, emitted


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "interpret", "temperature", "top_k", "top_p"),
    donate_argnums=(3, 4),
    donate_argnames=("k_scales", "v_scales"),
)
def decode_loop(
    params,
    tokens: jax.Array,  # (B,) int32 current tokens
    positions: jax.Array,  # (B,) int32 positions of those tokens
    k_pages: jax.Array,  # (L, P, KVH, ps, d) head-major, donated
    v_pages: jax.Array,
    page_indices: jax.Array,  # (B, pages_per_seq) — fixed tables covering
    #   positions + n_steps tokens
    cfg: ModelConfig,
    n_steps: int = 1,
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    active: jax.Array | None = None,
    sample_key: jax.Array | None = None,
    temperature: float = 1.0,
    top_k: int | None = None,
    top_p: float | None = None,
    interpret=None,
):
    """``n_steps`` decode tokens in ONE jit: a ``fori_loop`` over the full
    model step (:func:`decode_step`), each iteration feeding its next token
    back in and scattering K/V into the (donated) page pools.

    ``active``: optional (B,) bool — padded batch rows marked False never
    write to the pools (their derived write page is clamped out of range, so
    the scatter drops; their reads hit table row values harmlessly).

    ``sample_key`` (round 3; VERDICT #8): None -> greedy argmax.  Otherwise a
    PRNG key threaded through the loop: each iteration splits it exactly like
    the engine's per-token path (``key, sub = split(key)``; one batch-wide
    categorical draw per step from the temperature/top-k/top-p-filtered
    logits), so a ``decode_loop`` over n steps consumes the SAME key stream
    and produces the SAME tokens as n per-token engine steps — non-greedy
    serving amortizes host work without changing its sampling semantics.

    This is both the honest on-chip serving-throughput measurement (host-
    driven step loops are unmeasurable over remote-TPU tunnels — every step
    would pay a network round trip) and a serving fast path: fixed page
    tables + a known token budget (e.g. speculative drafting, fixed-length
    generation) amortize ALL host work over n_steps tokens.

    Page tables must pre-cover the whole span; write locations derive from
    the running position (page_indices[b, pos // ps], pos % ps).

    Returns (tokens (B, n_steps) generated, k_pages, v_pages, k_scales,
    v_scales); with ``sample_key`` set, additionally the advanced key as a
    sixth element (store it back to continue the stream).
    """
    from flashattention_tpu.ops.sampling import sample_logits

    ps = k_pages.shape[3]
    b = tokens.shape[0]
    out0 = jnp.zeros((b, max(n_steps, 1)), jnp.int32)
    sampled = sample_key is not None
    key0 = sample_key if sampled else jax.random.key(0)

    def body(i, carry):
        toks, pos, kp, vp, ks, vs, out, key = carry
        write_pages = jnp.take_along_axis(
            page_indices, (pos // ps)[:, None], axis=1
        )[:, 0]
        if active is not None:
            write_pages = jnp.where(active, write_pages, k_pages.shape[1])
        logits, kp, vp, ks, vs = decode_step_impl(
            params, toks, pos, kp, vp, pos + 1, page_indices,
            write_pages, pos % ps, cfg, ks, vs, interpret,
        )
        if sampled:
            key, sub = jax.random.split(key)
            nxt = sample_logits(
                sub, logits, temperature=temperature, top_k=top_k, top_p=top_p
            ).astype(jnp.int32)
        else:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, pos + 1, kp, vp, ks, vs, out.at[:, i].set(nxt), key)

    _, _, k_pages, v_pages, k_scales, v_scales, out, key = jax.lax.fori_loop(
        0, n_steps, body,
        (tokens, positions, k_pages, v_pages, k_scales, v_scales, out0, key0),
    )
    if sampled:
        return out, k_pages, v_pages, k_scales, v_scales, key
    return out, k_pages, v_pages, k_scales, v_scales


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "interpret"),
    donate_argnums=(2, 3),
    donate_argnames=("k_scales", "v_scales"),
)
def prefill_chunk(
    params,
    tokens: jax.Array,  # (T,) int32 — one request's next T prompt tokens
    k_pages: jax.Array,  # (L, P, KVH, ps, d) head-major, donated
    v_pages: jax.Array,
    positions: jax.Array,  # (T,) int32 absolute positions of the tokens
    page_indices: jax.Array,  # (n_ctx_pages,) pages covering [0, ctx) so far
    write_pages: jax.Array,  # (T,) page receiving each token's K/V
    write_slots: jax.Array,  # (T,) slot within that page
    cfg: ModelConfig,
    k_scales: jax.Array | None = None,  # (L, P, KVH, ps) when quantized
    v_scales: jax.Array | None = None,
    ctx_len: jax.Array | int | None = None,  # live context tokens (<= capacity)
    interpret=None,
):
    """One chunk of a chunked prefill (single request).

    The serving engine processes long prompts in fixed-size chunks: each call
    scatters the chunk's K/V into the paged pools, then attends the chunk's
    queries against the *gathered* context pages (prefix + this chunk) with a
    causal mask offset — activation memory stays O(T * ctx) instead of
    O(prompt^2), and a chunk boundary is a natural preemption/scheduling
    point (the continuous-batching norm).

    Contract: ``page_indices`` is a fixed-capacity table (pad entries may be
    any valid page index — their tokens are masked out); ``ctx_len`` is the
    number of LIVE context tokens (prefix + this chunk) and may be a traced
    scalar.  It rides the flash kernel's scalar-prefetch path together with
    the causal offset, so chunked prefill compiles ONE program per
    (capacity-bucket, chunk) shape instead of one per chunk index (round 2;
    VERDICT #6).  When ``ctx_len`` is None the whole table is live (the
    pre-round-2 exact-table behavior).  T must be a multiple of page_size.

    Cost note: the flash kernel skips compute AND DMA past ``ctx_len``, but
    the page *gather* (``k_pages[li][page_indices]``) materializes the full
    capacity-sized context first, so right after a bucket boundary up to
    ~2x the live context's bytes move through HBM in the gather — the price
    of the O(log) compile count.  Folding the gather into the kernel via
    prefetched page indices (a paged prefill kernel, like ops/decode.py)
    would remove it; designated follow-up.

    Returns (logits (T, V), k_pages, v_pages, k_scales, v_scales).
    """
    (t,) = tokens.shape
    ps = k_pages.shape[3]
    ctx = page_indices.shape[0] * ps  # static capacity of the table
    if ctx_len is None:
        ctx_len = ctx
    ctx_len = jnp.asarray(ctx_len, jnp.int32)
    if ctx < t:
        raise ValueError(
            f"page_indices covers {ctx} tokens < chunk size {t}; it must span "
            "the full context including this chunk"
        )
    quantized = k_scales is not None
    x = _lookup(params["embed"], tokens)[None]  # (1, T, d_model)
    pos = positions[None]
    g = cfg.group_size
    kvh = cfg.num_kv_heads
    for li, layer in enumerate(params["layers"]):
        h = _rmsnorm(x, layer["attn_norm"])
        q, k, v = _qkv(h, layer, cfg, pos)  # (1, T, H, d)
        k_rows, v_rows = k[0], v[0]  # (T, KVH, d)
        if quantized:
            k_pay, k_sc = _quantize_row(k_rows, k_pages.dtype)
            v_pay, v_sc = _quantize_row(v_rows, v_pages.dtype)
            k_scales = k_scales.at[li, write_pages, :, write_slots].set(
                k_sc, mode="drop"
            )
            v_scales = v_scales.at[li, write_pages, :, write_slots].set(
                v_sc, mode="drop"
            )
        else:
            k_pay = k_rows.astype(k_pages.dtype)
            v_pay = v_rows.astype(v_pages.dtype)
        k_pages = k_pages.at[li, write_pages, :, write_slots, :].set(
            k_pay, mode="drop"
        )
        v_pages = v_pages.at[li, write_pages, :, write_slots, :].set(
            v_pay, mode="drop"
        )
        # Attend DIRECTLY over the page pool (round 2, second pass): the
        # paged prefill kernel streams pages via prefetched table indices —
        # no capacity-sized gather, pages past ctx_len skipped (compute and
        # DMA).  See ops.decode.paged_prefill_attention.
        tpad = -(-t // 128) * 128
        qf = q[0].transpose(1, 0, 2).reshape(kvh, g, t, cfg.head_dim)
        if tpad != t:
            qf = jnp.pad(qf, ((0, 0), (0, 0), (0, tpad - t), (0, 0)))
        qf = qf.reshape(kvh, g * tpad, cfg.head_dim)
        o = paged_prefill_attention(
            qf.astype(x.dtype),
            k_pages[li],
            v_pages[li],
            page_indices,
            ctx_len,
            chunk=t,
            seg=tpad,
            k_scales_pages=k_scales[li] if quantized else None,
            v_scales_pages=v_scales[li] if quantized else None,
            scale=cfg.head_dim**-0.5,
            window=cfg.sliding_window,
            logit_softcap=cfg.logit_softcap,
            interpret=interpret,
        )  # (KVH, G*tpad, d)
        o = o.reshape(kvh, g, tpad, cfg.head_dim)[:, :, :t]
        o = (
            o.reshape(kvh * g, t, cfg.head_dim)
            .transpose(1, 0, 2)
            .reshape(1, t, cfg.num_q_heads * cfg.head_dim)
        )
        x = x + _mm(o, layer["wo"])
        x = x + _mlp(_rmsnorm(x, layer["mlp_norm"]), layer, cfg.experts_per_token)
    x = _rmsnorm(x[0], params["final_norm"])
    logits = _mm(x, params["lm_head"])
    return logits, k_pages, v_pages, k_scales, v_scales


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "interpret"),
    donate_argnums=(2, 3),
    donate_argnames=("k_scales", "v_scales"),
)
def prefill_chunk_batched(
    params,
    tokens: jax.Array,  # (B, T) int32 — one chunk per request
    k_pages: jax.Array,  # (L, P, KVH, ps, d) head-major, donated
    v_pages: jax.Array,
    positions: jax.Array,  # (B, T) int32 absolute positions per request
    page_tables: jax.Array,  # (B, n_ctx_pages) per-request context tables
    write_pages: jax.Array,  # (B, T) page receiving each token's K/V
    write_slots: jax.Array,  # (B, T) slot within that page
    cfg: ModelConfig,
    k_scales: jax.Array | None = None,
    v_scales: jax.Array | None = None,
    ctx_lens: jax.Array | None = None,  # (B,) live context incl. this chunk
    interpret=None,
):
    """One chunk step for MANY requests in one dispatch (round 3).

    :func:`prefill_chunk` with a batch dim: the engine's chunked prefills
    previously ran one request per dispatch — on a tunneled host each chunk
    paid a full round trip, and a small chunk left the MXU in ramp-up.  Here
    B requests (padded to a power-of-two bucket) share every layer matmul
    ((B*T, d_model) GEMMs) and ONE batched paged-attention kernel
    (:func:`~flashattention_tpu.ops.decode.paged_prefill_attention_batched`)
    with per-request page tables and causal anchors riding scalar prefetch.

    Dummy rows (batch padding): ``ctx_lens[b] = 0`` with ``write_pages``
    pointing at the out-of-range trash index — scatters drop, attention
    skips every page, logits row is garbage the engine never reads.

    Same contracts as :func:`prefill_chunk` otherwise; T must be a multiple
    of page_size; each request's ``page_tables`` row covers [0, ctx_b).
    """
    b, t = tokens.shape
    ps = k_pages.shape[3]
    ctx_cap = page_tables.shape[1] * ps
    if ctx_lens is None:
        raise ValueError("prefill_chunk_batched requires per-request ctx_lens")
    ctx_lens = jnp.asarray(ctx_lens, jnp.int32)
    if ctx_cap < t:
        raise ValueError(
            f"page_tables cover {ctx_cap} tokens < chunk size {t}; they must "
            "span the full context including this chunk"
        )
    quantized = k_scales is not None
    x = _lookup(params["embed"], tokens)  # (B, T, d_model)
    g = cfg.group_size
    kvh = cfg.num_kv_heads
    for li, layer in enumerate(params["layers"]):
        h = _rmsnorm(x, layer["attn_norm"])
        q, k, v = _qkv(h, layer, cfg, positions)  # (B, T, H, d)
        k_rows, v_rows = k, v  # (B, T, KVH, d)
        if quantized:
            k_pay, k_sc = _quantize_row(k_rows, k_pages.dtype)
            v_pay, v_sc = _quantize_row(v_rows, v_pages.dtype)
            k_scales = k_scales.at[li, write_pages, :, write_slots].set(
                k_sc, mode="drop"
            )
            v_scales = v_scales.at[li, write_pages, :, write_slots].set(
                v_sc, mode="drop"
            )
        else:
            k_pay = k_rows.astype(k_pages.dtype)
            v_pay = v_rows.astype(v_pages.dtype)
        k_pages = k_pages.at[li, write_pages, :, write_slots, :].set(
            k_pay, mode="drop"
        )
        v_pages = v_pages.at[li, write_pages, :, write_slots, :].set(
            v_pay, mode="drop"
        )
        tpad = -(-t // 128) * 128
        # (B, T, H, d) -> (B, KVH, G * tpad, d) folded GQA segments.
        qf = q.transpose(0, 2, 1, 3).reshape(b, kvh, g, t, cfg.head_dim)
        if tpad != t:
            qf = jnp.pad(qf, ((0, 0), (0, 0), (0, 0), (0, tpad - t), (0, 0)))
        qf = qf.reshape(b, kvh, g * tpad, cfg.head_dim)
        o = paged_prefill_attention_batched(
            qf.astype(x.dtype),
            k_pages[li],
            v_pages[li],
            page_tables,
            ctx_lens,
            chunk=t,
            seg=tpad,
            k_scales_pages=k_scales[li] if quantized else None,
            v_scales_pages=v_scales[li] if quantized else None,
            scale=cfg.head_dim**-0.5,
            window=cfg.sliding_window,
            logit_softcap=cfg.logit_softcap,
            interpret=interpret,
        )  # (B, KVH, G*tpad, d)
        o = o.reshape(b, kvh, g, tpad, cfg.head_dim)[:, :, :, :t]
        o = (
            o.reshape(b, kvh * g, t, cfg.head_dim)
            .transpose(0, 2, 1, 3)
            .reshape(b, t, cfg.num_q_heads * cfg.head_dim)
        )
        x = x + _mm(o, layer["wo"])
        x = x + _mlp(_rmsnorm(x, layer["mlp_norm"]), layer, cfg.experts_per_token)
    # 2D final stage: (B*T, dm) @ (dm, V) reduces element-wise identically to
    # the single-request path's (T, dm) @ (dm, V), keeping batched prefill
    # bitwise-equal to N single dispatches (a 3D matmul may tile the
    # contraction differently at bf16 and flip greedy argmax near ties).
    x2 = _rmsnorm(x.reshape(b * t, -1), params["final_norm"])
    logits = (x2 @ params["lm_head"]).reshape(b, t, -1)
    return logits, k_pages, v_pages, k_scales, v_scales
