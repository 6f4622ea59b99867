"""DP x TP training steps: plain SGD, optax, and packed-sequence variants.

Split out of the former models/train.py monolith (round 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from flashattention_tpu.models.transformer import ModelConfig
from flashattention_tpu.models.train.common import _make_step, packed_positions, param_specs
from flashattention_tpu.models.train.forward import _make_grad_map


def make_train_step(
    mesh: Mesh,
    cfg: ModelConfig,
    *,
    dp: str = "dp",
    tp: str = "tp",
    lr: float = 1e-3,
    attn_dropout: float | None = None,
    remat: bool = False,
    vocab_parallel: bool = False,
    compute_dtype=None,
):
    """Jitted (params, tokens) -> (loss, new_params) SGD step over the mesh.

    tokens: (B, S) int32 sharded over dp; params sharded per param_specs.
    Next-token causal-LM cross-entropy; grads pmean-ed over dp.

    With ``attn_dropout`` the step takes an extra ``seed`` argument
    (per-step int32; pass the step counter) driving the fused kernel's
    attention dropout: ``step(params, tokens, seed)``.

    ``remat=True`` checkpoints each layer (jax.checkpoint): activation
    memory O(1) in depth at ~1/3 extra FLOPs — bitwise-identical loss and
    gradients (pinned by tests/test_train.py).
    """
    grad_map = _make_grad_map(
        mesh, cfg, dp=dp, tp=tp, attn_dropout=attn_dropout, remat=remat,
        vocab_parallel=vocab_parallel, compute_dtype=compute_dtype,
    )

    @jax.jit
    def step(params, tokens, seed=0):
        loss, grads = grad_map(params, tokens, jnp.asarray(seed, jnp.int32))
        new_params = jax.tree.map(
            lambda p, g: p - lr * g.astype(p.dtype), params, grads
        )
        return loss, new_params

    return step


def make_train_step_optax(
    mesh: Mesh,
    cfg: ModelConfig,
    optimizer,
    *,
    dp: str = "dp",
    tp: str = "tp",
    attn_dropout: float | None = None,
    remat: bool = False,
    vocab_parallel: bool = False,
    compute_dtype=None,
):
    """DP x TP training step with an arbitrary optax optimizer (round 2).

    Same sharded forward/backward as :func:`make_train_step` (Megatron f/g
    TP, pmean-ed DP grads), but the parameter update runs OUTSIDE shard_map
    through ``optimizer.update`` — the optimizer state tree (e.g. AdamW's
    mu/nu moments) mirrors the parameter tree, so GSPMD shards it exactly
    like the parameters with no per-state spec plumbing.

    Usage::

        opt = optax.adamw(3e-4, weight_decay=0.01)
        step = make_train_step_optax(mesh, cfg, opt)
        opt_state = jax.jit(opt.init)(params)   # params already sharded
        loss, params, opt_state = step(params, opt_state, tokens)
    """
    grad_map = _make_grad_map(
        mesh, cfg, dp=dp, tp=tp, attn_dropout=attn_dropout, remat=remat,
        vocab_parallel=vocab_parallel, compute_dtype=compute_dtype,
    )

    @jax.jit
    def step(params, opt_state, tokens, seed=0):
        loss, grads = grad_map(params, tokens, jnp.asarray(seed, jnp.int32))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        new_params = jax.tree.map(
            lambda p, u: (p + u.astype(p.dtype)), params, updates
        )
        return loss, new_params, opt_state

    return step


def make_train_step_packed(
    mesh: Mesh,
    cfg: ModelConfig,
    *,
    dp: str = "dp",
    tp: str = "tp",
    lr: float = 1e-3,
    attn_dropout: float | None = None,
    optimizer=None,
    remat: bool = False,
    vocab_parallel: bool = False,
    compute_dtype=None,
):
    """DP x TP training step over PACKED rows (round 3).

    ``step(params, tokens, segment_ids[, seed]) -> (loss, new_params)``:
    each row packs multiple documents marked by ``segment_ids`` (negative =
    padding).  Attention cannot cross document boundaries (kernel-level
    segment masking, ops/flash.py), RoPE positions restart per document
    (:func:`packed_positions`), and the loss masks out cross-document and
    padding targets — the packed step computes, token for token, what each
    document would get in its own row, with zero pad-token attention FLOPs
    wasted on real rows' budgets.  Loss = masked mean over valid next-token
    targets, globally weighted across DP shards by valid-token count.
    """
    grad_map = _make_grad_map(
        mesh, cfg, dp=dp, tp=tp, attn_dropout=attn_dropout, packed=True,
        remat=remat, vocab_parallel=vocab_parallel,
        compute_dtype=compute_dtype,
    )

    def grad_call(params, tokens, segment_ids, seed=0):
        return grad_map(
            params, tokens, segment_ids, jnp.asarray(seed, jnp.int32)
        )

    return _make_step(grad_call, lr, optimizer)


