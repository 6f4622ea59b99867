"""Token sampling ops: temperature / top-k / top-p and speculative accept.

Shared by the serving engine (per-token sampling), the jitted multi-token
decode loop (``models/transformer.decode_loop`` threads a PRNG key through
its ``fori_loop`` so non-greedy serving amortizes host work too), and the
sampled speculative-decoding accept rule (round 3; VERDICT #8).

The reference has no sampling subsystem (its harness compares raw attention
outputs); this is framework scope beyond parity, designed jit-first: every
op is batch-shaped pure jnp with static filter parameters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "filter_logits",
    "sample_logits",
    "speculative_accept_sampled",
]


def filter_logits(logits, *, temperature, top_k, top_p):
    """Temperature + top-k + top-p (nucleus) filtering over the last axis.

    Filters compose in the standard order (top-k first, then nucleus over the
    survivors); filtered-out logits are set to -inf so a categorical draw (or
    softmax) renormalizes over the kept set.  All-jnp, batch-shaped (..., V).
    """
    logits = logits.astype(jnp.float32) / temperature
    if top_k is not None and top_k < logits.shape[-1]:
        # lax.top_k is O(V log k) vs a full O(V log V) vocab sort — this runs
        # inside every jitted decode step under sampled serving.
        kth = jax.lax.top_k(logits, top_k)[0][..., -1, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        desc = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(desc, axis=-1)
        # Keep a sorted token iff the mass strictly before it is < top_p; the
        # top-1 token is always kept (its exclusive prefix mass is 0).
        keep = (jnp.cumsum(probs, axis=-1) - probs) < top_p
        cutoff = jnp.min(
            jnp.where(keep, desc, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


def sample_logits(key, logits, *, temperature, top_k, top_p):
    """One categorical draw per batch row from the filtered distribution."""
    return jax.random.categorical(
        key, filter_logits(logits, temperature=temperature, top_k=top_k, top_p=top_p),
        axis=-1,
    )


@functools.partial(jax.jit, static_argnames=("temperature", "top_k", "top_p"))
def speculative_accept_sampled(
    key, drafts: jax.Array, logits: jax.Array, *, temperature, top_k, top_p
):
    """Rejection-sampling accept for speculative decoding with SAMPLED serving.

    drafts: (B, k-1) proposed tokens; logits: (B, k, V) target-model scores
    from ``verify_step``.  The engine's draft sources (small greedy model,
    n-gram/prompt lookup) are *deterministic* proposals, i.e. a point-mass
    draft distribution q = delta(d).  Specializing the standard speculative
    rejection rule (accept w.p. min(1, p/q); on reject resample from
    norm(max(0, p - q))) to a point mass gives an EXACT sampler for the
    filtered target p at every position:

    - accept draft d_j w.p. p_j(d_j)  (u ~ U[0,1) < p);
    - on first rejection at j, emit a correction drawn from p_j with d_j
      masked out, renormalized  (= norm(max(0, p - delta_d)));
    - if all k-1 drafts accept, emit a bonus token drawn from p_{k-1}.

    Marginally each emitted token is distributed exactly as sequential
    sampling from the filtered target: P(d) + (1-P(d)) * P(x)/(1-P(d)) for
    x != d recomposes p.  p is the temperature/top-k/top-p *filtered*
    distribution — the same one per-token serving samples.

    Returns (n_emitted (B,), emitted (B, k)) with the same contract as the
    greedy ``transformer.speculative_accept``: ``emitted[:n_emitted]`` are
    the tokens to append, 1 <= n_emitted <= k.
    """
    b, km1 = drafts.shape
    filt = filter_logits(
        logits, temperature=temperature, top_k=top_k, top_p=top_p
    )  # (B, k, V)
    probs = jax.nn.softmax(filt, axis=-1)
    p_d = jnp.take_along_axis(
        probs[:, :km1], drafts[..., None].astype(jnp.int32), axis=-1
    )[..., 0]  # (B, k-1)
    ku, kc = jax.random.split(key)
    u = jax.random.uniform(ku, (b, km1))
    acc = u < p_d  # (B, k-1); a filtered-out draft has p=0 -> always rejects
    n_accept = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)
    # Correction/bonus position: the first rejected index (== n_accept), or
    # k-1 when everything accepted (the bonus draw).
    corr_logits = jnp.take_along_axis(
        filt, n_accept[:, None, None], axis=1
    )[:, 0]  # (B, V)
    rejected = n_accept < km1
    d_rej = jnp.take_along_axis(
        drafts, jnp.minimum(n_accept, km1 - 1)[:, None], axis=1
    )[:, 0]
    vocab_ids = jnp.arange(filt.shape[-1])[None]
    corr_logits = jnp.where(
        rejected[:, None] & (vocab_ids == d_rej[:, None]), -jnp.inf, corr_logits
    )
    corr = jax.random.categorical(kc, corr_logits, axis=-1).astype(drafts.dtype)
    idx = jnp.arange(km1 + 1)[None]
    emitted = jnp.where(
        idx < n_accept[:, None],
        jnp.pad(drafts, ((0, 0), (0, 1))),
        corr[:, None],
    )
    return n_accept + 1, emitted
