"""L0 oracle self-tests: the pure-jnp reference against closed-form cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_tpu.ops.reference import (
    attention_reference,
    attention_reference_with_stats,
    causal_mask,
)
from flashattention_tpu.utils.testing import TOL_FP32, make_random, validate_result


def test_uniform_v_identity():
    # With V = const rows, output must equal those rows for any Q/K.
    key = jax.random.key(0)
    q = make_random(key, (2, 16, 8))
    k = make_random(jax.random.key(1), (2, 16, 8))
    v = jnp.broadcast_to(jnp.arange(8, dtype=jnp.float32), (2, 16, 8))
    o = attention_reference(q, k, v)
    validate_result(o, v, TOL_FP32)


def test_one_hot_scores_select_rows():
    # Huge scale turns softmax into argmax row-selection of V.
    s = 8
    q = jnp.eye(s, dtype=jnp.float32)[None]
    k = jnp.eye(s, dtype=jnp.float32)[None]
    v = jnp.arange(s * 4, dtype=jnp.float32).reshape(1, s, 4)
    o = attention_reference(q, k, v, scale=1e4)
    validate_result(o, v, 1e-3)


def test_causal_first_row_is_v0():
    key = jax.random.key(2)
    q = make_random(key, (3, 12, 16))
    k = make_random(jax.random.key(3), (3, 12, 16))
    v = make_random(jax.random.key(4), (3, 12, 16))
    o = attention_reference(q, k, v, causal=True)
    # Row 0 attends only to key 0 -> output == v[:, 0].
    validate_result(o[:, 0], v[:, 0], TOL_FP32)


def test_stats_consistency():
    # exp(m) * l must equal sum(exp(s)) computed densely.
    key = jax.random.key(5)
    q = make_random(key, (1, 8, 4))
    k = make_random(jax.random.key(6), (1, 8, 4))
    v = make_random(jax.random.key(7), (1, 8, 4))
    o, l, m = attention_reference_with_stats(q, k, v)
    s = jnp.einsum("bqd,bkd->bqk", q, k, precision="highest")
    dense = jnp.sum(jnp.exp(s), axis=-1)
    validate_result(jnp.exp(m) * l, dense, 1e-3)


def test_kv_len_masking_matches_truncation():
    key = jax.random.key(8)
    q = make_random(key, (2, 8, 4))
    k = make_random(jax.random.key(9), (2, 10, 4))
    v = make_random(jax.random.key(10), (2, 10, 4))
    o_masked = attention_reference(q, k, v, kv_len=7)
    o_trunc = attention_reference(q, k[:, :7], v[:, :7])
    validate_result(o_masked, o_trunc, TOL_FP32)


def test_q_offset_matches_suffix():
    # Causal attention of the last 4 queries == suffix of full causal run.
    key = jax.random.key(11)
    q = make_random(key, (1, 12, 8))
    k = make_random(jax.random.key(12), (1, 12, 8))
    v = make_random(jax.random.key(13), (1, 12, 8))
    full = attention_reference(q, k, v, causal=True)
    suffix = attention_reference(q[:, 8:], k, v, causal=True, q_offset=8)
    validate_result(suffix, full[:, 8:], TOL_FP32)


def test_causal_mask_shape():
    m = causal_mask(4, 6, q_offset=2)
    want = np.tril(np.ones((6, 6), bool))[2:]
    np.testing.assert_array_equal(np.asarray(m), want)
