"""L3 distribution tests on a virtual 8-device CPU mesh.

The key assertion (SURVEY.md section 4 "implication for the build"): ring
attention over N devices == the single-kernel output, verifiable in CI via
``xla_force_host_platform_device_count``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashattention_tpu.ops.reference import attention_reference
from flashattention_tpu.parallel.ring import make_ring_attention, merge_partials
from flashattention_tpu.parallel.sharded import (
    make_allgather_cp_attention,
    make_data_parallel_attention,
    make_reduce_cp_attention,
)
from flashattention_tpu.utils.testing import TOL_FP32, make_random, validate_result


def mesh_1d(n, name):
    return Mesh(np.array(jax.devices()[:n]), (name,))


def qkv(shape, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    return tuple(make_random(k, shape) for k in ks)


def test_merge_partials_identity():
    # Merging a partial with the empty partial returns the partial.
    q, k, v = qkv((2, 8, 4), seed=0)
    from flashattention_tpu.ops.reference import attention_reference_with_stats

    o, l, m = attention_reference_with_stats(q, k, v)
    o0 = jnp.zeros_like(o)
    l0 = jnp.zeros_like(l)
    m0 = jnp.full_like(m, -jnp.inf)
    om, lm, mm = merge_partials(o0, l0, m0, o, l, m)
    validate_result(om, o, 1e-6)
    validate_result(lm, l, 1e-5)


def test_merge_partials_split_equals_full():
    # Splitting KV in two and merging partials == dense attention.
    from flashattention_tpu.ops.reference import attention_reference_with_stats

    q, k, v = qkv((2, 16, 8), seed=1)
    o1, l1, m1 = attention_reference_with_stats(q, k[:, :8], v[:, :8])
    o2, l2, m2 = attention_reference_with_stats(q, k[:, 8:], v[:, 8:])
    om, _, _ = merge_partials(o1, l1, m1, o2, l2, m2)
    want = attention_reference(q, k, v)
    validate_result(om, want, 1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_single_kernel(causal):
    n = 4
    mesh = mesh_1d(n, "sp")
    bh, s, d = 2, 512, 32
    q, k, v = qkv((bh, s, d), seed=2)
    fn = make_ring_attention(mesh, axis_name="sp", causal=causal)
    o = fn(q, k, v)
    want = attention_reference(q, k, v, causal=causal)
    validate_result(o, want, TOL_FP32)


def test_ring_attention_8way():
    n = 8
    mesh = mesh_1d(n, "sp")
    bh, s, d = 1, 1024, 32
    q, k, v = qkv((bh, s, d), seed=3)
    fn = make_ring_attention(mesh, axis_name="sp", causal=True)
    o = fn(q, k, v)
    want = attention_reference(q, k, v, causal=True)
    validate_result(o, want, TOL_FP32)


@pytest.mark.parametrize("causal", [False, True])
def test_data_parallel_attention(causal):
    mesh = mesh_1d(8, "dp")
    bh, s, d = 16, 256, 32
    q, k, v = qkv((bh, s, d), seed=4)
    fn = make_data_parallel_attention(mesh, axes=("dp",), causal=causal)
    o = fn(q, k, v)
    want = attention_reference(q, k, v, causal=causal)
    validate_result(o, want, TOL_FP32)


@pytest.mark.parametrize("causal", [False, True])
def test_allgather_cp_attention(causal):
    mesh = mesh_1d(4, "sp")
    bh, s, d = 2, 512, 32
    q, k, v = qkv((bh, s, d), seed=5)
    fn = make_allgather_cp_attention(mesh, axis_name="sp", causal=causal)
    o = fn(q, k, v)
    want = attention_reference(q, k, v, causal=causal)
    validate_result(o, want, TOL_FP32)


def test_reduce_cp_attention():
    mesh = mesh_1d(4, "sp")
    bh, s, d = 2, 512, 32
    q, k, v = qkv((bh, s, d), seed=6)
    fn = make_reduce_cp_attention(mesh, axis_name="sp")
    o = fn(q, k, v)
    want = attention_reference(q, k, v)
    validate_result(o, want, TOL_FP32)


def test_ring_2d_mesh_dp_x_sp():
    # Combined: BH sharded over dp, S sharded over sp on a 2x4 mesh.
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    bh, s, d = 4, 512, 32
    q, k, v = qkv((bh, s, d), seed=7)
    fn = make_ring_attention(mesh, axis_name="sp", causal=True, batch_axis="dp")
    o = fn(q, k, v)
    want = attention_reference(q, k, v, causal=True)
    validate_result(o, want, TOL_FP32)
