"""Test-oracle utilities: tolerance comparators and input factories.

TPU-native equivalent of the reference's llm.c test utilities
(``/root/reference/src/llm.c/common.h``):
- ``validate_result`` ~ the elementwise comparator with NaN-ignore and
  first-N-faults reporting (``common.h:80-106``);
- ``make_random`` / ``make_ones`` / ``make_iota`` ~ the host tensor factories
  (``common.h:38-74``) plus the deterministic iota/ones inputs of the
  standalone harness (``/root/reference/test.cu:615-631``).

Tolerances mirror the reference's two gates (SURVEY.md section 4): 1e-4 for
fp32 dense-config validation (``attention_forward.cu:1262``), 1e-1-class for
the randomized large-S public-API gate (``bench_flashattention.py:74``), plus
a 1e-2 BF16 gate from BASELINE.json.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "TOL_FP32",
    "TOL_BF16",
    "TOL_PUBLIC",
    "validate_result",
    "max_abs_err",
    "make_random",
    "make_iota",
    "make_ones",
]

TOL_FP32 = 1e-4   # kernel-lab gate (fp32, dense config)
TOL_BF16 = 2e-2   # BASELINE.json BF16 gate
TOL_PUBLIC = 1e-1  # public-API gate vs eager reference


def max_abs_err(got, want) -> float:
    got = np.asarray(got, dtype=np.float32)
    want = np.asarray(want, dtype=np.float32)
    return float(np.max(np.abs(got - want)))


def validate_result(got, want, tol: float, *, name: str = "tensor", max_faults: int = 10):
    """Assert elementwise |got - want| <= tol, reporting the first few faults.

    NaNs in ``want`` are ignored (treated as match), like common.h:84-86.
    """
    got = np.asarray(got, dtype=np.float32)
    want = np.asarray(want, dtype=np.float32)
    assert got.shape == want.shape, f"{name}: shape {got.shape} != {want.shape}"
    ignore = np.isnan(want)
    diff = np.abs(got - want)
    diff[ignore] = 0.0
    bad = np.argwhere(diff > tol)
    if bad.size:
        lines = [
            f"{name}: {len(bad)} elements exceed tol={tol} "
            f"(max_abs_err={diff.max():.3e})"
        ]
        for idx in bad[:max_faults]:
            t = tuple(int(i) for i in idx)
            lines.append(f"  at {t}: got={got[t]:.6f} want={want[t]:.6f}")
        raise AssertionError("\n".join(lines))


def make_random(key, shape, dtype=jnp.float32, *, lo=-1.0, hi=1.0):
    """Uniform random tensor in [lo, hi) (~ make_random_float, common.h:46)."""
    return jax.random.uniform(key, shape, jnp.float32, lo, hi).astype(dtype)


def make_iota(shape, dtype=jnp.float32, *, period: int = 97):
    """Deterministic bounded-iota input (~ test.cu:615-631 but softmax-safe:
    raw iota overflows exp at S=8192, so values repeat mod ``period``)."""
    n = int(np.prod(shape))
    return (jnp.arange(n, dtype=jnp.float32) % period).reshape(shape).astype(dtype) / period


def make_ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
