"""Compiled-kernel (Mosaic) differential gate — run on a TPU host (VERDICT #9).

The rest of the suite runs the Pallas interpreter on a virtual CPU mesh;
these tests re-run the same kernel-vs-oracle checks with ``interpret=False``
through the Mosaic compiler, catching layout / clamping / scalar-prefetch
divergence the interpreter cannot.  Usage::

    pytest tests/test_compiled.py -m tpu      # on a TPU host

They are deselected by default (``addopts = -m 'not tpu'``) so the CPU CI
suite never attempts a compiled Pallas call, and skipped defensively if the
backend turns out not to be an accelerator.  The same battery also runs on
every driver bench (``bench.py`` → ``utils/selftest.run``) so each round's
``BENCH_r{N}.json`` records a compiled-mode pass.
"""

import pytest

import jax

from flashattention_tpu.utils import selftest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def _require_accelerator():
    if jax.default_backend() == "cpu":
        pytest.skip("compiled-kernel gate needs a real accelerator backend")


@pytest.mark.parametrize("check", selftest.CHECKS, ids=lambda f: f.__name__)
def test_compiled(check):
    check()
