"""Round-4 probe: the PRACTICAL bf16 matmul peak of this chip.

probe_d128b/c showed every attention-kernel variant at d=128 saturates near
~150 TF/s (76% of the 197 TF/s v5e nameplate) regardless of matmul form
(nt/nn), PV splitting, V transposition, or p dtype — and an all-ones V runs
7% faster than random data, the signature of data-dependent power/clock
behavior rather than a scheduling defect.

This probe measures what XLA ITSELF achieves on plain dense matmuls of
increasing arithmetic intensity, plus data-distribution sensitivity.  If
XLA's best sustained dense-matmul rate is ~X TF/s, then X — not 197 — is the
honest ceiling for ceiling_frac accounting at d>=128.

Run: python scripts/probe_peak.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flashattention_tpu.utils.benchit import devtime_ms
from flashattention_tpu.utils.testing import make_random


def mm(n_out):
    @jax.jit
    def fn(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )[:n_out].astype(a.dtype).reshape(n_out, -1)

    return fn


def batched(bh, m, k, n):
    @jax.jit
    def fn(a, b):
        out = jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return out[:, :, : a.shape[2]].astype(a.dtype).reshape(a.shape)

    return fn


def main():
    key = jax.random.key(0)
    # Square dense matmuls, output truncated to the LHS shape so the
    # devtime_ms chain can feed back (the slice's HBM cost is accounted).
    for n in (2048, 4096, 8192):
        k1, k2 = jax.random.split(jax.random.key(n))
        a = make_random(k1, (n, n), jnp.bfloat16)
        b = make_random(k2, (n, n), jnp.bfloat16)
        fl = 2 * n * n * n
        ms = devtime_ms(mm(n), (a, b))
        print(f"  xla mm {n}x{n}x{n} rand : {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s",
              flush=True)
    # Data sensitivity at 8192: ones vs random vs tiny-magnitude.
    n = 8192
    fl = 2 * n * n * n
    for name, mk in (
        ("ones", lambda kk: jnp.ones((n, n), jnp.bfloat16)),
        ("small", lambda kk: make_random(kk, (n, n), jnp.bfloat16) * 0.01),
    ):
        k1, k2 = jax.random.split(jax.random.key(1))
        a, b = mk(k1), mk(k2)
        ms = devtime_ms(mm(n), (a, b))
        print(f"  xla mm {n} {name:5}     : {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s",
              flush=True)
    # Batched, attention-like operand shapes (the QK^T of the Llama-7B row).
    bh, m, k, n2 = 128, 2048, 128, 2048
    ka, kb = jax.random.split(jax.random.key(2))
    a = make_random(ka, (bh, m, k), jnp.bfloat16)
    b = make_random(kb, (bh, k, n2), jnp.bfloat16)
    fl = 2 * bh * m * k * n2
    ms = devtime_ms(batched(bh, m, k, n2), (a, b))
    print(f"  xla bmm qk-shape      : {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s",
          flush=True)


def skinny():
    """Skinny (attention-shaped) single matmuls: where does XLA top out?

    QK^T is K=128-deep; PV is N=128-wide.  If these cap well below the
    square-matmul 196.5 TF/s, the d=128 attention ceiling is shape-bound.
    """
    shapes = [
        ("K=128  (4096,128)@(128,4096)", (4096, 128), (128, 4096)),
        ("K=128  (8192,128)@(128,8192)", (8192, 128), (128, 8192)),
        ("K=256  (4096,256)@(256,4096)", (4096, 256), (256, 4096)),
        ("K=512  (4096,512)@(512,4096)", (4096, 512), (512, 4096)),
        ("N=128  (4096,4096)@(4096,128)", (4096, 4096), (4096, 128)),
        ("N=128  (8192,8192)@(8192,128)", (8192, 8192), (8192, 128)),
    ]
    for name, sa, sb in shapes:
        k1, k2 = jax.random.split(jax.random.key(3))
        a = make_random(k1, sa, jnp.bfloat16)
        b = make_random(k2, sb, jnp.bfloat16)
        fl = 2 * sa[0] * sa[1] * sb[1]

        @jax.jit
        def fn(a, b):
            out = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out[: a.shape[0], : a.shape[1]].astype(a.dtype)

        ms = devtime_ms(fn, (a, b))
        print(f"  xla {name}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "skinny":
        skinny()
    else:
        main()
