"""Round-4 probe: PV-shaped (N=128) and QK-shaped (K=128) XLA matmul rates,
with a lane-fold sum forcing ALL output columns (no slice-DCE ambiguity).
See probe_peak.py for context.  Run: python scripts/probe_peak2.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from flashattention_tpu.utils.benchit import devtime_ms
from flashattention_tpu.utils.testing import make_random


def run(name, sa, sb, feed="a"):
    k1, k2 = jax.random.split(jax.random.key(3))
    a = make_random(k1, sa, jnp.bfloat16)
    b = make_random(k2, sb, jnp.bfloat16)
    fl = 2 * sa[0] * sa[1] * sb[1]

    if feed == "a":  # chain feeds a; fold out columns down to a's width
        @jax.jit
        def fn(a, b):
            out = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            return out.reshape(a.shape[0], -1, a.shape[1]).sum(1).astype(a.dtype)
        args = (a, b)
    else:  # chain feeds b (same shape as out); fold rows down to b's rows
        @jax.jit
        def fn(b, a):
            out = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            return out.reshape(-1, b.shape[0], b.shape[1]).sum(0).astype(b.dtype)
        args = (b, a)
    ms = devtime_ms(fn, args)
    print(f"  xla {name}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s", flush=True)


run("K=128 (4096,128)@(128,4096) forced", (4096, 128), (128, 4096))
run("K=128 (2048,128)@(128,2048) forced", (2048, 128), (128, 2048))
run("N=128 (4096,4096)@(4096,128)", (4096, 4096), (4096, 128), feed="b")
run("N=128 (2048,2048)@(2048,128)", (2048, 2048), (2048, 128), feed="b")
run("N=128 (8192,2048)@(2048,128)", (8192, 2048), (2048, 128), feed="b")
run("N=256 (4096,4096)@(4096,256)", (4096, 4096), (4096, 256), feed="b")
