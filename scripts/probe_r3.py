"""Round-3 quick re-measure of the headline prefill rows + accuracy check."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flashattention_tpu.ops.flash import BlockSizes, flash_attention
from flashattention_tpu.ops.reference import attention_reference
from flashattention_tpu.utils.benchit import attention_flops, devtime_ms
from flashattention_tpu.utils.testing import make_random


def run(name, bh, s, d, dtype, causal=False, bs=None):
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (make_random(kk, (bh, s, d), dtype) for kk in ks)
    fl = attention_flops(bh, s, s, d, causal=causal)
    ms = devtime_ms(
        lambda q, k, v: flash_attention(q, k, v, causal=causal, block_sizes=bs),
        (q, k, v),
    )
    # max-abs-err vs oracle on a small slice of heads (oracle is O(S^2) HBM).
    sl = slice(0, min(bh, 4))
    got = flash_attention(q[sl], k[sl], v[sl], causal=causal, block_sizes=bs)
    want = attention_reference(q[sl], k[sl], v[sl], causal=causal)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    print(
        f"{name}: {ms:7.3f} ms  {fl/ms/1e9:6.1f} TF/s  maxerr={err:.2e}",
        flush=True,
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "d128"):
        run("llama7b d128 (new fit)", 128, 2048, 128, jnp.bfloat16)
    if which in ("all", "d64"):
        run("bf16 d64 S=8192", 16, 8192, 64, jnp.bfloat16)
    if which in ("all", "causal"):
        run("bf16 causal S=8192", 16, 8192, 64, jnp.bfloat16, causal=True)
    # q_row_split experiment: measured 1/2/4-way on llama7b-d128 and the
    # d64 headline -> monotonic loss (1.99/2.09/2.37 and 3.35/3.46/3.69 ms);
    # the knob was removed from the kernel (see ops/flash.py note).
