#!/bin/bash
# Round-3 TPU measurement queue: run everything that was blocked by the
# tunnel outage, saving outputs under measurements/.  Safe to re-run; each
# step is independent and logged.  Expected total: ~30-50 min (remote
# compiles are 20-60 s each).
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
log() { echo "== $1 ($(date +%H:%M:%S)) =="; }

log "tunnel check"
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "TPU unreachable; aborting"; exit 1; }

log "bench.py (headline + compiled selftest)"
timeout 1800 python bench.py 2>&1 | tee measurements/bench_headline.txt

log "bench_all (benchmarks.json regeneration)"
timeout 2400 python scripts/bench_all.py 2>&1 | tee measurements/bench_all.log

log "probe_d128 (pipeline decomposition)"
timeout 1800 python scripts/probe_d128.py 2>&1 | tee measurements/probe_d128.txt

log "bench_train (training MFU)"
timeout 1800 python bench_train.py 2>&1 | tee measurements/bench_train.txt

log "bench_serving (kv x weight dtype grid)"
timeout 2400 python bench_serving.py 2>&1 | tee measurements/bench_serving.txt

log "dropout/segments overhead"
timeout 1200 python - 2>&1 <<'EOF' | tee measurements/overhead.txt
import jax, jax.numpy as jnp, json
from flashattention_tpu.ops.flash import flash_attention
from flashattention_tpu.utils.benchit import devtime_ms
from flashattention_tpu.utils.testing import make_random
ks = jax.random.split(jax.random.key(0), 3)
q, k, v = (make_random(kk, (16, 8192, 64), jnp.bfloat16) for kk in ks)
base = devtime_ms(lambda q, k, v: flash_attention(q, k, v, causal=True), (q, k, v))
drop = devtime_ms(lambda q, k, v: flash_attention(
    q, k, v, causal=True, dropout_rate=0.1, dropout_seed=7), (q, k, v))
segs = jnp.zeros((16, 8192), jnp.int32).at[:, 4096:].set(1)
seg = devtime_ms(lambda q, k, v: flash_attention(
    q, k, v, causal=True, q_segment_ids=segs, kv_segment_ids=segs), (q, k, v))
print(json.dumps({
    "causal_bf16_ms": round(base, 3),
    "with_dropout_ms": round(drop, 3),
    "dropout_overhead_pct": round((drop / base - 1) * 100, 1),
    "with_segments_ms": round(seg, 3),
    "segments_overhead_pct": round((seg / base - 1) * 100, 1),
}))
EOF

log "done — see measurements/"
