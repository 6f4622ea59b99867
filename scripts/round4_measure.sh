#!/bin/bash
# Round-4 TPU measurement queue. Runs the full backlog, saving outputs under
# measurements/.  With --watch, polls the chip until real COMPUTE works
# (jax.devices() can enumerate while the tunnel is compute-dead), then fires.
# Safe to re-run; each step is independent and logged.
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
log() { echo "== $1 ($(date +%H:%M:%S)) =="; }

chip_ok() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
assert float((x @ x).sum()) > 0
print('chip compute ok')
" >/dev/null 2>&1
}

if [ "${1:-}" = "--watch" ]; then
  log "watching for TPU compute"
  # Require TWO consecutive healthy checks: the tunnel flaps while
  # recovering, and a single success followed by a failed re-check aborted
  # the first round-4 watch run.
  ok=0
  until [ "$ok" -ge 2 ]; do
    if chip_ok; then
      ok=$((ok + 1))
      echo "  chip healthy ($ok/2 checks, $(date +%H:%M:%S))"
      sleep 30
    else
      ok=0
      echo "  chip still compute-dead ($(date +%H:%M:%S)); retry in 300s"
      sleep 300
    fi
  done
  log "chip is back"
else
  chip_ok || { echo "TPU compute dead; aborting"; exit 1; }
fi

log "selftest (21-check compiled gate)"
timeout 2400 python -m flashattention_tpu.utils.selftest 2>&1 \
  | tee measurements/selftest_r4.txt

log "pv_split sweep at d=64 (headline shapes)"
timeout 2400 python scripts/probe_pvsplit_d64.py 2>&1 \
  | tee measurements/probe_pvsplit_d64.txt

log "backward block sweep per head_dim"
timeout 3000 python scripts/tune_bwd.py 2>&1 | tee measurements/tune_bwd.txt

log "bench_all (benchmarks.json regeneration)"
timeout 3000 python scripts/bench_all.py 2>&1 | tee measurements/bench_all_r4.log

log "bench_train (training MFU)"
timeout 2400 python bench_train.py 2>&1 | tee measurements/bench_train.txt

log "bench_serving (kv x weight dtype grid)"
timeout 3000 python bench_serving.py 2>&1 | tee measurements/bench_serving.txt

log "lab ladder"
timeout 3000 python lab.py 2>&1 | tee measurements/lab_ladder.txt

log "headline bench x3 (variance)"
for i in 1 2 3; do
  timeout 1800 python bench.py 2>&1 | tail -1
done | tee measurements/bench_headline_variance.txt

log "done — see measurements/"

log "small-shape fp32 decomposition"
timeout 2400 python scripts/probe_small_fp32.py 2>&1 \
  | tee measurements/probe_small_fp32.txt

log "backlog complete"
