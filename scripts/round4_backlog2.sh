#!/bin/bash
# Round-4 second backlog pass: the items the 00:39-01:04 run did not finish
# (bench_all died on a transient tunnel read error mid-decode-suite;
# bench_serving's log cut off; lab ladder / headline variance /
# probe_small_fp32 never started).  Each step independent + logged.
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
log() { echo "== $1 ($(date +%H:%M:%S)) =="; }

log "bench_all (benchmarks.json regeneration)"
timeout 3000 python scripts/bench_all.py 2>&1 | tee measurements/bench_all_r4.log

log "bench_serving (kv x weight dtype grid)"
timeout 3000 python bench_serving.py 2>&1 | tee measurements/bench_serving.txt

log "small-shape fp32 decomposition"
timeout 2400 python scripts/probe_small_fp32.py 2>&1 \
  | tee measurements/probe_small_fp32.txt

log "lab ladder"
timeout 3000 python lab.py 2>&1 | tee measurements/lab_ladder.txt

log "headline bench x3 (variance)"
for i in 1 2 3; do
  timeout 1800 python bench.py 2>&1 | tail -1
done | tee measurements/bench_headline_variance.txt

log "backlog complete"
