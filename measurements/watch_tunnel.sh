#!/bin/bash
cd /root/repo
for i in $(seq 1 200); do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tunnel UP at $(date)" >> measurements/watch.log
    bash scripts/round3_measure.sh >> measurements/watch.log 2>&1
    echo "measurements DONE at $(date)" >> measurements/watch.log
    exit 0
  fi
  echo "poll $i: down $(date)" >> measurements/watch.log
  sleep 240
done
