#!/bin/bash
# Round-3 TPU bench queue, part 7: re-run bench_steady.py after its sync
# fix (the [-1] eager index launched a dynamic_slice the axon error window
# rejected; now a plain leaf fetch), then the headline re-emit embedding
# STEADY.json.
# Usage: nohup setsid bash benchmarks/run_tpu_queue7.sh >> /tmp/tpu_queue7.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
  echo "=== $(date -u +%H:%M:%S) START: $*"
  timeout 3600 "$@"
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) DONE rc=$rc : $*"
}

until [ -f /tmp/TPU_QUEUE6_DONE ]; do
  echo "--- $(date -u +%H:%M:%S) waiting for queue6"
  sleep 120
done

until timeout 180 python benchmarks/probe_liveness.py; do
  echo "--- $(date -u +%H:%M:%S) chip dead, sleeping 300s"
  sleep 300
done

run python benchmarks/bench_steady.py
run python bench.py
echo "=== $(date -u +%H:%M:%S) QUEUE7 COMPLETE"
touch /tmp/TPU_QUEUE7_DONE
