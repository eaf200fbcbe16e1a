#!/bin/bash
# Round-3 TPU bench queue, part 13: the last cached scaling point — all
# 4096 rollouts in flight at once (batch == total, refill still retires
# lanes at chunk boundaries) — then the final headline re-emit.
# Usage: nohup setsid bash benchmarks/run_tpu_queue13.sh >> /tmp/tpu_queue13.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
  echo "=== $(date -u +%H:%M:%S) START: $*"
  timeout 3600 "$@"
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) DONE rc=$rc : $*"
}

until [ -f /tmp/TPU_QUEUE12_DONE ]; do
  echo "--- $(date -u +%H:%M:%S) waiting for queue12"
  sleep 120
done

until timeout 180 python benchmarks/probe_liveness.py; do
  echo "--- $(date -u +%H:%M:%S) chip dead, sleeping 300s"
  sleep 300
done

run python benchmarks/bench_sustained.py 4096 4096 1200 150 128 SUSTAINED_CACHED_4096.json cached
run python bench.py
echo "=== $(date -u +%H:%M:%S) QUEUE13 COMPLETE"
touch /tmp/TPU_QUEUE13_DONE
