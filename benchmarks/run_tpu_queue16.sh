#!/bin/bash
# Round-3 TPU bench queue, part 16: re-measure the sustained Monte-Carlo
# artifacts after the yaw-wrap docking-deadlock fix (engine._move_robot).
# Expectation: the 13 deterministic budget-exhausted lanes complete, so
# SUSTAINED*.json move to 4096/4096, and realism completion rises by
# whatever share of its 2187 exhaustions were the same deadlock.
# Usage: nohup setsid bash benchmarks/run_tpu_queue16.sh >> /tmp/tpu_queue16.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
  echo "=== $(date -u +%H:%M:%S) START: $*"
  timeout 3600 "$@"
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) DONE rc=$rc : $*"
}

until timeout 180 python benchmarks/probe_liveness.py; do
  echo "--- $(date -u +%H:%M:%S) chip dead, sleeping 300s"
  sleep 300
done

run python benchmarks/bench_sustained.py 4096 4096 1200 150 128 SUSTAINED_CACHED_4096.json cached
run python benchmarks/bench_sustained.py 4096 1024 1200 150 128 SUSTAINED_REALISM.json cached realism
run python benchmarks/bench_sustained.py 4096 128 1200 150 128 SUSTAINED.json
run python bench.py
echo "=== $(date -u +%H:%M:%S) QUEUE16 COMPLETE"
touch /tmp/TPU_QUEUE16_DONE
