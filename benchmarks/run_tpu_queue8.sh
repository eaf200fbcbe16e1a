#!/bin/bash
# Round-3 TPU bench queue, part 8: continue the cached sustained scaling
# curve (128/256/512/1024 measured 77.5/96.0/110.2/127.5 — still rising) to
# 2048 lanes, and probe chunk_steps 300 at 1024 lanes (fewer chunk
# boundaries = fewer host refill round-trips; budget 1200 % 300 == 0), then
# the headline re-emit.
# Usage: nohup setsid bash benchmarks/run_tpu_queue8.sh >> /tmp/tpu_queue8.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
  echo "=== $(date -u +%H:%M:%S) START: $*"
  timeout 3600 "$@"
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) DONE rc=$rc : $*"
}

until [ -f /tmp/TPU_QUEUE7_DONE ]; do
  echo "--- $(date -u +%H:%M:%S) waiting for queue7"
  sleep 120
done

until timeout 180 python benchmarks/probe_liveness.py; do
  echo "--- $(date -u +%H:%M:%S) chip dead, sleeping 300s"
  sleep 300
done

run python benchmarks/bench_sustained.py 4096 2048 1200 150 128 SUSTAINED_CACHED_2048.json cached
run python benchmarks/bench_sustained.py 4096 1024 1200 300 128 SUSTAINED_CACHED_1024_CS300.json cached
run python bench.py
echo "=== $(date -u +%H:%M:%S) QUEUE8 COMPLETE"
touch /tmp/TPU_QUEUE8_DONE
