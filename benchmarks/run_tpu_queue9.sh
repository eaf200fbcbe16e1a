#!/bin/bash
# Round-3 TPU bench queue, part 9: re-run bench_steady.py after its host_jit
# fix (plain jax.jit dropped the const buffers on the 2nd call — jax 0.9.0
# C++ fast-path bug, serving.host_jit docstring), then the headline re-emit
# embedding STEADY.json.
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

until [ -f /tmp/TPU_QUEUE8_DONE ]; do
  echo "--- $(date -u +%H:%M:%S) waiting for queue8"
  sleep 120
done

until timeout 180 python benchmarks/probe_liveness.py; do
  echo "--- $(date -u +%H:%M:%S) chip dead, sleeping 300s"
  sleep 300
done

run python benchmarks/bench_steady.py
run python bench.py
echo "=== $(date -u +%H:%M:%S) QUEUE9 COMPLETE"
touch /tmp/TPU_QUEUE9_DONE
