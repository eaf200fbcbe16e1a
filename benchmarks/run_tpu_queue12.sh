#!/bin/bash
# Round-3 TPU bench queue, part 12: diagnose the 13 budget-exhausted
# rollouts (probe_exhausted.py -> EXHAUSTED.json): slow missions or stuck?
# Usage: nohup setsid bash benchmarks/run_tpu_queue12.sh >> /tmp/tpu_queue12.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
  echo "=== $(date -u +%H:%M:%S) START: $*"
  timeout 3600 "$@"
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) DONE rc=$rc : $*"
}

until [ -f /tmp/TPU_QUEUE11_DONE ]; do
  echo "--- $(date -u +%H:%M:%S) waiting for queue11"
  sleep 120
done

until timeout 180 python benchmarks/probe_liveness.py; do
  echo "--- $(date -u +%H:%M:%S) chip dead, sleeping 300s"
  sleep 300
done

run python benchmarks/probe_exhausted.py
echo "=== $(date -u +%H:%M:%S) QUEUE12 COMPLETE"
touch /tmp/TPU_QUEUE12_DONE
