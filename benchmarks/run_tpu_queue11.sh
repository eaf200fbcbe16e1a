#!/bin/bash
# Round-3 TPU bench queue, part 11: the donation probe — is the 1.27 ms
# noop frame HBM copies of the carried planes through the top-level cond
# (fixable by donate_argnums aliasing) or real gate compute?
# Usage: nohup setsid bash benchmarks/run_tpu_queue11.sh >> /tmp/tpu_queue11.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
  echo "=== $(date -u +%H:%M:%S) START: $*"
  timeout 3600 "$@"
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) DONE rc=$rc : $*"
}

until [ -f /tmp/TPU_QUEUE10_DONE ]; do
  echo "--- $(date -u +%H:%M:%S) waiting for queue10"
  sleep 120
done

until timeout 180 python benchmarks/probe_liveness.py; do
  echo "--- $(date -u +%H:%M:%S) chip dead, sleeping 300s"
  sleep 300
done

run python benchmarks/probe_donate.py
echo "=== $(date -u +%H:%M:%S) QUEUE11 COMPLETE"
touch /tmp/TPU_QUEUE11_DONE
