#!/bin/bash
# Round-3 TPU bench queue, part 15 (post VM-restart 2026-08-20): the
# donation probe that queue14 never got to run (the 07:43 restart wiped
# /tmp markers), then a fresh headline bench re-emit so BENCH reflects
# any round-3 closing fixes.
# Usage: nohup setsid bash benchmarks/run_tpu_queue15.sh >> /tmp/tpu_queue15.log 2>&1 &
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

run python benchmarks/probe_donate.py
run python bench.py
echo "=== $(date -u +%H:%M:%S) QUEUE15 COMPLETE"
touch /tmp/TPU_QUEUE15_DONE
