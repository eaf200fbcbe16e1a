#!/bin/bash
# Round-3 TPU bench queue, part 10: sustained MC on REALISM worlds (curved
# rows 0.8 m bow + 15% tree dropout — orchards.py knobs) at the cached
# production setting, recording honest completion on harder geometry; then
# the headline re-emit.
# Usage: nohup setsid bash benchmarks/run_tpu_queue10.sh >> /tmp/tpu_queue10.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
  echo "=== $(date -u +%H:%M:%S) START: $*"
  timeout 3600 "$@"
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) DONE rc=$rc : $*"
}

until [ -f /tmp/TPU_QUEUE9_DONE ]; do
  echo "--- $(date -u +%H:%M:%S) waiting for queue9"
  sleep 120
done

until timeout 180 python benchmarks/probe_liveness.py; do
  echo "--- $(date -u +%H:%M:%S) chip dead, sleeping 300s"
  sleep 300
done

run python benchmarks/bench_sustained.py 4096 1024 1200 150 128 SUSTAINED_REALISM.json cached realism
run python bench.py
echo "=== $(date -u +%H:%M:%S) QUEUE10 COMPLETE"
touch /tmp/TPU_QUEUE10_DONE
