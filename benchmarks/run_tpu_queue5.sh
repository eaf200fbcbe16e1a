#!/bin/bash
# Round-3 TPU bench queue, part 5: the composed steady-state serving
# artifact (benchmarks/bench_steady.py -> STEADY.json) — one jitted scan of
# the production serving loop (incremental level-0 gates + plan-cached
# ticks) at the reference's own map/control cadence, reporting amortized
# device ms per control tick. Runs after queue4's timed benches so CPU
# contention can't inflate either measurement, then re-emits bench.py so
# the headline JSON embeds STEADY.json.
# Usage: nohup setsid bash benchmarks/run_tpu_queue5.sh >> /tmp/tpu_queue5.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
  echo "=== $(date -u +%H:%M:%S) START: $*"
  timeout 3600 "$@"
  echo "=== $(date -u +%H:%M:%S) DONE rc=$? : $*"
}

until [ -f /tmp/TPU_QUEUE4_DONE ]; do
  echo "--- $(date -u +%H:%M:%S) waiting for queue4"
  sleep 120
done

until timeout 180 python benchmarks/probe_liveness.py; do
  echo "--- $(date -u +%H:%M:%S) chip dead, sleeping 300s"
  sleep 300
done

run python benchmarks/bench_steady.py
run python bench.py
echo "=== $(date -u +%H:%M:%S) QUEUE5 COMPLETE"
touch /tmp/TPU_QUEUE5_DONE
