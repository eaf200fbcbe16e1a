#!/bin/bash
# Round-3 TPU bench queue, part 4: plan-cached sustained artifacts with the
# dead-row begin gating, a 512-lane scaling point (the cached path has no
# per-tick lockstep A* tail, so the uncached "256 decays" conclusion may
# reverse — the pre-gating 256-lane point already recorded 99.64/s), and the
# headline re-emit.
# Usage: nohup setsid bash benchmarks/run_tpu_queue4.sh >> /tmp/tpu_queue4.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
  echo "=== $(date -u +%H:%M:%S) START: $*"
  timeout 3600 "$@"
  echo "=== $(date -u +%H:%M:%S) DONE rc=$? : $*"
}

until timeout 180 python benchmarks/probe_liveness.py; do
  echo "--- $(date -u +%H:%M:%S) chip dead, sleeping 300s"
  sleep 300
done

run python benchmarks/bench_sustained.py 4096 128 1200 150 64 SUSTAINED_CACHED.json cached
run python benchmarks/bench_sustained.py 4096 256 1200 150 128 SUSTAINED_CACHED_256.json cached
run python benchmarks/bench_sustained.py 4096 512 1200 150 128 SUSTAINED_CACHED_512.json cached
run python bench.py
echo "=== $(date -u +%H:%M:%S) QUEUE4 COMPLETE"
touch /tmp/TPU_QUEUE4_DONE
