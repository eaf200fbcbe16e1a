#!/bin/bash
# Round-3 TPU bench queue, part 2: the steps the 2026-08-19 morning queue
# lost to the axon host-callback gap (serving.host_jit now uses a ref-state
# effect on axon — see serving.py) plus the final bench.py re-emit.
# Usage: nohup setsid bash benchmarks/run_tpu_queue2.sh >> /tmp/tpu_queue2.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
  echo "=== $(date -u +%H:%M:%S) START: $*"
  timeout 3600 "$@"
  echo "=== $(date -u +%H:%M:%S) DONE rc=$? : $*"
}

# liveness gate first (CLAUDE.md outage protocol)
until timeout 180 python benchmarks/probe_liveness.py; do
  echo "--- $(date -u +%H:%M:%S) chip dead, sleeping 300s"
  sleep 300
done

# 3. plan-cached sustained MC throughput -> SUSTAINED_CACHED.json
run python benchmarks/bench_sustained.py 4096 128 1200 150 64 SUSTAINED_CACHED.json cached
# 4. production-scale parameter sweep -> SWEEP.json
run python benchmarks/bench_sweep.py
# 4b. cached 256-lane scaling point (did the uncached per-lane decay vanish?)
run python benchmarks/bench_sustained.py 4096 256 1200 150 128 SUSTAINED_CACHED_256.json cached
# 5. re-emit the headline JSON embedding the artifacts above (cache warm)
run python bench.py
echo "=== $(date -u +%H:%M:%S) QUEUE2 COMPLETE"
touch /tmp/TPU_QUEUE2_DONE
