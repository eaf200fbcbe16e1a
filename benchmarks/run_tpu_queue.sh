#!/bin/bash
# Round-3 TPU bench queue: run once, in order, as soon as the chip answers.
# Each bench fail-fasts on a dead backend (CLAUDE.md outage protocol), so a
# mid-queue relapse aborts cleanly instead of hanging.
# Usage: bash benchmarks/run_tpu_queue.sh >> /tmp/tpu_queue.log 2>&1
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
  echo "=== $(date -u +%H:%M:%S) START: $*"
  timeout 3600 "$@"
  echo "=== $(date -u +%H:%M:%S) DONE rc=$? : $*"
}

# 1. headline fused step, post-harvest (also warms the compile cache for the
#    driver's own bench.py run; survives a mid-queue chip relapse)
run python bench.py
# 2. steady-state closed-loop tick (plan cache) -> CACHED_STEP.json
run python benchmarks/bench_cached_step.py
# 3. plan-cached sustained MC throughput -> SUSTAINED_CACHED.json
run python benchmarks/bench_sustained.py 4096 128 1200 150 64 SUSTAINED_CACHED.json cached
# 4. production-scale parameter sweep -> SWEEP.json
run python benchmarks/bench_sweep.py
# 4b. cached 256-lane scaling point: the uncached path decayed with lanes
#     (serial per-lane gathers in the big chunk step); cached ticks are row
#     selects, so the decay may vanish -> measure it
run python benchmarks/bench_sustained.py 4096 256 1200 150 128 SUSTAINED_CACHED_256.json cached
# 5. re-emit the headline JSON so it embeds the artifacts measured above
#    (steps 2-3 write the files bench.py folds in; compile cache is warm)
run python bench.py
echo "=== $(date -u +%H:%M:%S) QUEUE COMPLETE"
touch /tmp/TPU_QUEUE_DONE
