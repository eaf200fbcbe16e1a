#!/bin/bash
# Round-3 TPU bench queue, part 3: regenerate the plan-cached sustained
# artifacts after the 3-level-vmap miscompile fix (lax.map rows in
# plan/plancache.py — see ROUND3.md "late find"), then re-emit bench.py's
# headline JSON so it embeds the corrected numbers.
# Usage: nohup setsid bash benchmarks/run_tpu_queue3.sh >> /tmp/tpu_queue3.log 2>&1 &
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

# evidence probe: records the miscompile verdict per vmap width
run python benchmarks/probe_vmap_nest_miscompile.py
# corrected plan-cached sustained artifacts
run python benchmarks/bench_sustained.py 4096 128 1200 150 64 SUSTAINED_CACHED.json cached
run python benchmarks/bench_sustained.py 4096 256 1200 150 128 SUSTAINED_CACHED_256.json cached
# headline re-emit with the corrected embedded artifacts
run python bench.py
echo "=== $(date -u +%H:%M:%S) QUEUE3 COMPLETE"
touch /tmp/TPU_QUEUE3_DONE
