#!/bin/bash
# Round-3 TPU bench queue, part 6: the production parameter sweep with the
# re-chosen (non-null) knob grid — trim_safety_distance x
# virtual_seed_interval x sm_semi_dist, 8 configs x 512 paired seeds,
# plan-cached at 256 lanes (SWEEP.json); a 1024-lane cached sustained
# scaling point (the 128/256/512 curve is still rising: 77.5/96.0/110.2);
# and the headline re-emit so bench.py embeds the best points.
# NOTE: "rc=" is captured BEFORE the date substitution — $(date) inside the
# same echo clobbers $? (bit every earlier queue's DONE line; artifacts were
# always inspected directly so nothing was misread).
# Usage: nohup setsid bash benchmarks/run_tpu_queue6.sh >> /tmp/tpu_queue6.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
  echo "=== $(date -u +%H:%M:%S) START: $*"
  timeout 3600 "$@"
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) DONE rc=$rc : $*"
}

until [ -f /tmp/TPU_QUEUE5_DONE ]; do
  echo "--- $(date -u +%H:%M:%S) waiting for queue5"
  sleep 120
done

until timeout 180 python benchmarks/probe_liveness.py; do
  echo "--- $(date -u +%H:%M:%S) chip dead, sleeping 300s"
  sleep 300
done

run python benchmarks/bench_sweep.py 512 256 1200 SWEEP.json cached
run python benchmarks/bench_sustained.py 4096 1024 1200 150 128 SUSTAINED_CACHED_1024.json cached
run python bench.py
echo "=== $(date -u +%H:%M:%S) QUEUE6 COMPLETE"
touch /tmp/TPU_QUEUE6_DONE
