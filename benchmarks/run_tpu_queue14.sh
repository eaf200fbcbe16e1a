#!/bin/bash
# Round-3 TPU bench queue, part 14: the donation probe, re-run after its
# queue11 crash (plain jax.jit host-loop repeat calls hit the jax 0.9.0
# const-drop bug on axon — INVALID_ARGUMENT on the 2nd call; the probe now
# routes through serving.host_jit / host_jit_donated like the benches do).
# Usage: nohup setsid bash benchmarks/run_tpu_queue14.sh >> /tmp/tpu_queue14.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
  echo "=== $(date -u +%H:%M:%S) START: $*"
  timeout 3600 "$@"
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) DONE rc=$rc : $*"
}

until [ -f /tmp/TPU_QUEUE13_DONE ]; do
  echo "--- $(date -u +%H:%M:%S) waiting for queue13"
  sleep 120
done

until timeout 180 python benchmarks/probe_liveness.py; do
  echo "--- $(date -u +%H:%M:%S) chip dead, sleeping 300s"
  sleep 300
done

run python benchmarks/probe_donate.py
run python benchmarks/probe_exhausted.py
echo "=== $(date -u +%H:%M:%S) QUEUE14 COMPLETE"
touch /tmp/TPU_QUEUE14_DONE
