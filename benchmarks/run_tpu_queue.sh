#!/bin/bash
# Parameterized TPU bench queue (VERDICT r3 #8: replaces the 16 one-off
# run_tpu_queueN.sh scripts). Waits for chip liveness (bounded), then runs
# the given commands in order, each under a timeout, logging start/stop/rc.
#
# Usage:
#   bash benchmarks/run_tpu_queue.sh CMDFILE [TAG]
#     CMDFILE: text file, one shell command per line (# comments allowed)
#     TAG:     label for the log lines / done-marker (default: basename)
#   or, for ad-hoc single commands:
#   bash benchmarks/run_tpu_queue.sh -c 'python bench.py' [TAG]
#
# Typical: nohup setsid bash benchmarks/run_tpu_queue.sh q.txt r4 \
#            >> /tmp/tpu_queue_r4.log 2>&1 &
# Each bench fail-fasts on a dead backend mid-queue (CLAUDE.md outage
# protocol); the liveness gate only guards the start.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

if [ "${1:-}" = "-c" ]; then
  CMDS=("$2")
  TAG="${3:-adhoc}"
else
  CMDFILE="${1:?usage: run_tpu_queue.sh CMDFILE|-c CMD [TAG]}"
  TAG="${2:-$(basename "$CMDFILE" .txt)}"
  mapfile -t CMDS < <(grep -v '^\s*#' "$CMDFILE" | grep -v '^\s*$')
fi

run() {
  echo "=== $(date -u +%H:%M:%S) [$TAG] START: $*"
  timeout 3600 bash -c "$*"
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) [$TAG] DONE rc=$rc : $*"
}

# bounded liveness wait (the queue analogue of bench.py's _wait_chip_alive);
# override with QUEUE_WAIT_BOUND_S (default 6 h). Past the bound, write a
# FAILED marker and exit nonzero so "still waiting" and "gave up" are
# distinguishable from the done-marker alone.
BOUND="${QUEUE_WAIT_BOUND_S:-21600}"
waited=0
until timeout 180 python benchmarks/probe_liveness.py; do
  if [ "$waited" -ge "$BOUND" ]; then
    echo "=== $(date -u +%H:%M:%S) [$TAG] chip dead past ${BOUND}s bound - giving up"
    touch "/tmp/TPU_QUEUE_${TAG}_FAILED"
    exit 17
  fi
  echo "--- $(date -u +%H:%M:%S) [$TAG] chip dead (${waited}s waited), sleeping 300s"
  sleep 300
  waited=$((waited + 300))
done

for c in "${CMDS[@]}"; do
  run "$c"
done
echo "=== $(date -u +%H:%M:%S) [$TAG] QUEUE COMPLETE"
touch "/tmp/TPU_QUEUE_${TAG}_DONE"
