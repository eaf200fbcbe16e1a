#!/bin/bash
# Liveness watcher: poll the TPU every 5 min; the moment it answers, run
# the given queue file once (run_tpu_queue.sh). Survives axon outages
# (CLAUDE.md protocol).
# Usage: nohup setsid bash benchmarks/watch_and_run_queue.sh benchmarks/q_r4a.txt r4a \
#          >> /tmp/tpu_watch_r4a.log 2>&1 &
set -u
cd /root/repo
CMDFILE="${1:?usage: watch_and_run_queue.sh CMDFILE [TAG]}"
TAG="${2:-$(basename "$CMDFILE" .txt)}"
while true; do
  echo "--- $(date -u +%H:%M:%S) [$TAG] probing chip"
  if timeout 180 python benchmarks/probe_liveness.py; then
    echo "--- $(date -u +%H:%M:%S) [$TAG] chip ALIVE, running queue"
    bash benchmarks/run_tpu_queue.sh "$CMDFILE" "$TAG"
    exit 0
  fi
  echo "--- $(date -u +%H:%M:%S) [$TAG] chip dead (rc=$?), sleeping 300s"
  sleep 300
done
