#!/bin/bash
# Liveness watcher: poll the TPU every 5 min; the moment it answers, run the
# round-3 bench queue once. Survives axon outages (CLAUDE.md protocol).
# Usage: bash benchmarks/watch_and_run_queue.sh >> /tmp/tpu_watch.log 2>&1
set -u
cd /root/repo
while true; do
  echo "--- $(date -u +%H:%M:%S) probing chip"
  if timeout 180 python benchmarks/probe_liveness.py; then
    echo "--- $(date -u +%H:%M:%S) chip ALIVE, running queue"
    bash benchmarks/run_tpu_queue.sh
    exit 0
  fi
  echo "--- $(date -u +%H:%M:%S) chip dead (rc=$?), sleeping 300s"
  sleep 300
done
