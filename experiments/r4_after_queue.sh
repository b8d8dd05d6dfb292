#!/bin/bash
# Post-queue validation: once the r4 retrain queue exits, run the full
# bench (all lanes: parity gates, smoke, configs, mfu, long-L, ingest)
# on the live chip so the round's bench surface is validated before the
# driver's own run.
set -u
cd /root/repo

QPID=$(cat /tmp/r4_queue.pid)
while kill -0 "$QPID" 2>/dev/null; do
  sleep 120
done
echo "[after] queue exited $(date -u +%H:%M:%S)"

for attempt in 1 2 3; do
  if timeout 3000 python bench.py > /tmp/bench_r4_final.json 2>/tmp/bench_r4_final.log; then
    echo "[after] bench OK"
    break
  fi
  echo "[after] bench attempt $attempt failed; retry in 3 min"
  sleep 180
done
echo "[after] done $(date -u +%H:%M:%S)"
