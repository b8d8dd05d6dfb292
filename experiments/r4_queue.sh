#!/bin/bash
# Round-4 TPU job queue: wait for the axon relay to come back, then
# (1) finish the sequence_triangle generalization run (resumes from its
#     checkpoint), (2) extend structure_triangle by 8000 more steps (the
#     4000-step eval curve was still rising: 0.49 @ 3500 -> 0.59 @ 4000).
# Each job retries through transient relay failures; checkpoints make
# every retry a resume, not a restart.
set -u
cd /root/repo

probe() {
  timeout 240 python -c "import jax; assert jax.default_backend() == 'axon'" 2>/dev/null
}

wait_relay() {
  local n=0
  until probe; do
    n=$((n + 1))
    echo "[queue] relay down (probe $n) $(date -u +%H:%M:%S)"
    sleep 180
  done
  echo "[queue] relay up $(date -u +%H:%M:%S)"
}

run_job() { # args: steps out_json mode
  for attempt in 1 2 3 4 5; do
    wait_relay
    echo "[queue] job $3 attempt $attempt $(date -u +%H:%M:%S)"
    if timeout 7200 python experiments/fold_generalization.py "$1" "$2" "$3"; then
      echo "[queue] job $3 DONE"
      return 0
    fi
    echo "[queue] job $3 failed (attempt $attempt)"
    sleep 60
  done
  echo "[queue] job $3 GAVE UP"
  return 1
}

run_job 4000 /tmp/seq_tri_result.json sequence_triangle
run_job 8000 /tmp/struct_tri_ext.json structure_triangle
echo "[queue] all jobs finished $(date -u +%H:%M:%S)"
