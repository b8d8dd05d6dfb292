#!/bin/bash
# Round-4 TPU job queue: wait for the axon relay to come back, then retrain
# the triangle generalization runs FRESH (their earlier checkpoints carry
# the pre-fix torsion-mask interleave bug, models/trfold.py embed), with
# structure_triangle extended to a 12k-step budget (its 4k eval curve was
# still rising: 0.49 @ 3500 -> 0.59 @ 4000).
# train() treats steps as the TOTAL target, so a retry after a transient
# relay failure resumes from the latest checkpoint and completes the run.
set -u
cd /root/repo

probe() {
  # The relay registers the experimental 'axon' platform but reports
  # default_backend() == 'tpu' (validated live 2026-08-18); accept either.
  timeout 240 python -c "import jax; assert jax.default_backend() in ('axon', 'tpu')" 2>/dev/null
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

rm -rf out/fold_generalization_r4/structure_triangle \
       out/fold_generalization_r4/sequence_triangle

for attempt in 1 2 3 4 5 6; do
  wait_relay
  echo "[queue] generalization attempt $attempt $(date -u +%H:%M:%S)"
  if timeout 14000 python experiments/fold_generalization.py 4000 \
      /tmp/gen_r4b.json structure_triangle=12000 sequence_triangle; then
    echo "[queue] generalization DONE"
    break
  fi
  echo "[queue] attempt $attempt failed"
  sleep 60
done
echo "[queue] finished $(date -u +%H:%M:%S)"
