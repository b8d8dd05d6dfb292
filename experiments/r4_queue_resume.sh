#!/bin/bash
# Resume variant of r4_queue.sh: identical retrain queue but WITHOUT the
# checkpoint wipe, so a queue interrupted mid-run (session died at
# structure_triangle step ~6000/12000) picks up from the latest orbax
# checkpoint instead of restarting from scratch. train() treats steps as
# the TOTAL target, so each retry converges toward completion.
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
