#!/bin/bash
# Round-4 continuation queue (relaunched after the 2026-08-19 07:16 host
# reboot wiped /tmp and killed the original fold_loo + flash chain).
# Serializes all on-chip work through the single relay TPU:
#   1. leave-one-out generalization sweep (resumable, incremental artifact)
#   2. flash-attention train-step A/B at L=2048 + long-L 3072 push
#   3. full bench.py (all lanes) as the round's validated artifact
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

echo "[queue] start $(date -u +%H:%M:%S)"

# --- 1. LOO sweep: resumes from docs/quality/fold_loo_r4.json after any
# crash; --deadline stops launching new folds so stages 2-3 still fit.
for attempt in 1 2 3 4 5 6 7 8; do
  wait_relay
  echo "[queue] LOO attempt $attempt $(date -u +%H:%M:%S)"
  if timeout 21000 python experiments/fold_loo.py 3000 \
      docs/quality/fold_loo_r4.json --deadline 5.0; then
    echo "[queue] LOO sweep DONE"
    break
  fi
  echo "[queue] LOO attempt $attempt failed"
  sleep 60
done

# --- 2. flash A/B (train-step with/without the fused Pallas pair-bias
# attention at a long-L gated-mix config where node attention dominates)
wait_relay
echo "[queue] 2a: flash A/B, jnp path $(date -u +%H:%M:%S)"
timeout 2400 python experiments/mfu.py 256 128 4 2048 1 mix bf16 remat \
  > /tmp/mfu_flash_off.json 2>/tmp/mfu_flash_off.log \
  || echo "[queue] flash-off row failed"
echo "[queue] 2b: flash A/B, flash path $(date -u +%H:%M:%S)"
timeout 2400 python experiments/mfu.py 256 128 4 2048 1 mix bf16 flash remat \
  > /tmp/mfu_flash_on.json 2>/tmp/mfu_flash_on.log \
  || echo "[queue] flash-on row failed"

echo "[queue] 2c: long-L push L=3072 with flash $(date -u +%H:%M:%S)"
timeout 3600 python experiments/mfu.py 128 32 3 3072 1 mix bf16 flash remat \
  > /tmp/mfu_flash_l3072.json 2>/tmp/mfu_flash_l3072.log \
  || echo "[queue] L=3072 flash failed (see log)"
timeout 3600 python experiments/mfu.py 128 32 3 3072 1 mix bf16 remat \
  > /tmp/mfu_l3072.json 2>/tmp/mfu_l3072.log \
  || echo "[queue] L=3072 jnp failed (see log)"

# --- 3. full bench
for attempt in 1 2 3; do
  wait_relay
  if timeout 4200 python bench.py > /tmp/bench_r4b.json 2>/tmp/bench_r4b.log; then
    echo "[queue] bench OK"
    break
  fi
  echo "[queue] bench attempt $attempt failed; retry in 3 min"
  sleep 180
done
echo "[queue] done $(date -u +%H:%M:%S)"
