#!/bin/bash
# Flash-attention on-chip follow-ups, chained behind the fold_loo sweep
# (one TPU chip through the relay — serialize to keep each measurement
# clean).  Runs once /tmp/fold_loo.pid exits:
#   1. train-step A/B: mfu.py row with and without --flash at a long-L
#      gated-mix config (L=2048, where node attention dominates)
#   2. long-L push: can flash+remat train at L=3072 on one chip?
#   3. full bench.py (all lanes incl. the new [attn]) -> final artifact
set -u
cd /root/repo

QPID=$(cat /tmp/fold_loo.pid)
while kill -0 "$QPID" 2>/dev/null; do
  sleep 120
done
echo "[flashq] fold_loo exited $(date -u +%H:%M:%S)"

echo "[flashq] 1a: train-step A/B, jnp path"
timeout 2400 python experiments/mfu.py 256 128 4 2048 1 mix bf16 remat \
  > /tmp/mfu_flash_off.json 2>/tmp/mfu_flash_off.log
echo "[flashq] 1b: train-step A/B, flash path"
timeout 2400 python experiments/mfu.py 256 128 4 2048 1 mix bf16 flash remat \
  > /tmp/mfu_flash_on.json 2>/tmp/mfu_flash_on.log

echo "[flashq] 2: long-L push L=3072 with flash"
timeout 3600 python experiments/mfu.py 128 32 3 3072 1 mix bf16 flash remat \
  > /tmp/mfu_flash_l3072.json 2>/tmp/mfu_flash_l3072.log || \
  echo "[flashq] L=3072 flash failed (see log)"
timeout 3600 python experiments/mfu.py 128 32 3 3072 1 mix bf16 remat \
  > /tmp/mfu_l3072.json 2>/tmp/mfu_l3072.log || \
  echo "[flashq] L=3072 jnp failed (see log)"

echo "[flashq] 3: full bench"
for attempt in 1 2 3; do
  if timeout 4200 python bench.py > /tmp/bench_r4b.json 2>/tmp/bench_r4b.log; then
    echo "[flashq] bench OK"
    break
  fi
  echo "[flashq] bench attempt $attempt failed; retry in 3 min"
  sleep 180
done
echo "[flashq] done $(date -u +%H:%M:%S)"
