#!/bin/bash
# Round-5 TPU queue (one chip through the relay — serialize):
#   1. full bench.py: validates this round's kernel work + the new
#      dh-parametrized flash smoke stage on the live chip
#   2. fused-triangle FULL-STEP A/B at the VERDICT r4 configs
#      (D=256/P=128 and D=512/P=256, triangle+remat, fused on/off)
#   3. 60-step LOO smoke with the exact r5 flags (recycle=2, EMA, best,
#      fused-tri) — catches config/compile problems before committing hours
#   4. the r5 LOO sweep: 9000 steps/fold, deadline-guarded so the chip is
#      free again before the round closes (incremental JSON = valid partial)
set -u
cd /root/repo
echo "[r5chain] start $(date -u +%H:%M:%S)"

for attempt in 1 2; do
  if timeout 4800 python bench.py > /tmp/bench_r5a.json 2>/tmp/bench_r5a.log; then
    echo "[r5chain] bench OK"
    break
  fi
  echo "[r5chain] bench attempt $attempt failed; retry in 2 min"
  sleep 120
done

echo "[r5chain] tri-fused step A/B $(date -u +%H:%M:%S)"
timeout 3600 python experiments/r5_tri_fused_ab.py step \
  > /tmp/tri_step_ab.json 2>/tmp/tri_step_ab.log \
  || echo "[r5chain] tri step A/B FAILED (see /tmp/tri_step_ab.log)"

echo "[r5chain] LOO smoke $(date -u +%H:%M:%S)"
if ! timeout 2400 python experiments/fold_loo.py 60 /tmp/loo_smoke.json \
    --recycle 2 --ema 0.999 --best --fused-tri \
    --ck-root /tmp/loo_smoke_ck 1REX.pdb > /tmp/loo_smoke.log 2>&1; then
  echo "[r5chain] LOO smoke FAILED — not launching the sweep (see /tmp/loo_smoke.log)"
  exit 1
fi
echo "[r5chain] LOO smoke OK; launching sweep $(date -u +%H:%M:%S)"

timeout 16200 python experiments/fold_loo.py 9000 docs/quality/fold_loo_r5.json \
  --recycle 2 --ema 0.999 --best --fused-tri --deadline 2.8 \
  --ck-root out/fold_loo_r5 > /tmp/loo_r5.log 2>&1
echo "[r5chain] LOO sweep done $(date -u +%H:%M:%S)"
