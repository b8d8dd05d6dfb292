#!/bin/bash
# Round-5 LOO quality chain (one chip through the relay — serialize).
#
# The full 12-fold x 9000-step sweep does not fit this round's wall clock
# (r4 measured ~13,300 s for 12 folds at 3000 steps, and the FIRST fold of
# any fresh process carries ~20-30 min of remote train-step compile — the
# r4 1REX fold's 2646 s vs ~800 s for later folds is that overhead).
# VERDICT r4 item 4 accepts the alternative deliverable: a budget-vs-quality
# curve. So: 6000 steps/fold (2x the r4 budget; the eval curve's 3000-step
# point gives a direct same-budget comparison against fold_loo_r4.json)
# with the full r5 recipe (recycle=2, EMA 0.999, best-checkpoint,
# fused-tri) on the cheapest fold first, deadline-guarded; the incremental
# JSON write after each fold keeps a partial sweep a valid artifact.
#
# Lesson recorded: do NOT front-load a separate smoke process — it pays the
# full remote compile itself (>15 min), which is exactly the budget it was
# meant to protect.  The sweep's own first steps are the smoke.
set -u
cd /root/repo
echo "[r5loo] sweep $(date -u +%H:%M:%S)"
env JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
    JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2 \
  timeout 2520 python experiments/fold_loo.py 6000 \
    docs/quality/fold_loo_r5.json \
    --recycle 2 --ema 0.999 --best --fused-tri --deadline 0.25 \
    --ck-root out/fold_loo_r5 8gpi.pdb 4uuj.pdb > /tmp/loo_r5.log 2>&1
echo "[r5loo] sweep done rc=$? $(date -u +%H:%M:%S)"
