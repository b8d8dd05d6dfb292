#!/bin/bash
# Second-stage chain: after the r4 post-bench chain (artifact merges +
# refolder extension + self-consistency) releases the chip, measure the
# remat_policy='tri_dots' step-time win on the live TPU.
set -u
cd /root/repo

log() { echo "[chain2] $1 $(date -u +%H:%M:%S)"; }

if [ -f /tmp/r4_chain.pid ]; then
  CPID=$(cat /tmp/r4_chain.pid)
  while kill -0 "$CPID" 2>/dev/null; do sleep 120; done
fi
log "chain exited"

for attempt in 1 2 3; do
  if timeout 4000 python experiments/r4_tri_dots_bench.py \
      > /tmp/tri_dots_r4.out 2> /tmp/tri_dots_r4.log; then
    log "tri-dots bench done: $(cat /tmp/tri_dots_r4.out)"
    break
  fi
  log "attempt $attempt failed"
  sleep 180
done
log "done"
