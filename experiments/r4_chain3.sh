#!/bin/bash
# Third-stage chain: after the tri_dots A/B (chain2) releases the chip,
# re-run self-consistency with the BEST-held-out checkpoint of the
# production sequence refolder (refolder_step=best -> step 6000,
# eval_ca_lddt 0.273) instead of the overfit final step.  The r4b rerun
# showed the refolder choice dominates the designability signal; this is
# the honest best-refolder variant, enabled by load_fold_model(step=).
set -u
cd /root/repo
echo $$ > /tmp/r4_chain3.pid

log() { echo "[chain3] $1 $(date -u +%H:%M:%S)"; }

if [ -f /tmp/r4_chain2.pid ]; then
  CPID=$(cat /tmp/r4_chain2.pid)
  while kill -0 "$CPID" 2>/dev/null; do sleep 120; done
fi
log "chain2 exited"

for attempt in 1 2 3; do
  if timeout 7200 python experiments/self_consistency.py 500 8 \
      tests/data/1REX.pdb,tests/data/4EOT.pdb,tests/data/1ad0_DC.pdb,tests/data/6dc4.pdb \
      refolder=out/fold_generalization_r4/sequence_triangle \
      refolder_step=best \
      > /tmp/selfcons_r4c.json 2> /tmp/selfcons_r4c.log; then
    log "self-consistency (best refolder) done: $(cat /tmp/selfcons_r4c.json)"
    break
  fi
  log "attempt $attempt failed"
  sleep 180
done
log "done"
