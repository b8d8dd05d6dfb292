#!/bin/bash
# Round-4 post-bench chain. Sessions die unpredictably (API errors), so
# every remaining chip-bound step of the round runs from this one
# detached script:
#
#   1. wait for the post-queue bench validator (r4_after_queue.sh) to exit
#   2. merge the retrain report (/tmp/gen_r4b.json) into the committed
#      generalization artifact (full replace + provenance)
#   3. extend the sequence_triangle refolder 4000 -> 12000 total steps
#      (train() resumes from the queue's checkpoint; steps = total target)
#   4. mode-wise merge the extended sequence numbers into the artifact
#   5. re-run self-consistency with the extended production refolder
#
# Artifacts land in /tmp (gen_r4c.json, selfcons_r4b.{json,log}) and in
# docs/quality/fold_generalization_r4_triangle.json; the session (or the
# driver's end-of-round commit) picks them up.
set -u
cd /root/repo
echo $$ > /tmp/r4_chain.pid   # chain2's wait-gate must not depend on the launcher

log() { echo "[chain] $1 $(date -u +%H:%M:%S)"; }

if [ -f /tmp/r4_after.pid ]; then
  APID=$(cat /tmp/r4_after.pid)
  while kill -0 "$APID" 2>/dev/null; do sleep 120; done
fi
log "after-script exited"

# 2. full merge — only if the queue wrote a complete two-mode report
if python - <<'EOF'
import json, sys
try:
    d = json.load(open("/tmp/gen_r4b.json"))
except Exception:
    sys.exit(1)
sys.exit(0 if "sequence_triangle" in d.get("modes", {}) else 1)
EOF
then
  python experiments/r4_merge_artifacts.py /tmp/gen_r4b.json && log "merged gen_r4b"
else
  log "gen_r4b incomplete; skipping full merge"
fi

# 3. extend the sequence refolder (resume; relay outages retried)
ok=0
for attempt in 1 2 3; do
  if timeout 14000 python experiments/fold_generalization.py 4000 \
      /tmp/gen_r4c.json sequence_triangle=12000; then
    ok=1; break
  fi
  log "extension attempt $attempt failed"
  sleep 180
done

# 4. mode-wise merge of the extension
if [ "$ok" = 1 ] && [ -f /tmp/gen_r4c.json ]; then
  python experiments/r4_merge_artifacts.py --update-modes /tmp/gen_r4c.json \
    && log "merged gen_r4c (sequence_triangle)"
fi

# 5. self-consistency with the production refolder (VERDICT r3 item 9)
for attempt in 1 2 3; do
  if timeout 7200 python experiments/self_consistency.py 500 8 \
      tests/data/1REX.pdb,tests/data/4EOT.pdb,tests/data/1ad0_DC.pdb,tests/data/6dc4.pdb \
      refolder=out/fold_generalization_r4/sequence_triangle \
      > /tmp/selfcons_r4b.json 2> /tmp/selfcons_r4b.log; then
    log "self-consistency done: $(cat /tmp/selfcons_r4b.json)"
    break
  fi
  log "selfcons attempt $attempt failed"
  sleep 180
done
log "chain done"
