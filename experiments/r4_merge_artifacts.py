"""Merge the r4 retrain results into the committed quality artifacts.

The round-4 review fixed a torsion-mask interleave bug in the trunk embed
(models/trfold.py) that slightly corrupted node features at chain termini,
so both triangle generalization runs were retrained from scratch
(experiments/r4_queue.sh -> /tmp/gen_r4b.json, structure_triangle at a
12k-step budget).  This script replaces the committed artifact with the
post-fix report and stamps the provenance.

Usage: python experiments/r4_merge_artifacts.py [src] [dst]
       python experiments/r4_merge_artifacts.py --update-modes [src] [dst]

With ``--update-modes`` only the modes present in src replace their
counterparts in dst (used for the sequence_triangle 4k -> 12k extension
run, which re-reports just that mode), instead of replacing the whole
artifact.
"""

import json
import sys

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SRC = ARGS[0] if ARGS else "/tmp/gen_r4b.json"
DST = (ARGS[1] if len(ARGS) > 1
       else "docs/quality/fold_generalization_r4_triangle.json")


def update_modes():
    """Mode-wise merge: src's modes overwrite dst's, provenance appended."""
    with open(SRC) as fh:
        report = json.load(fh)
    with open(DST) as fh:
        merged = json.load(fh)
    for mode, entry in report.get("modes", {}).items():
        prev = merged["modes"].get(mode)
        if prev is not None:
            entry = dict(entry)
            entry["previous"] = {k: prev[k]
                                 for k in ("heldout_mean", "final_loss")
                                 if k in prev}
        merged["modes"][mode] = entry
    extra = ("mode(s) %s updated from %s (resumed training to a larger "
             "total step budget; per-mode 'previous' records the replaced "
             "numbers)" % (sorted(report.get("modes", {})), SRC))
    merged["note"] = (merged["note"] + "; " + extra
                      if merged.get("note") else extra)
    with open(DST, "w") as fh:
        json.dump(merged, fh, indent=2)
    print(json.dumps({m: merged["modes"][m]["heldout_mean"]
                      for m in merged["modes"]}))


def main():
    with open(SRC) as fh:
        report = json.load(fh)
    report["note"] = (
        "post-review retrain: the embed torsion-mask interleave bug "
        "(models/trfold.py, fixed in round 4) slightly corrupted node "
        "features at chain termini in the earlier runs; both modes were "
        "retrained from scratch with the fix, structure_triangle at a "
        "12000-step budget (its 4k eval curve was still rising)")
    with open(DST) as fh:
        old = json.load(fh)
    report["previous"] = {
        mode: {k: v for k, v in entry.items()
               if k in ("heldout_mean", "final_loss")}
        for mode, entry in old.get("modes", {}).items()
    }
    with open(DST, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps({m: report["modes"][m]["heldout_mean"]
                      for m in report["modes"]}))


if __name__ == "__main__":
    if "--update-modes" in sys.argv:
        update_modes()
    else:
        main()
