"""Distill a partial round-5 LOO fold into a committable budget-curve artifact.

If the wall clock kills `experiments/fold_loo.py` mid-fold, the completed
eval points in ``<ck>/metrics.jsonl`` are still valid evidence: each
``eval_ca_lddt`` row is the held-out score of the r5 recipe (recycle=2,
EMA, fused-tri) at that step budget, directly comparable to the same
fold's r4 entry (3000 steps, recycle=1) in docs/quality/fold_loo_r4.json.

Usage: python experiments/r5_loo_partial.py <heldout.pdb> <ck_dir> <out.json>
"""

import json
import sys


def main():
    heldout, ck, out_path = sys.argv[1], sys.argv[2], sys.argv[3]

    curve, last_train = [], None
    with open(f"{ck}/metrics.jsonl") as fh:
        for line in fh:
            rec = json.loads(line)
            if "eval_ca_lddt" in rec:
                curve.append({"step": rec["step"],
                              "eval_ca_lddt": round(rec["eval_ca_lddt"], 4)})
            if "loss" in rec:
                last_train = rec

    r4 = json.load(open("docs/quality/fold_loo_r4.json"))
    r4_fold = r4["folds"][heldout]

    report = {
        "experiment": f"experiments/fold_loo.py 6000 ... --recycle 2 "
                      f"--ema 0.999 --best --fused-tri ({heldout}; "
                      "wall-clock-truncated, distilled by r5_loo_partial.py)",
        "hardware": "tpu (1 device)",
        "setup": "same LOO protocol as fold_loo_r4.json (train on the "
                 "other 11 corpus structures, duplicate excluded; "
                 "production triangle trunk, crop 256) with the r5 recipe: "
                 "n_recycle=2, ema_decay=0.999, fused_tri=True; in-training "
                 "held-out eval curve committed because the full 6000-step "
                 "fold did not fit the round's wall clock",
        "heldout": heldout,
        "r5_eval_curve": curve,
        "last_train_record": last_train,
        "r4_same_fold": {
            "steps": r4["steps_per_fold"],
            "ca_lddt": r4_fold["heldout"]["ca_lddt"],
            "eval_curve": r4_fold.get("eval_curve"),
            "baselines": r4_fold.get("baselines"),
        },
    }
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps({"heldout": heldout, "n_curve_points": len(curve),
                      "curve": curve}))


if __name__ == "__main__":
    main()
