"""Leave-one-out generalization sweep for FoldModel (round 4 depth item).

The committed held-out artifact (docs/quality/fold_generalization_r4*.json)
proves the feature→coordinate decoder generalizes to 1REX + 4EOT.  This
sweep makes that claim robust: for EACH of the 14 vendored structures,
train the production pipeline (structure mode, Evoformer triangle pair
updates + remat, random 256-crops) on the other 13 and evaluate on the one
held out — mean ± spread of held-out CA-lDDT over every fold in the corpus
instead of a single 2-structure split.

The artifact is written incrementally after every fold (a crash or the
``--deadline`` guard still leaves a valid partial JSON), and folds are
ordered non-antibody-first so the most OOD evaluations land earliest.

Usage:
  python experiments/fold_loo.py [steps] [out.json] [--deadline H] [fold...]

``--deadline H`` stops LAUNCHING new folds H hours after start (a running
fold finishes); explicit fold names (e.g. ``1REX.pdb``) restrict the sweep.
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (protstruc_tpu)
sys.path.insert(0, _HERE)                   # sibling experiment modules

from fold_generalization import (  # noqa: E402
    DATA, compute_baselines, eval_per_structure, log)

# non-antibody / non-Fv folds first: they are the strongest OOD tests of a
# decoder trained on an antibody-dominated corpus
ALL_FILES = [
    "1REX.pdb", "4EOT.pdb", "4uuj.pdb", "8dtk.pdb", "8gpi.pdb", "8ilx.pdb",
    "6dc4.pdb", "15c8_HL.pdb", "1a3r_HL.pdb", "1a6v_HL.pdb", "1a6v_JN.pdb",
    "1ad0_DC.pdb", "5cjx_HL.pdb",
]
# 1a6v_HL and 1a6v_JN are two copies of the same complex — holding one out
# while training on the other would leak the fold; drop the duplicate from
# the corpus entirely (train sets for every fold exclude it too).
DUPLICATE = "1a6v_JN.pdb"


def run_fold(heldout, steps, ck_root, ema=0.0, n_recycle=1, fused_tri=False,
             step_select=None, n_evals=4):
    import warnings

    from protstruc_tpu.train import TrainConfig, load_fold_model, train

    train_files = [f for f in ALL_FILES
                   if f not in (heldout, DUPLICATE)]
    train_paths = [f"{DATA}/{f}" for f in train_files]
    eval_paths = [f"{DATA}/{heldout}"]
    cfg = TrainConfig(
        steps=steps, batch_size=4, node_dim=128, pair_dim=64, n_heads=4,
        n_blocks=4, n_ipa_iter=6, n_recycle=n_recycle, crop_len=256,
        sequence_only=False, save_every=max(steps // n_evals, 1), seed=0,
        pair_update="triangle", remat=True, ema_decay=ema,
        fused_tri=fused_tri,
    )
    ck = os.path.join(ck_root, heldout.replace(".pdb", ""))
    t0 = time.perf_counter()
    result = train(train_paths, ck, cfg, log_fn=log, eval_paths=eval_paths)
    seconds = round(time.perf_counter() - t0, 1)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # structure-conditioned OOD warning
        model, params, cfg_loaded = load_fold_model(ck, step=step_select)
    per = eval_per_structure(model, params, cfg_loaded, eval_paths)[heldout]

    curve = []
    with open(os.path.join(ck, "metrics.jsonl")) as fh:
        for line in fh:
            rec = json.loads(line)
            if "eval_ca_lddt" in rec:
                curve.append({"step": rec["step"],
                              "eval_ca_lddt": round(rec["eval_ca_lddt"], 4)})

    return {
        "train_files": train_files,
        "train_seconds": seconds,
        "final_loss": (round(result["final_loss"], 4)
                       if result["final_loss"] is not None else None),
        "heldout": per,
        "eval_curve": curve,
    }


def main():
    argv = list(sys.argv[1:])

    def opt(flag, default=None, cast=float):
        if flag in argv:
            i = argv.index(flag)
            v = cast(argv[i + 1])
            del argv[i:i + 2]
            return v
        return default

    deadline_h = opt("--deadline")
    ema = opt("--ema", 0.0)
    n_recycle = int(opt("--recycle", 1))
    ck_root = opt("--ck-root", "out/fold_loo_r4", cast=str)
    fused_tri = "--fused-tri" in argv
    if fused_tri:
        argv.remove("--fused-tri")
    # --best: evaluate the checkpoint with the best in-training held-out
    # curve point instead of the final step (train.py step="best")
    step_select = "best" if "--best" in argv else None
    if step_select:
        argv.remove("--best")
    steps = int(argv[0]) if argv else 3000
    out_path = argv[1] if len(argv) > 1 else "docs/quality/fold_loo_r4.json"
    folds = argv[2:] or [f for f in ALL_FILES if f != DUPLICATE]

    import jax
    import numpy as np

    log(f"backend: {jax.default_backend()}, folds: {len(folds)}, "
        f"steps/fold: {steps}, deadline: {deadline_h} h")

    report = {
        "experiment": f"experiments/fold_loo.py {steps}",
        "hardware": f"{jax.default_backend()} ({len(jax.devices())} device)",
        "setup": "leave-one-out over the vendored corpus (duplicate complex "
                 f"{DUPLICATE} excluded); production train loop, structure "
                 "mode, triangle pair updates + remat, crop 256",
        "steps_per_fold": steps,
        "ema_decay": ema,
        "n_recycle": n_recycle,
        "fused_tri": fused_tri,
        "checkpoint_select": step_select or "final",
        "folds": {},
    }
    if os.path.exists(out_path):  # resume: keep completed folds
        try:
            with open(out_path) as fh:
                prev = json.load(fh)
            if prev.get("steps_per_fold") == steps:
                report["folds"] = prev.get("folds", {})
                log(f"resuming: {len(report['folds'])} folds already done")
        except Exception:
            pass

    t_start = time.time()
    for heldout in folds:
        if heldout in report["folds"]:
            continue
        if deadline_h and (time.time() - t_start) > deadline_h * 3600:
            report["deadline_hit"] = True
            log(f"deadline hit after {len(report['folds'])} folds")
            break
        log(f"=== LOO fold: {heldout} ===")
        entry = run_fold(heldout, steps, ck_root, ema=ema,
                         n_recycle=n_recycle, fused_tri=fused_tri,
                         step_select=step_select)
        entry["baselines"] = compute_baselines(
            f"{DATA}/{heldout}", jax.random.PRNGKey(7))
        report["folds"][heldout] = entry

        vals = [v["heldout"]["ca_lddt"] for v in report["folds"].values()]
        report["summary"] = {
            "n_folds_done": len(vals),
            "heldout_ca_lddt_mean": round(float(np.mean(vals)), 4),
            "heldout_ca_lddt_min": round(float(np.min(vals)), 4),
            "heldout_ca_lddt_max": round(float(np.max(vals)), 4),
            "heldout_ca_lddt_std": round(float(np.std(vals)), 4),
        }
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as fh:
            json.dump(report, fh, indent=2)
        log(f"wrote {out_path} ({heldout}: "
            f"lDDT {entry['heldout']['ca_lddt']})")

    print(json.dumps(report.get("summary", {})))


if __name__ == "__main__":
    main()
