"""Held-out generalization for FoldModel (VERDICT r3 item 1).

Trains with the PRODUCTION loop (protstruc_tpu/train.py: streaming
bucketed ingest, random-crop augmentation, orbax checkpointing) on 11
vendored structures and evaluates on held-out 1REX + 4EOT against two
baselines (extended chain, random init).  Two modes:

* ``structure`` (default pipeline, sequence_only=False): inputs are the
  ground-truth distogram/angle features — held-out eval measures whether
  the feature→coordinate DECODER generalizes to unseen folds (1REX is a
  lysozyme, a fold class absent from the antibody-dominated train set).
* ``sequence`` (sequence_only=True): inputs are sequence + chain
  encodings only — the honest sequence→structure generalization test.
  At 11 training structures this is expected to be a negative result;
  it is recorded either way (the point is a falsifiable artifact).

Writes docs/quality/fold_generalization_r4.json.

Usage: python experiments/fold_generalization.py [steps] [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAIN_FILES = [
    "15c8_HL.pdb", "1a3r_HL.pdb", "1a6v_HL.pdb", "1a6v_JN.pdb",
    "1ad0_DC.pdb", "5cjx_HL.pdb", "6dc4.pdb", "4uuj.pdb",
    "8dtk.pdb", "8gpi.pdb", "8ilx.pdb",
]
HELDOUT_FILES = ["1REX.pdb", "4EOT.pdb"]
DATA = "tests/data"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _native_ca(path):
    import jax.numpy as jnp

    import protstruc_tpu as ps

    sb = ps.StructureBatch.from_pdb(path)
    ca = sb.xyz[:, :, 1]
    mask = sb.residue_mask & jnp.isfinite(ca).all(-1)
    return sb, ca, mask


def compute_baselines(path, key):
    """Extended-chain and random-init CA-lDDT / aligned CA-RMSD vs native."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from protstruc_tpu.ops.metrics import lddt, rmsd
    from protstruc_tpu.ops.nerf import backbone_from_dihedrals

    sb, ca_true, mask = _native_ca(path)
    L = sb.n_residues
    ca_safe = jnp.nan_to_num(ca_true, nan=1e6)

    # extended chain: phi=-135, psi=135, omega=180 degrees
    tor = jnp.tile(
        jnp.deg2rad(jnp.asarray([[-135.0, 135.0, 180.0]])), (L, 1))[None]
    ext_ca = backbone_from_dihedrals(tor)[:, :, 1]

    # random init: Gaussian cloud at the native CA scale
    scale = float(jnp.sqrt(jnp.nanvar(jnp.where(mask[..., None], ca_true,
                                                jnp.nan))))
    rnd_ca = jax.random.normal(key, ca_true.shape) * scale

    out = {}
    for name, ca in [("extended", ext_ca), ("random", rnd_ca)]:
        out[name] = {
            "ca_lddt": round(float(np.asarray(
                lddt(ca, ca_safe, mask=mask)).mean()), 4),
            "ca_rmsd": round(float(np.asarray(
                rmsd(ca, ca_safe, mask=mask, align=True)).mean()), 3),
        }
    return out


def eval_per_structure(model, params, cfg, paths):
    """Final per-held-out-structure metrics with the trained model.

    Structures longer than ``cfg.eval_max_len`` are scored on contiguous
    windows (train.eval_batch_metrics — memory cap: full-length 8gpi at
    2364 residues OOMs one v5e), recorded via ``eval_windows``."""
    from protstruc_tpu.train import eval_batch_metrics

    out = {}
    for path in paths:
        sb, _, _ = _native_ca(path)
        l, r, n_windows = eval_batch_metrics(model, params, cfg, sb)
        rec = {"ca_lddt": round(float(l[0]), 4),
               "ca_rmsd": round(float(r[0]), 3)}
        if n_windows > 1:
            rec["eval_windows"] = n_windows
        out[os.path.basename(path)] = rec
    return out


def run_mode(mode, steps, ck_root):
    import warnings

    from protstruc_tpu.train import TrainConfig, load_fold_model, train

    train_paths = [f"{DATA}/{f}" for f in TRAIN_FILES]
    eval_paths = [f"{DATA}/{f}" for f in HELDOUT_FILES]
    # mode = "<inputs>" or "<inputs>_triangle": inputs selects the feature
    # pipeline, the suffix swaps the trunk pair-update for Evoformer
    # triangle multiplicative updates (+ remat to fit the L=256 crops).
    triangle = mode.endswith("_triangle")
    inputs = mode[: -len("_triangle")] if triangle else mode
    cfg = TrainConfig(
        steps=steps, batch_size=4, node_dim=128, pair_dim=64, n_heads=4,
        n_blocks=4, n_ipa_iter=6, n_recycle=1, crop_len=256,
        sequence_only=(inputs == "sequence"), save_every=max(steps // 8, 1),
        seed=0,
        pair_update="triangle" if triangle else "gated_mix",
        remat=triangle,
    )
    ck = os.path.join(ck_root, mode)
    t0 = time.perf_counter()
    result = train(train_paths, ck, cfg, log_fn=log, eval_paths=eval_paths)
    seconds = round(time.perf_counter() - t0, 1)

    # eval curve from the loop's own metrics.jsonl
    curve = []
    with open(os.path.join(ck, "metrics.jsonl")) as fh:
        for line in fh:
            rec = json.loads(line)
            if "eval_ca_lddt" in rec:
                curve.append({"step": rec["step"],
                              "eval_ca_lddt": round(rec["eval_ca_lddt"], 4),
                              "eval_ca_rmsd": round(rec["eval_ca_rmsd"], 3)})

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # structure-conditioned OOD warning
        model, params, cfg_loaded = load_fold_model(ck)
    per_structure = eval_per_structure(model, params, cfg_loaded, eval_paths)

    return {
        "config": json.loads(cfg.to_json()),
        # final_loss is None when a retry resumed a checkpoint already at
        # the step target (train() skips the loop) — the retry chains
        # re-enter here after a post-train crash and must not TypeError
        "final_loss": (round(result["final_loss"], 4)
                       if result["final_loss"] is not None else None),
        "train_seconds": seconds,
        "heldout_mean": {
            "ca_lddt": round(result["eval_ca_lddt"], 4),
            "ca_rmsd": round(result["eval_ca_rmsd"], 3),
        },
        "heldout_per_structure": per_structure,
        "eval_curve": curve,
    }


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else "docs/quality/fold_generalization_r4.json")
    modes = sys.argv[3:] or ["structure", "sequence"]

    import jax

    log(f"backend: {jax.default_backend()}")

    baselines = {}
    for i, f in enumerate(HELDOUT_FILES):
        baselines[f] = compute_baselines(f"{DATA}/{f}",
                                         jax.random.PRNGKey(100 + i))
        log(f"[baseline] {f}: {baselines[f]}")

    ck_root = "out/fold_generalization_r4"
    report = {
        "experiment": f"experiments/fold_generalization.py {steps}",
        "hardware": f"{jax.default_backend()} ({len(jax.devices())} device)",
        "train_files": TRAIN_FILES,
        "heldout_files": HELDOUT_FILES,
        "baselines": baselines,
        "modes": {},
    }
    for mode in modes:
        # "mode=steps" overrides the step budget per mode (train() treats
        # steps as the TOTAL target, so reruns resume-and-complete)
        steps_m = steps
        if "=" in mode:
            mode, s = mode.split("=")
            steps_m = int(s)
        log(f"=== mode: {mode} ({steps_m} steps) ===")
        report["modes"][mode] = run_mode(mode, steps_m, ck_root)
        # checkpoint partial progress so a crash still leaves an artifact
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as fh:
            json.dump(report, fh, indent=2)
        log(f"wrote {out_path} (mode {mode} done)")

    print(json.dumps({k: report["modes"][k]["heldout_mean"]
                      for k in report["modes"]}))


if __name__ == "__main__":
    main()
