"""End-to-end TrFold training over a PDB directory.

Demonstrates the full framework path: streaming bucketed ingest (C++ parse)
-> on-device featurization -> sharded training steps on a (dp, sp, tp) mesh.

    python examples/train_trfold.py --data tests/data --steps 20
"""

import argparse
import functools
import glob
import os
import sys
import time

# allow running straight from a repo checkout: python examples/train_trfold.py
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="tests/data")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--mesh", default=None, help="e.g. 2,2,2 (dp,sp,tp)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from protstruc_tpu.models.trfold import (
        TrFold,
        TrFoldConfig,
        featurize_for_model,
        make_train_state,
        train_step,
    )
    from protstruc_tpu.pdbio.dataset import StructureDataset

    paths = sorted(glob.glob(os.path.join(args.data, "*.pdb")))
    if not paths:
        sys.exit(f"no PDB files under {args.data}")
    print(f"{len(paths)} structures, backend={jax.default_backend()}")

    # small config so the example runs anywhere; scale node/pair dims up
    # (with tp sharding, see docs/guides/sharding.md) for real training
    cfg = TrFoldConfig(node_dim=64, pair_dim=32, n_heads=4, n_blocks=2)
    model = TrFold(cfg)

    ds = StructureDataset(
        paths, batch_size=args.batch_size, shuffle=True, buckets=(256, 512, 1024, 2048, 2560)
    )

    params = opt_state = tx = None
    jstep = None
    step = 0
    t0 = time.perf_counter()
    while step < args.steps:
        for batch in ds:
            feats = featurize_for_model(batch)
            if params is None:
                params, opt_state, tx = make_train_state(
                    model, feats, jax.random.PRNGKey(0), args.lr
                )
                jstep = jax.jit(functools.partial(train_step, model=model, tx=tx))
            params, opt_state, loss = jstep(params, opt_state, feats)
            step += 1
            print(f"step {step:4d}  L={batch.n_residues:4d}  loss={float(loss):.4f}")
            if step >= args.steps:
                break
    dt = time.perf_counter() - t0
    print(f"{args.steps} steps in {dt:.1f}s ({dt/args.steps*1e3:.0f} ms/step)")


if __name__ == "__main__":
    main()
