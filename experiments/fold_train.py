"""FoldModel (trunk + IPA) training measurement on the real chip.

Trains end-to-end structure prediction (distogram/torsion losses + FAPE) on
the vendored antibody PDBs, reporting ms/step and the loss trajectory.

    python experiments/fold_train.py [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import protstruc_tpu as ps
    from protstruc_tpu.models.ipa import FoldModel, IPAConfig, fold_loss_fn
    from protstruc_tpu.models.trfold import TrFoldConfig, featurize_for_model
    from protstruc_tpu.utils.buckets import pad_batch_to_bucket

    log(f"backend: {jax.default_backend()}")

    files = ["15c8_HL.pdb", "1a3r_HL.pdb", "1a6v_HL.pdb", "5cjx_HL.pdb"]
    sb = pad_batch_to_bucket(
        ps.StructureBatch.from_pdb([f"tests/data/{f}" for f in files])
    )
    feats = featurize_for_model(sb)
    gt_xyz = jnp.asarray(sb.xyz)
    log(f"batch: B={sb.batch_size} L={sb.n_residues}")

    model = FoldModel(
        trunk_cfg=TrFoldConfig(node_dim=128, pair_dim=64, n_heads=4, n_blocks=2),
        ipa_cfg=IPAConfig(n_heads=4, scalar_dim=16, n_qk_points=4,
                          n_v_points=8, n_iter=4),
    )
    params = model.init(jax.random.PRNGKey(0), feats)["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    log(f"params: {n_params/1e6:.2f}M")

    tx = optax.adamw(3e-4)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, f, x):
        loss, g = jax.value_and_grad(
            lambda q: fold_loss_fn(q, model, f, x)
        )(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    p, o, l = step(params, opt, feats, gt_xyz)
    log(f"first step (compile+run) done, loss={float(l):.4f}")

    t0 = time.perf_counter()
    losses = []
    for i in range(steps):
        p, o, l = step(p, o, feats, gt_xyz)
        if i % max(steps // 10, 1) == 0:
            losses.append(float(l))  # sync point; keeps timing honest-ish
    lf = float(l)
    dt = (time.perf_counter() - t0) / steps
    log(f"{steps} steps: {dt*1e3:.1f} ms/step, loss {losses[0]:.3f} -> {lf:.3f}")
    print(f'{{"fold_ms_per_step": {dt*1e3:.1f}, "loss_first": {losses[0]:.4f}, '
          f'"loss_last": {lf:.4f}}}')


if __name__ == "__main__":
    main()
