"""FoldModel end-to-end quality: overfit -> predicted-structure metrics.

Trains FoldModel on the vendored antibody batch and reports CA-lDDT and
aligned CA-RMSD of the *predicted coordinates* against the native
structures — the end-to-end sanity check that FAPE training actually moves
atoms to the right places (not just losses down).

    python experiments/fold_quality.py [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    n_recycle = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n_blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import protstruc_tpu as ps
    from protstruc_tpu.models.ipa import FoldModel, IPAConfig, fold_loss_fn
    from protstruc_tpu.models.trfold import TrFoldConfig, featurize_for_model
    from protstruc_tpu.ops.metrics import lddt, rmsd
    from protstruc_tpu.utils.buckets import pad_batch_to_bucket

    log(f"backend: {jax.default_backend()}")

    files = ["15c8_HL.pdb", "1a3r_HL.pdb", "1a6v_HL.pdb", "5cjx_HL.pdb"]
    sb = pad_batch_to_bucket(
        ps.StructureBatch.from_pdb([f"tests/data/{f}" for f in files])
    )
    feats = featurize_for_model(sb)
    gt_xyz = jnp.asarray(sb.xyz)

    model = FoldModel(
        trunk_cfg=TrFoldConfig(node_dim=128, pair_dim=64, n_heads=4,
                               n_blocks=n_blocks),
        ipa_cfg=IPAConfig(n_heads=4, scalar_dim=16, n_qk_points=4,
                          n_v_points=8, n_iter=6),
        n_recycle=n_recycle,
    )
    log(f"n_recycle={n_recycle} n_blocks={n_blocks}")
    params = model.init(jax.random.PRNGKey(0), feats)["params"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4))
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(
            lambda q: fold_loss_fn(q, model, feats, gt_xyz)
        )(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    ca_true = jnp.nan_to_num(gt_xyz[:, :, 1], nan=1e6)
    mask = sb.residue_mask & jnp.isfinite(gt_xyz[:, :, 1]).all(-1)

    @jax.jit
    def quality(p):
        out = model.apply({"params": p}, feats)
        ca_pred = out["xyz"][:, :, 1]
        l = lddt(ca_pred, ca_true, mask=mask)
        r = rmsd(ca_pred, ca_true, mask=mask, align=True)
        return l, r

    l0, r0 = quality(params)
    log(f"init: CA-lDDT {np.asarray(l0).mean():.3f}, "
        f"CA-RMSD {np.asarray(r0).mean():.1f} A")

    t0 = time.perf_counter()
    for i in range(steps):
        params, opt, loss = step(params, opt)
        if (i + 1) % max(steps // 6, 1) == 0:
            l, r = quality(params)
            log(f"step {i+1:4d}  loss {float(loss):.3f}  "
                f"CA-lDDT {np.asarray(l).mean():.3f}  "
                f"CA-RMSD {np.asarray(r).mean():.2f} A")
    dt = (time.perf_counter() - t0) / steps
    l, r = quality(params)
    print(f'{{"steps": {steps}, "ms_per_step": {dt*1e3:.1f}, '
          f'"ca_lddt": {float(np.asarray(l).mean()):.4f}, '
          f'"ca_rmsd": {float(np.asarray(r).mean()):.3f}}}')


if __name__ == "__main__":
    main()
