"""Why does TrFold's distogram head plateau? (round-1 deferred item)

Observation (r1): small-scale overfits reach only ~28% distogram top-1
after 400 steps even though the binned distance is an *input feature* —
the model should be able to copy it through.

Hypotheses probed here on a one-batch overfit (real PDB crop):
  post-norm   — current architecture (PairUpdate ends in LayerNorm(pair+mix)):
                the per-block output LayerNorm keeps re-normalizing the
                residual stream, so the identity path from the input
                distance embedding to the head decays with depth.
  pre-norm    — LayerNorm moved inside the residual branch (modern
                transformer fix); identity path is exact.

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/distogram_plateau.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax


def run(pre_norm: bool, steps: int = 400, lr: float = 1e-3):
    import protstruc_tpu as ps
    from protstruc_tpu.models import trfold as tf
    from protstruc_tpu.ops.histogram import distogram_bins

    cfg = tf.TrFoldConfig(node_dim=32, pair_dim=16, n_heads=2, n_blocks=2,
                          pair_pre_norm=pre_norm)
    model = tf.TrFold(cfg)

    sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
    sb = sb.residue_compact(
        (np.arange(sb.n_residues)[None] < 48) & np.asarray(sb.residue_mask)
    )
    feats = tf.featurize_for_model(sb)
    params, opt_state, tx = tf.make_train_state(model, feats,
                                                jax.random.PRNGKey(0), lr)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(tf.loss_fn)(params, model, feats)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def top1(params):
        out = model.apply({"params": params}, feats)
        pred = jnp.argmax(out["distogram_logits"], -1)
        tgt = distogram_bins(feats["d_cb"], cfg.n_dist_bins, cfg.max_dist)
        pm = feats["pair_mask"]
        return jnp.sum(jnp.where(pm, pred == tgt, False)) / jnp.sum(pm)

    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        if i % 100 == 99:
            print(f"  [{'pre' if pre_norm else 'post'}-norm] step {i+1}: "
                  f"loss={float(loss):.3f} top1={float(top1(params)):.3f}",
                  flush=True)
    print(f"  ({time.perf_counter()-t0:.0f}s)")
    return float(top1(params))


if __name__ == "__main__":
    a = run(pre_norm=False)
    b = run(pre_norm=True)
    print(f"post-norm top1={a:.3f}  pre-norm top1={b:.3f}")
