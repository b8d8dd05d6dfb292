"""Long-sequence training memory: remat vs dense on the real chip.

Measures the largest TrFold training step that fits on one v5e chip with and
without cfg.remat at B=1 (L sweep), using the checksum-fetch timing protocol.

    python experiments/remat_long_l.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def try_step(L, remat, iters=3):
    import jax
    import jax.numpy as jnp
    import optax

    from protstruc_tpu.models.trfold import TrFold, TrFoldConfig, loss_fn

    cfg = TrFoldConfig(node_dim=128, pair_dim=64, n_heads=4, n_blocks=3,
                       remat=remat)
    model = TrFold(cfg)

    B = 1
    key = jax.random.PRNGKey(0)
    feats = {
        "seq_idx": jnp.zeros((B, L), jnp.int32),
        "torsions": jax.random.normal(key, (B, L, 3)),
        "torsion_mask": jnp.ones((B, L, 3), bool),
        "residue_mask": jnp.ones((B, L), bool),
        "chain_idx": jnp.zeros((B, L), jnp.int32),
        "d_cb": jax.random.uniform(key, (B, L, L)) * 20.0,
        "omega": jax.random.uniform(key, (B, L, L)) * 6.0 - 3.0,
        "theta": jax.random.uniform(key, (B, L, L)) * 6.0 - 3.0,
        "phi": jax.random.uniform(key, (B, L, L)) * 3.0,
        "pair_mask": jnp.ones((B, L, L), bool),
    }
    params = model.init(jax.random.PRNGKey(1), feats)["params"]
    tx = optax.adamw(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, f):
        l, g = jax.value_and_grad(loss_fn)(p, model, f)
        u, o = tx.update(g, o, p)
        p = optax.apply_updates(p, u)
        return p, o, l

    p, o, l = step(params, opt, feats)
    float(l)  # force
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, l = step(p, o, feats)
    float(l)
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    import jax

    log(f"backend: {jax.default_backend()}")
    for L in (512, 1024, 1536, 2048):
        for remat in (False, True):
            tag = f"L={L} remat={remat}"
            try:
                dt = try_step(L, remat)
                log(f"[{tag}] {dt*1e3:.0f} ms/step")
            except Exception as e:
                msg = str(e).split("\n")[0][:120]
                log(f"[{tag}] FAILED: {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
