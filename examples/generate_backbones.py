"""Generative loop: train a diffusion denoiser, sample CA backbones.

Demonstrates the diffusion stack end to end — forward marginals as training
targets, the DiffusionDenoiser model, and ancestral DDPM sampling — all on
device.  (A toy run; scale steps/model for real generation.)

    python examples/generate_backbones.py tests/data/1REX.pdb
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "tests/data/1REX.pdb"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    import jax
    import jax.numpy as jnp
    import optax

    import protstruc_tpu as ps
    from protstruc_tpu.models.trfold import DiffusionDenoiser, TrFoldConfig
    from protstruc_tpu.ops.diffusion import (
        cosine_variance_schedule,
        ddpm_sample,
        forward_marginal,
    )

    sb = ps.StructureBatch.from_pdb(path).standardize()
    ca = jnp.nan_to_num(sb.get_xyz()[:, :, 1], nan=0.0)
    seq = sb.get_seq_idx()
    mask = sb.get_residue_mask()
    T = 64
    betas = cosine_variance_schedule(T)

    model = DiffusionDenoiser(TrFoldConfig(node_dim=64, pair_dim=16, n_heads=2))

    def t_embed(t):
        f = jnp.exp(jnp.linspace(0.0, 4.0, 4))
        return jnp.concatenate([jnp.sin(t[:, None] * f), jnp.cos(t[:, None] * f)], -1)

    params = model.init(jax.random.PRNGKey(0), ca, t_embed(jnp.zeros(1)), seq, mask)[
        "params"
    ]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss_fn(p, key):
        kt, ke = jax.random.split(key)
        t = jax.random.randint(kt, (1,), 0, T)
        x_t, eps = forward_marginal(ca, ke, betas, t)
        pred = model.apply({"params": p}, x_t, t_embed(t.astype(jnp.float32)), seq, mask)
        return jnp.mean(jnp.where(mask[..., None], (pred - eps) ** 2, 0.0))

    @jax.jit
    def step(p, o, key):
        l, g = jax.value_and_grad(loss_fn)(p, key)
        updates, o = tx.update(g, o)
        return optax.apply_updates(p, updates), o, l

    key = jax.random.PRNGKey(1)
    for i in range(steps):
        key, k = jax.random.split(key)
        params, opt, loss = step(params, opt, k)
        if i % 20 == 0:
            print(f"step {i}: eps-MSE {float(loss):.3f} (unit-noise baseline ~1)")

    def denoise(x, t):
        return model.apply(
            {"params": params}, x, t_embed(t[None].astype(jnp.float32)), seq, mask
        )

    sample = ddpm_sample(denoise, jax.random.PRNGKey(2), ca.shape, betas, clip_x0=4.0)
    unstd = np.asarray(sample) * np.asarray(sb.std)[:, None] + np.asarray(sb.mu)[:, None]
    step_d = np.linalg.norm(np.diff(unstd[0], axis=0), axis=-1)
    print(
        f"sampled CA trace: {sample.shape}, consecutive-CA distance "
        f"{step_d.mean():.1f} +- {step_d.std():.1f} A (toy model; train longer "
        f"to approach the native ~3.8 A)"
    )


if __name__ == "__main__":
    main()
