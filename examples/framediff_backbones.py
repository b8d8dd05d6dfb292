"""SE(3) frame-diffusion backbone generation, end to end.

Trains a FrameDenoiser on fixed-length fragments cropped from real PDB
structures (frames from ``backbone_orientations``/``backbone_translations``),
then samples novel backbones by ancestral SE(3) diffusion and writes them
out as PDB files.  A toy run — scale steps/model/data for real generation.

    python examples/framediff_backbones.py tests/data/1REX.pdb 200
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "tests/data/1REX.pdb"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    frag_len = 32

    import jax
    import jax.numpy as jnp
    import optax

    import protstruc_tpu as ps
    from protstruc_tpu.models.framediff import (
        FrameDenoiser,
        FrameDiffConfig,
        framediff_loss,
        framediff_sample,
    )
    from protstruc_tpu.models.ipa import backbone_xyz_from_frames, frames_from_backbone
    from protstruc_tpu.pdbio.writer import to_pdb

    # --- data: all complete-backbone fragments of frag_len from the input
    sb = ps.StructureBatch.from_pdb(path)
    xyz = np.asarray(sb.xyz[0, :, :4])  # (L, 4, 3)
    ok = np.isfinite(xyz[:, :3]).all((1, 2))
    runs = []
    i = 0
    L = len(ok)
    while i + frag_len <= L:
        if ok[i : i + frag_len].all():
            runs.append(xyz[i : i + frag_len])
            i += frag_len // 2  # 50% overlap
        else:
            i += 1
    frags = jnp.asarray(np.stack(runs))  # (B, frag_len, 4, 3)
    print(f"{frags.shape[0]} fragments of length {frag_len}")

    cfg = FrameDiffConfig(node_dim=64, pair_dim=32, n_heads=4, n_iter=2, T=64)
    # center each fragment and normalize translations
    ca = frags[:, :, 1]
    center = ca.mean(axis=1, keepdims=True)
    x0 = (ca - center) / cfg.trans_scale
    r0, _ = frames_from_backbone(frags - center[:, :, None])
    mask = jnp.ones(x0.shape[:2], bool)

    model = FrameDenoiser(cfg)
    params = model.init(
        jax.random.PRNGKey(0), r0, x0, jnp.zeros((x0.shape[0],)), mask
    )["params"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, k):
        loss, g = jax.value_and_grad(
            lambda q: framediff_loss(q, model, k, r0, x0, mask, cfg)
        )(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    for i in range(steps):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(1000 + i))
        if i % max(steps // 10, 1) == 0 or i == steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}")

    # --- sample 4 novel backbones and write them out
    n_samples = 4
    r, x = jax.jit(
        lambda p, k: framediff_sample(p, model, k, (n_samples, frag_len), cfg)
    )(params, jax.random.PRNGKey(7))
    bb = backbone_xyz_from_frames(r, x * cfg.trans_scale)  # (n, L, 4, 3) N/CA/C/CB

    from protstruc_tpu import geometry as geom

    os.makedirs("out", exist_ok=True)
    o_all = np.asarray(geom.ideal_carbonyl_oxygen(bb[:, :, 0], bb[:, :, 1], bb[:, :, 2]))
    for i in range(n_samples):
        # writer layout: (5, L, 3) N/CA/C/O/CB — place O ideally from the frame
        n_, ca_, c_, cb_ = (np.asarray(bb[i, :, j]) for j in range(4))
        coords = np.stack([n_, ca_, c_, o_all[i], cb_])
        seq = "A" * frag_len
        fp = f"out/framediff_sample_{i}.pdb"
        to_pdb(fp, coords, [seq], ["A"])
        print("wrote", fp)


if __name__ == "__main__":
    main()
