"""End-to-end de novo design pipeline, every stage on device.

1. **Backbone generation** — SE(3) frame diffusion (models/framediff)
   trained on fragments of the input structure.
2. **Sequence design** — autoregressive InverseFold over the generated
   backbone (ProteinMPNN-style causal decoding).
3. **Sidechain placement** — ideal-geometry CB + annealed chi packing
   against the clash energy (ops/pack).
4. **Validation** — clash energy, radius of gyration, secondary structure;
   written out as a PDB.

A toy run (CPU-friendly sizes); scale steps/widths for real use:

    python examples/design_pipeline.py tests/data/1REX.pdb 150
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "tests/data/1REX.pdb"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    frag_len = 32

    import jax
    import jax.numpy as jnp
    import optax

    import protstruc_tpu as ps
    from protstruc_tpu.models.framediff import (
        FrameDenoiser, FrameDiffConfig, framediff_loss, framediff_sample)
    from protstruc_tpu.models.inverse_fold import (
        InverseFold, InverseFoldConfig, ar_sample_sequence, featurize_backbone,
        if_ar_loss)
    from protstruc_tpu.models.ipa import backbone_xyz_from_frames, frames_from_backbone
    from protstruc_tpu.vocab import AA

    # ------------------------------------------------------------------ data
    sb = ps.StructureBatch.from_pdb(path)
    xyz = np.asarray(sb.xyz[0, :, :4])
    ok = np.isfinite(xyz[:, :3]).all((1, 2))
    frags, i = [], 0
    while i + frag_len <= len(ok):
        if ok[i : i + frag_len].all():
            frags.append(xyz[i : i + frag_len])
            i += frag_len // 2
        else:
            i += 1
    frags = jnp.asarray(np.stack(frags))
    print(f"[data] {frags.shape[0]} fragments of {frag_len} residues")

    # ------------------------------------------------- 1. backbone diffusion
    cfg = FrameDiffConfig(node_dim=48, pair_dim=24, n_heads=4, n_iter=1, T=48)
    ca = frags[:, :, 1]
    center = ca.mean(axis=1, keepdims=True)
    x0 = (ca - center) / cfg.trans_scale
    r0, _ = frames_from_backbone(frags - center[:, :, None])
    mask = jnp.ones(x0.shape[:2], bool)

    denoiser = FrameDenoiser(cfg)
    params = denoiser.init(jax.random.PRNGKey(0), r0, x0,
                           jnp.zeros((x0.shape[0],)), mask)["params"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def dstep(p, o, k):
        l, g = jax.value_and_grad(
            lambda q: framediff_loss(q, denoiser, k, r0, x0, mask, cfg))(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for i in range(steps):
        params, opt, l = dstep(params, opt, jax.random.PRNGKey(100 + i))
    print(f"[diffusion] trained {steps} steps, loss {float(l):.3f}")

    r, x = jax.jit(
        lambda p, k: framediff_sample(p, denoiser, k, (1, frag_len), cfg)
    )(params, jax.random.PRNGKey(7))
    bb = backbone_xyz_from_frames(r, x * cfg.trans_scale)  # (1, L, 4) N/CA/C/CB
    print(f"[diffusion] sampled backbone, CA span "
          f"{float(jnp.linalg.norm(bb[0, -1, 1] - bb[0, 0, 1])):.1f} A")

    # --------------------------------------------------- 2. sequence design
    # wrap the generated backbone as a StructureBatch (N/CA/C/-/CB slots)
    gen_xyz = np.full((1, frag_len, 15, 3), np.nan, np.float32)
    gen_xyz[0, :, :3] = np.asarray(bb[0, :, :3])
    gen_xyz[0, :, 4] = np.asarray(bb[0, :, 3])
    gen = ps.StructureBatch.from_xyz(jnp.asarray(gen_xyz))

    if_cfg = InverseFoldConfig(node_dim=48, pair_dim=24, n_heads=4,
                               n_blocks=1, n_decoder_blocks=1)
    if_model = InverseFold(if_cfg)
    # toy training: teach it on the native fragments (native sequences)
    sel = np.zeros(sb.chain_idx.shape, bool)
    sel[:, : min(128, sb.n_residues)] = True
    train_sb = sb.residue_masked_select(jnp.asarray(sel))
    tf = featurize_backbone(train_sb)
    from protstruc_tpu.models.inverse_fold import random_decode_order

    rank = random_decode_order(jax.random.PRNGKey(1), tf["residue_mask"].shape)
    if_params = if_model.init(
        jax.random.PRNGKey(2),
        dict(tf, prev_seq=tf["target_seq"], decode_rank=rank),
    )["params"]
    if_tx = optax.adam(1e-3)
    if_opt = if_tx.init(if_params)

    @jax.jit
    def istep(p, o, k):
        l, g = jax.value_and_grad(
            lambda q: if_ar_loss(q, if_model, tf, k))(p)
        u, o = if_tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for i in range(steps):
        if_params, if_opt, l = istep(if_params, if_opt, jax.random.PRNGKey(200 + i))
    print(f"[design] trained {steps} steps, CE {float(l):.3f}")

    gf = featurize_backbone(gen)
    gf["target_seq"] = jnp.zeros(gen.chain_idx.shape, jnp.int32)
    seq_idx = ar_sample_sequence(if_params, if_model, gf, jax.random.PRNGKey(8),
                                 temperature=0.2)
    seq = "".join(AA(int(a)).oneletter() for a in np.asarray(seq_idx[0]))
    print(f"[design] sequence: {seq}")

    # ------------------------------------------- 3. sidechains + validation
    # graft template sidechains (library extracted from the input structure)
    # onto the generated backbone, then repack chi angles against clashes
    from protstruc_tpu.ops.graft import build_sidechains, sidechain_library

    lib = sidechain_library(sb)
    # 5-slot backbone in the 15-slot layout order N/CA/C/O/CB: bb's slot 3
    # is CB (backbone_xyz_from_frames layout), so a real carbonyl O must be
    # placed ideally from the frame before slotting CB into slot 4
    from protstruc_tpu import geometry as geom

    o = geom.ideal_carbonyl_oxygen(bb[:, :, 0], bb[:, :, 1], bb[:, :, 2])
    bb5 = jnp.concatenate(
        [bb[:, :, :3], o[:, :, None], bb[:, :, 3:4]], axis=2
    )  # N/CA/C/O/CB
    all_xyz, all_mask = build_sidechains(bb5, seq_idx, lib)

    full = ps.StructureBatch.from_xyz(
        all_xyz, atom_mask=all_mask, chain_idx=np.zeros((1, frag_len)),
        chain_ids=[["A"]], seq=[{"A": seq}],
    )
    e0 = float(full.clash_energy()[0])
    packed = full.pack_sidechains(jax.random.PRNGKey(9), n_sweeps=10,
                                  n_proposals=6)
    e1 = float(packed.clash_energy()[0])
    print(f"[pack] clash energy {e0:.2f} -> {e1:.2f}")

    # gradient relaxation: ideal bonded geometry + clash wall (ops/relax)
    packed, er = packed.relax(n_steps=150)
    print(f"[relax] total energy {float(er['initial'][0]):.1f} -> "
          f"{float(er['final'][0]):.1f} "
          f"(clash {float(er['clash_initial'][0]):.2f} -> "
          f"{float(er['clash_final'][0]):.2f})")
    print(f"[validate] Rg {float(packed.radius_of_gyration()[0]):.1f} A, "
          f"SS classes {np.unique(np.asarray(packed.secondary_structure())).tolist()}")

    os.makedirs("out", exist_ok=True)
    from protstruc_tpu.pdbio.writer import structure_batch_to_pdb

    structure_batch_to_pdb(packed, "out/designed.pdb")  # all-atom
    print("wrote out/designed.pdb")


if __name__ == "__main__":
    main()
