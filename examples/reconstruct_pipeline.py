"""Structure -> 6D features -> reconstructed backbone -> PDB, end to end.

    python examples/reconstruct_pipeline.py tests/data/1REX.pdb out.pdb
"""

import os
import sys

import numpy as np

# allow running straight from a repo checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "tests/data/1REX.pdb"
    dst = sys.argv[2] if len(sys.argv) > 2 else "reconstructed.pdb"

    import protstruc_tpu as ps
    from protstruc_tpu.io import to_pdb
    from protstruc_tpu.ops.reconstruct import (
        initialize_backbone_with_mds,
        reconstruct_backbone_distmat_from_interresidue_geometry,
    )

    import jax.numpy as jnp

    from protstruc_tpu.ops.idealize import idealize_backbone

    sb = ps.StructureBatch.from_pdb(src)
    print(f"loaded {src}: {sb.n_residues} residues")

    g = sb.inter_residue_geometry()
    dist = reconstruct_backbone_distmat_from_interresidue_geometry(
        g["d_cb"][0], g["omega"][0], g["theta"][0], g["phi"][0],
        mask=g["d_cb_mask"][0],
    )
    coords = initialize_backbone_with_mds(dist, max_iter=200)

    # refine covalent geometry (bond lengths/angles) toward ideal values
    bb = jnp.stack([coords[0], coords[1], coords[2], coords[3]], axis=1)
    refined, ideality = idealize_backbone(bb, n_steps=300)
    coords = jnp.stack(
        [refined[:, 0], refined[:, 1], refined[:, 2], refined[:, 3], coords[4]]
    )
    print(f"idealized: residual geometry loss {float(ideality):.2f}")

    # report CA distance-matrix error vs the input structure
    rec = np.asarray(coords[1])
    true = np.asarray(sb.get_xyz()[0, :, 1])
    d_rec = np.linalg.norm(rec[:, None] - rec[None], axis=-1)
    d_true = np.linalg.norm(true[:, None] - true[None], axis=-1)
    m = np.asarray(g["d_cb_mask"][0])
    rms = float(np.sqrt(((d_rec - d_true)[m] ** 2).mean()))
    print(f"CA distance-matrix RMS error: {rms:.2f} A")

    seq = "".join(s for _, s in sorted(dict(sb.seq[0]).items()))
    seq = seq[: sb.n_residues].ljust(sb.n_residues, "X").replace("X", "A")
    to_pdb(dst, np.asarray(coords), [seq], ["A"])
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
