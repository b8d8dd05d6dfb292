"""Device-side featurization ops (fused jnp reference paths + Pallas kernels)."""

from protstruc_tpu.ops.pairwise import (
    pairwise_atom_distance,
    pairwise_dihedral_maps,
    pairwise_planar_angle_maps,
    full_pairwise_distance_matrix,
)
from protstruc_tpu.ops.metrics import gdt_ts, rmsd, superimpose, tm_score
