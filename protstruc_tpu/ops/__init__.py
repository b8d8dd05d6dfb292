"""Device-side featurization ops (fused jnp reference paths + Pallas kernels)."""

from protstruc_tpu.ops.pairwise import (
    pairwise_atom_distance,
    pairwise_dihedral_maps,
    pairwise_planar_angle_maps,
    full_pairwise_distance_matrix,
)
from protstruc_tpu.ops.metrics import (dockq, fnat, gdt_ts, interface_rmsd,
                                        lddt, rmsd, superimpose, tm_score)
from protstruc_tpu.ops.surface import contact_order, radius_of_gyration, sasa
from protstruc_tpu.ops.histogram import contact_map, distance_histogram, distogram_bins
from protstruc_tpu.ops.rigid import (
    frame_apply,
    frame_compose,
    frame_invert,
    quat_to_rot,
    random_rotations,
    rot_to_quat,
)
from protstruc_tpu.ops.idealize import idealize_backbone
from protstruc_tpu.ops.flash_attn import flash_pair_bias_attention
from protstruc_tpu.ops.ring_attn import ring_attention_sharded
from protstruc_tpu.ops.secondary import assign_secondary_structure, hbond_energy_map
from protstruc_tpu.ops.diffusion import (
    cosine_variance_schedule,
    ddpm_sample,
    diffusion_trajectory,
    forward_marginal,
)
from protstruc_tpu.ops.chi import chi_angles, chi_symmetry_mask, rotate_chi
from protstruc_tpu.ops.graft import build_sidechains, sidechain_library
from protstruc_tpu.ops.pack import clash_energy, pack_sidechains
from protstruc_tpu.ops.so3 import (
    geodesic_interp,
    igso3_score_norm,
    rot_to_rotvec,
    rotvec_to_rot,
    sample_igso3,
)
