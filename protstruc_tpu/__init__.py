"""protstruc-tpu: a TPU-native protein-structure batch library.

A ground-up JAX/XLA/Pallas rebuild with the full capability surface of
dohlee/protstruc (see SURVEY.md): batched protein-structure containers,
geometric featurization (distance maps, backbone/inter-residue torsions,
orientation frames), rigid manipulation, Euclidean diffusion, structure
reconstruction, antibody-aware batches, and PDB I/O — designed TPU-first
(static shapes, explicit masks, pytree containers, pjit/shard_map
parallelism, Pallas pair-feature kernels).
"""

from protstruc_tpu import geometry, vocab
from protstruc_tpu.constants import MAX_N_ATOMS_PER_RESIDUE
from protstruc_tpu.vocab import AA, ATOM, CDR_NAMES

from protstruc_tpu.batch import StructureBatch
from protstruc_tpu.antibody import AntibodyStructureBatch

# reference-compat alias module: `import protstruc_tpu.general`
from protstruc_tpu import general  # noqa: F401

__version__ = "0.1.0"
