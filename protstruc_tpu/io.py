"""Drop-in alias for the reference's ``protstruc.io`` module (PDB writing).

``to_pdb`` has the reference signature (io.py:8-43);
``structure_batch_to_pdb`` is the richer all-atom writer.
"""

from protstruc_tpu.pdbio.writer import structure_batch_to_pdb, to_pdb

__all__ = ["to_pdb", "structure_batch_to_pdb"]
