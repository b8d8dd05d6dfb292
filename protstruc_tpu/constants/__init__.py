"""Package-level constants.

Parity: /root/reference/protstruc/constants/__init__.py
"""

from protstruc_tpu.constants import ideal  # noqa: F401

#: Number of heavy-atom slots on the per-residue atom axis.
MAX_N_ATOMS_PER_RESIDUE = 15
