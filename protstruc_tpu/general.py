"""Drop-in alias for the reference's ``protstruc.general`` module.

All symbols live in vocab.py; this module mirrors the reference layout so
``from protstruc.general import AA, ATOM`` ports with a package rename.
"""

from protstruc_tpu.vocab import (  # noqa: F401
    AA,
    ATOM,
    CDR_NAMES,
    non_standard_residue_substitutions,
    resindex_to_oneletter,
    ressymb_to_resindex,
    restype_to_heavyatom_names,
    standard_aa_names,
    standard_heavy_atom_names,
)
