"""Drop-in alias for the reference's ``protstruc.alphabet`` module.

The 3<->1 letter maps live in vocab.py; re-exported here so code written
against the reference layout (``from protstruc.alphabet import three2one``)
ports with a package rename only.
"""

from protstruc_tpu.vocab import one2three, three2one

__all__ = ["three2one", "one2three"]
