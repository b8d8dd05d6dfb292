"""Helper to import the reference implementation as a numerical oracle.

The reference package (/root/reference) imports biotite at module scope, but
biotite is not installed in this image.  Everything we need as an oracle
(geometry kernels, StructureBatch tensor methods via from_xyz) is pure
torch/numpy, so we stub just enough of biotite for the import to succeed.

Usage:
    ref = load_reference()   # -> module `protstruc` or None if unavailable
"""

import sys
import types

REF_PATH = "/root/reference"

_cache = {}


def load_reference():
    if "mod" in _cache:
        return _cache["mod"]

    # stub biotite surface used at import time
    for name in [
        "biotite",
        "biotite.database",
        "biotite.database.rcsb",
        "biotite.structure",
        "biotite.structure.io",
        "biotite.structure.io.pdb",
    ]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["biotite.database.rcsb"].fetch = lambda *a, **k: None
    sys.modules["biotite.structure"].AtomArray = object
    sys.modules["biotite.structure"].filter_canonical_amino_acids = None
    sys.modules["biotite.structure"].residue_iter = None
    sys.modules["biotite.structure.io.pdb"].PDBFile = object

    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    try:
        import protstruc  # noqa: F401

        _cache["mod"] = protstruc
    except Exception:
        _cache["mod"] = None
    return _cache["mod"]
