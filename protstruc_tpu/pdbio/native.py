"""ctypes bindings to the C++ PDB atom-record scanner (native/pdb_parser.cpp).

The shared library is compiled on first use (g++, ~1 s) into a user cache
directory; every subsequent import dlopens the cached build.  All callers go
through :func:`parse_atom_records_native`, which returns the same field-array
dict as the pure-NumPy scanner in parser.py — the parser falls back to the
NumPy path automatically when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
from typing import Optional

import numpy as np

__all__ = ["load_native", "parse_atom_records_native", "native_available"]

_SRC = pathlib.Path(__file__).resolve().parents[2] / "native" / "pdb_parser.cpp"
_lib = None
_tried = False


def _cache_dir() -> pathlib.Path:
    d = os.environ.get("PROTSTRUC_TPU_NATIVE_CACHE")
    if d:
        return pathlib.Path(d)
    return pathlib.Path.home() / ".cache" / "protstruc_tpu" / "native"


def load_native() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True

    if not _SRC.is_file():
        return None

    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _cache_dir() / f"libpspdb-{tag}.so"

    if not out.is_file():
        try:
            out.parent.mkdir(parents=True, exist_ok=True)
            tmp = out.with_suffix(".so.tmp")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(tmp)],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, out)
        except Exception:
            return None

    try:
        lib = ctypes.CDLL(str(out))
        lib.ps_parse_atoms.restype = ctypes.c_int64
        lib.ps_parse_atoms.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64,
        ]
        _lib = lib
    except OSError:
        return None
    return _lib


def native_available() -> bool:
    return load_native() is not None


def parse_atom_records_native(data: bytes):
    """Scan raw PDB bytes via the C++ parser.

    Returns the same dict of numpy arrays as parser._parse_atom_records
    (atom_name/altloc/res_name/chain_id/res_num/icode/xyz) or None when the
    native library is unavailable.

    Documented divergence from the NumPy path on MALFORMED input only:
    the C++ fixed-field scanners (pdb_parser.cpp parse_fixed_float/int)
    stop at the first unparseable character and yield 0 for a corrupt
    numeric field, where the NumPy path raises ValueError on the same
    bytes; lines shorter than 54 chars are skipped.  Well-formed PDBs
    (everything the ingest tests and parity gates cover) parse
    identically byte-for-byte; lenient-vs-strict on corrupt files is the
    standard fast-scanner trade and callers wanting strictness can force
    the NumPy path (PROTSTRUC_TPU_NO_NATIVE=1).
    """
    lib = load_native()
    if lib is None:
        return None

    # upper bound on records: one per newline (+1 for no trailing newline)
    max_n = data.count(b"\n") + 1
    atom_name = np.empty(max_n * 4, dtype=np.uint8)
    altloc = np.empty(max_n, dtype=np.uint8)
    res_name = np.empty(max_n * 3, dtype=np.uint8)
    chain = np.empty(max_n, dtype=np.uint8)
    res_num = np.empty(max_n, dtype=np.int32)
    icode = np.empty(max_n, dtype=np.uint8)
    xyz = np.empty((max_n, 3), dtype=np.float32)

    n = lib.ps_parse_atoms(
        data, len(data),
        atom_name.ctypes.data_as(ctypes.c_void_p),
        altloc.ctypes.data_as(ctypes.c_void_p),
        res_name.ctypes.data_as(ctypes.c_void_p),
        chain.ctypes.data_as(ctypes.c_void_p),
        res_num.ctypes.data_as(ctypes.c_void_p),
        icode.ctypes.data_as(ctypes.c_void_p),
        xyz.ctypes.data_as(ctypes.c_void_p),
        max_n,
    )
    if n < 0:
        raise RuntimeError("native PDB parser overflow (record bound too small)")
    if n == 0:
        raise ValueError("no ATOM/HETATM records found")

    # Byte-string (S) dtype end to end: the whole atom-level pipeline
    # (_tidy/_lookup_slots/grouping) runs on S arrays, and unicode
    # conversion happens only at residue level in _build_structure — the
    # per-atom astype(U) conversions were the parse hot spot (~33%).
    def to_s(arr, w):
        v = arr[: n * w].view(f"S{w}")
        return np.char.strip(v) if w > 1 else v

    return {
        "atom_name": to_s(atom_name, 4),
        "altloc": altloc[:n].view("S1"),
        "res_name": to_s(res_name, 3),
        "chain_id": np.char.strip(chain[:n].view("S1")),
        "res_num": res_num[:n].copy(),
        "icode": np.char.strip(icode[:n].view("S1")),
        "xyz": xyz[:n].copy(),
    }
