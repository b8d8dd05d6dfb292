"""Parser robustness: corrupted inputs must parse or raise ValueError.

Deterministic fuzz: random byte-level corruptions of a valid PDB file.  The
contract is graceful failure — any exception other than ValueError (or a
successful partial parse) is a bug.
"""

import io

import numpy as np
import pytest

from protstruc_tpu.pdbio.parser import parse_pdb

from tests.conftest import pdb_path


def _corruptions(data: bytes, rng, n=40):
    out = []
    for _ in range(n):
        b = bytearray(data)
        kind = rng.randint(4)
        if kind == 0:  # random byte flips
            for _ in range(rng.randint(1, 50)):
                b[rng.randint(len(b))] = rng.randint(32, 127)
        elif kind == 1:  # truncation
            b = b[: rng.randint(1, len(b))]
        elif kind == 2:  # line shuffle of a slice
            lines = bytes(b).splitlines(keepends=True)
            i = rng.randint(max(len(lines) - 20, 1))
            chunk = lines[i : i + 20]
            rng.shuffle(chunk)
            lines[i : i + 20] = chunk
            b = bytearray(b"".join(lines))
        else:  # splice garbage lines
            garbage = b"".join(
                bytes(rng.randint(32, 127, rng.randint(5, 90)).astype(np.uint8))
                + b"\n"
                for _ in range(5)
            )
            pos = rng.randint(len(b))
            b = b[:pos] + garbage + b[pos:]
        out.append(bytes(b))
    return out


@pytest.mark.parametrize("use_native", [True, False])
def test_fuzzed_pdb_never_crashes(use_native):
    rng = np.random.RandomState(0)
    data = open(pdb_path("1REX.pdb"), "rb").read()
    ok = failed = 0
    for blob in _corruptions(data, rng):
        try:
            p = parse_pdb(io.BytesIO(blob), use_native=use_native)
            assert p.n_residues >= 1
            ok += 1
        except ValueError:
            failed += 1
    # most corruptions of a large file still parse partially
    assert ok + failed == 40
    assert ok > 10


def test_fuzzed_cif_never_crashes():
    cif_header = (
        b"data_x\nloop_\n_atom_site.group_PDB\n_atom_site.label_atom_id\n"
        b"_atom_site.label_alt_id\n_atom_site.auth_comp_id\n"
        b"_atom_site.auth_asym_id\n_atom_site.auth_seq_id\n"
        b"_atom_site.pdbx_PDB_ins_code\n_atom_site.Cartn_x\n"
        b"_atom_site.Cartn_y\n_atom_site.Cartn_z\n"
    )
    body = b"ATOM N . ALA A 1 ? 0.0 0.0 0.0\nATOM CA . ALA A 1 ? 1.4 0.0 0.0\n"
    rng = np.random.RandomState(1)
    for blob in _corruptions(cif_header + body * 30, rng, n=30):
        try:
            parse_pdb(io.BytesIO(b"data_x\n" + blob))
        except ValueError:
            pass
