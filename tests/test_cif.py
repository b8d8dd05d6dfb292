"""mmCIF parsing tests: equivalence with the PDB path on the same content."""

import io

import numpy as np
import pytest

from protstruc_tpu.pdbio.parser import parse_pdb

CIF_TEXT = """data_TEST
#
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.label_atom_id
_atom_site.label_alt_id
_atom_site.auth_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.pdbx_PDB_ins_code
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.pdbx_PDB_model_num
ATOM 1 N . ALA A 1 ? 0.000 0.000 0.000 1
ATOM 2 CA . ALA A 1 ? 1.458 0.000 0.000 1
ATOM 3 C . ALA A 1 ? 2.000 1.400 0.000 1
ATOM 4 N A GLY A 4 ? 5.000 0.000 0.000 1
ATOM 5 N B GLY A 4 ? 9.000 9.000 9.000 1
ATOM 6 CA . GLY A 4 ? 6.458 0.000 0.000 1
HETATM 7 SD . MSE B 1 ? 3.000 1.000 0.000 1
HETATM 8 CA . MSE B 1 ? 2.000 1.000 0.000 1
HETATM 9 O . HOH B 100 ? 9.000 9.000 9.000 1
ATOM 10 N . ALA A 1 ? 99.0 99.0 99.0 2
#
"""

PDB_TEXT = "".join(
    [
        "ATOM      1  N   ALA A   1       0.000   0.000   0.000  1.00  0.00\n",
        "ATOM      2  CA  ALA A   1       1.458   0.000   0.000  1.00  0.00\n",
        "ATOM      3  C   ALA A   1       2.000   1.400   0.000  1.00  0.00\n",
        "ATOM      4  N  AGLY A   4       5.000   0.000   0.000  0.50  0.00\n",
        "ATOM      5  N  BGLY A   4       9.000   9.000   9.000  0.50  0.00\n",
        "ATOM      6  CA  GLY A   4       6.458   0.000   0.000  1.00  0.00\n",
        "HETATM    7  SD  MSE B   1       3.000   1.000   0.000  1.00  0.00\n",
        "HETATM    8  CA  MSE B   1       2.000   1.000   0.000  1.00  0.00\n",
        "HETATM    9  O   HOH B 100       9.000   9.000   9.000  1.00  0.00\n",
    ]
)


def test_cif_equals_pdb_parse():
    a = parse_pdb(io.BytesIO(CIF_TEXT.encode()))
    b = parse_pdb(io.BytesIO(PDB_TEXT.encode()))
    assert a.n_residues == b.n_residues == 5  # A:1, gaps 2-3, 4; B: MSE
    assert a.get_seq() == b.get_seq() == "AXXGM"
    assert a.chain_order == b.chain_order == ["A", "B"]
    np.testing.assert_array_equal(a.atom_mask, b.atom_mask)
    m = a.atom_mask
    np.testing.assert_allclose(a.atom_xyz[m], b.atom_xyz[m], atol=1e-5)
    np.testing.assert_array_equal(a.residue_number, b.residue_number)


def test_cif_first_model_only():
    p = parse_pdb(io.BytesIO(CIF_TEXT.encode()))
    # the model-2 N at (99,99,99) must not overwrite model 1
    np.testing.assert_allclose(p.atom_xyz[0, 0], [0.0, 0.0, 0.0], atol=1e-6)


def test_cif_altloc_first():
    p = parse_pdb(io.BytesIO(CIF_TEXT.encode()))
    # GLY 4: altloc A kept, B dropped
    np.testing.assert_allclose(p.atom_xyz[3, 0], [5.0, 0.0, 0.0], atol=1e-6)


def test_cif_batch_ingest():
    from protstruc_tpu import StructureBatch

    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".cif", delete=False) as f:
        f.write(CIF_TEXT)
        path = f.name
    try:
        sb = StructureBatch.from_pdb(path)
        assert sb.get_xyz().shape == (1, 5, 15, 3)
    finally:
        os.unlink(path)


def test_cif_missing_loop_raises():
    with pytest.raises(ValueError):
        parse_pdb(io.BytesIO(b"data_EMPTY\n#\n_cell.length_a 1.0\n"))


def test_null_coordinates_become_nan(tmp_path):
    """mmCIF '?'/'.' coordinate tokens map to NaN (missing atom), not a
    parse abort; an unbalanced-quote row is skipped, not fatal."""
    cif = """data_test
loop_
_atom_site.group_PDB
_atom_site.label_atom_id
_atom_site.label_alt_id
_atom_site.label_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
ATOM N . ALA A 1 1.0 2.0 3.0
ATOM CA . ALA A 1 ? 2.5 3.5
ATOM C . ALA A 1 2.0 "unbalanced
ATOM O . ALA A 1 2.0 3.0 4.0
#
"""
    from protstruc_tpu.pdbio.cif import parse_atom_records_cif

    rec = parse_atom_records_cif(cif.encode())
    names = rec["atom_name"].tolist()
    assert "N" in names and "CA" in names and "O" in names
    ca = rec["xyz"][names.index("CA")]
    assert np.isnan(ca[0]) and ca[1] == 2.5
