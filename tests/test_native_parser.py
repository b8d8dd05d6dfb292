"""C++ fast-path parser: equivalence with the NumPy scanner + speed sanity."""

import time

import numpy as np
import pytest

from protstruc_tpu.pdbio import parser as P
from protstruc_tpu.pdbio.native import native_available, parse_atom_records_native

from tests.conftest import pdb_path

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for the native parser"
)

FIXTURES = ["1ad0_DC.pdb", "6dc4.pdb", "1REX.pdb", "4EOT.pdb", "15c8_HL.pdb"]


@pytest.mark.parametrize("name", FIXTURES)
def test_native_matches_numpy_records(name):
    data = P._read_bytes(pdb_path(name))
    nat = parse_atom_records_native(data)
    ref = P._parse_atom_records(P._read_model1_lines(data))
    for k in ["atom_name", "altloc", "res_name", "chain_id", "icode"]:
        np.testing.assert_array_equal(nat[k], ref[k], err_msg=k)
    np.testing.assert_array_equal(nat["res_num"], ref["res_num"])
    np.testing.assert_allclose(nat["xyz"], ref["xyz"], atol=1e-5)


@pytest.mark.parametrize("name", ["6dc4.pdb", "1ad0_DC.pdb"])
def test_full_parse_native_equals_numpy(name):
    a = P.parse_pdb(pdb_path(name), use_native=True)
    b = P.parse_pdb(pdb_path(name), use_native=False)
    assert a.n_residues == b.n_residues
    np.testing.assert_array_equal(a.atom_mask, b.atom_mask)
    m = a.atom_mask
    np.testing.assert_allclose(a.atom_xyz[m], b.atom_xyz[m], atol=1e-5)
    np.testing.assert_array_equal(a.chain_idx, b.chain_idx)
    assert a.get_seq() == b.get_seq()


def test_native_negative_residue_numbers():
    import io

    text = (
        "ATOM      1  N   ALA A  -2       1.000   2.000  -3.500  1.00  0.00\n"
        "ATOM      2  CA  ALA A  -2       2.458   0.000   0.000  1.00  0.00\n"
    )
    rec = parse_atom_records_native(text.encode())
    assert rec["res_num"].tolist() == [-2, -2]
    np.testing.assert_allclose(rec["xyz"][0], [1.0, 2.0, -3.5], atol=1e-6)


def test_native_multimodel_takes_first():
    text = (
        "MODEL        1\n"
        "ATOM      1  N   ALA A   1       0.000   0.000   0.000  1.00  0.00\n"
        "ENDMDL\n"
        "MODEL        2\n"
        "ATOM      2  N   GLY A   1       9.000   9.000   9.000  1.00  0.00\n"
        "ENDMDL\n"
    )
    rec = parse_atom_records_native(text.encode())
    assert len(rec["res_name"]) == 1
    assert rec["res_name"][0] == b"ALA"  # atom-level fields are byte strings


def test_native_is_faster():
    data = P._read_bytes(pdb_path("6dc4.pdb")) * 20  # ~70k atom records

    t0 = time.perf_counter()
    parse_atom_records_native(data)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    P._parse_atom_records(P._read_model1_lines(data))
    t_numpy = time.perf_counter() - t0

    # the native single-pass scan should beat the NumPy multi-pass scan
    assert t_native < t_numpy, (t_native, t_numpy)
