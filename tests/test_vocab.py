"""L0 vocabulary tests (mirrors reference tests/test_constants.py invariants
plus table-integrity checks)."""

import numpy as np

from protstruc_tpu import vocab
from protstruc_tpu.constants import MAX_N_ATOMS_PER_RESIDUE, ideal
from protstruc_tpu.vocab import AA, ATOM, RESTYPE_HEAVY_ATOMS


def test_atom_enum_slots():
    assert ATOM.N == 0
    assert ATOM.CA == 1
    assert ATOM.C == 2
    assert ATOM.O == 3
    assert ATOM.CB == 4
    # case aliases
    assert ATOM["Ca"] == ATOM.CA == ATOM["ca"]
    assert ATOM.is_valid("cb") and ATOM.is_valid("N")
    assert not ATOM.is_valid("ZZ")


def test_aa_enum_roundtrip():
    assert AA("ALA") is AA.ALA
    assert AA("MSE") is AA.MET  # non-standard substitution
    assert AA("K") is AA.LYS  # one-letter
    assert AA(20) is AA.UNK
    assert AA.TRP.oneletter() == "W"
    assert AA.is_aa("HYP") and AA.is_aa("G") and not AA.is_aa("ZZZ")


def test_heavy_atom_table_layout():
    assert MAX_N_ATOMS_PER_RESIDUE == 15
    for aa, atoms in RESTYPE_HEAVY_ATOMS.items():
        assert len(atoms) == 15
        if aa is AA.UNK:
            assert all(a == "" for a in atoms)
            continue
        assert atoms[:4] == ["N", "CA", "C", "O"]
        assert atoms[14] == "OXT"
        if aa is AA.GLY:
            assert atoms[4] == ""
        else:
            assert atoms[4] == "CB"
    # TRP is the largest residue: all 15 slots used
    assert all(a != "" for a in RESTYPE_HEAVY_ATOMS[AA.TRP])


def test_heavy_atom_table_matches_reference_exactly():
    """Slot-for-slot parity with reference general.py:149-171."""
    expected_arg = ["N", "CA", "C", "O", "CB", "CG", "CD", "NE", "CZ",
                    "NH1", "NH2", "", "", "", "OXT"]
    assert RESTYPE_HEAVY_ATOMS[AA.ARG] == expected_arg
    expected_thr = ["N", "CA", "C", "O", "CB", "OG1", "CG2", "", "", "",
                    "", "", "", "", "OXT"]
    assert RESTYPE_HEAVY_ATOMS[AA.THR] == expected_thr


def test_slot_lookup():
    assert vocab.atom_slot_of("ALA", "CB") == 4
    assert vocab.atom_slot_of("GLY", "CB") == -1
    assert vocab.atom_slot_of("MSE", "SD") == 6  # MET substitution
    assert vocab.atom_slot_of("TRP", "CH2") == 13
    assert vocab.atom_slot_of("ALA", "OXT") == 14
    assert vocab.atom_slot_of("XXX", "CA") == -1


def test_restype_atom_exists():
    assert vocab.RESTYPE_ATOM_EXISTS.shape == (21, 15)
    assert vocab.RESTYPE_ATOM_EXISTS[int(AA.GLY)].sum() == 5  # N CA C O OXT
    assert vocab.RESTYPE_ATOM_EXISTS[int(AA.TRP)].all()
    assert not vocab.RESTYPE_ATOM_EXISTS[int(AA.UNK)].any()


def test_ideal_constants_sanity():
    # bond lengths around 1-2.5 A (reference tests/test_constants.py:4-17)
    for v in [ideal.NA, ideal.AC, ideal.AB, ideal.C_N, ideal.CO]:
        assert 1.0 < v < 2.0
    for v in [ideal.NB, ideal.CB, ideal.NC]:
        assert 2.0 < v < 3.0
    for v in [ideal.ANC, ideal.NAB, ideal.NAC, ideal.ACO]:
        assert 0.0 < v < np.pi
    assert -np.pi <= ideal.BANC < 0
    assert -3.15 <= ideal.NACO < 0  # -3.142 (peptide-bond planarity, ~ -pi)


def test_letter_maps():
    assert vocab.three2one["ALA"] == "A"
    assert vocab.one2three["W"] == "TRP"
    assert len(vocab.three2one) == 20
    assert vocab.ressymb_to_resindex["X"] == 20
    assert vocab.resindex_to_oneletter[0] == "A"


def test_substitution_table_size():
    # 142-entry OpenMM table; every target is a standard AA
    assert len(vocab.non_standard_residue_substitutions) == 142
    for tgt in vocab.non_standard_residue_substitutions.values():
        assert tgt in vocab.standard_aa_names
