"""PDB ingest/egress tests on the vendored fixture files.

Mirrors the reference's fixture-PDB integration tests
(tests/test_StructureBatch.py:43-65, 98-163) using the local cache instead
of live RCSB fetches.
"""

import numpy as np
import pytest

from protstruc_tpu import StructureBatch
from protstruc_tpu.pdbio import parse_pdb, to_pdb
from protstruc_tpu.pdbio.writer import structure_batch_to_pdb
from protstruc_tpu.vocab import ATOM

from tests.conftest import pdb_path


def test_parse_single_structure():
    p = parse_pdb(pdb_path("1ad0_DC.pdb"))
    assert p.n_residues > 0
    assert p.atom_xyz.shape == (p.n_residues, 15, 3)
    assert p.atom_mask.shape == (p.n_residues, 15)
    assert len(p.chain_order) == 2  # D and C chains
    # every observed residue has N, CA, C
    obs = p.atom_mask.any(axis=1)
    assert p.atom_mask[obs, ATOM.CA].mean() > 0.99
    # NaN exactly where mask is False
    assert np.isnan(p.atom_xyz[~p.atom_mask]).all()
    assert not np.isnan(p.atom_xyz[p.atom_mask]).any()


def test_from_pdb_single():
    sb = StructureBatch.from_pdb(pdb_path("1ad0_DC.pdb"))
    assert sb.get_batch_size() == 1
    assert (np.asarray(sb.get_n_terminal_mask().sum(axis=1)) == 2).all()
    assert (np.asarray(sb.get_c_terminal_mask().sum(axis=1)) == 2).all()


def test_from_pdb_multiple():
    paths = [pdb_path(n) for n in ["15c8_HL.pdb", "1ad0_DC.pdb", "5cjx_HL.pdb"]]
    sb = StructureBatch.from_pdb(paths)
    assert sb.get_batch_size() == 3
    assert (np.asarray(sb.get_n_terminal_mask().sum(axis=1)) == 2).all()
    assert (np.asarray(sb.get_c_terminal_mask().sum(axis=1)) == 2).all()


def test_from_pdb_id_single():
    sb = StructureBatch.from_pdb_id("1REX")
    assert sb.get_batch_size() == 1
    assert sb.get_xyz().shape == (1, 130, 15, 3)
    assert (np.asarray(sb.get_n_terminal_mask().sum(axis=1)) == 1).all()
    assert (np.asarray(sb.get_c_terminal_mask().sum(axis=1)) == 1).all()


def test_from_pdb_id_multiple_total_lengths():
    # reference test_StructureBatch.py:157-163
    sb = StructureBatch.from_pdb_id(["1REX", "4EOT"])
    assert sb.get_batch_size() == 2
    np.testing.assert_array_equal(np.asarray(sb.get_total_lengths()), [130, 184])


def test_from_pdb_id_missing_raises():
    with pytest.raises(IOError):
        StructureBatch.from_pdb_id("ZZZZ")


def test_pairwise_distance_matrix_1rex():
    # reference test_StructureBatch.py:122-137
    sb = StructureBatch.from_pdb_id("1REX")
    dist, mask = sb.pairwise_distance_matrix()
    assert dist.shape == (1, 130, 130, 15, 15)
    ca = np.asarray(dist[:, :, :, ATOM.CA, ATOM.CA])
    cb = np.asarray(dist[:, :, :, ATOM.CB, ATOM.CB])
    assert (ca >= 0).all()
    assert (cb[~np.isnan(cb)] >= 0).all()


def test_backbone_dihedrals_1rex():
    sb = StructureBatch.from_pdb_id("1REX")
    d, m = sb.backbone_dihedrals()
    assert d.shape == (1, 130, 3)
    dm = np.asarray(d)[np.asarray(m)]
    assert (dm >= -np.pi).all() and (dm <= np.pi).all()
    # mostly negative phi for a folded protein
    phi = np.asarray(d)[0, :, 0]
    phim = np.asarray(m)[0, :, 0]
    assert (phi[phim] < 0).mean() > 0.8


def test_seq_and_seq_idx():
    sb = StructureBatch.from_pdb_id(["1REX", "4EOT"])
    seq_idx = np.asarray(sb.get_seq_idx())
    residue_mask = np.asarray(sb.get_residue_mask())
    assert seq_idx.shape == (2, 184)
    assert (seq_idx[~residue_mask] == 20).all()  # UNK at padding

    seqs = sb.get_seq()
    assert isinstance(seqs[0], dict)
    assert sum(len(s) for s in seqs[0].values()) == 130


def test_standardize_roundtrip_1rex():
    # reference test_StructureBatch.py:246-255 (NaN-tolerant comparison)
    sb = StructureBatch.from_pdb_id("1REX")
    xyz = np.asarray(sb.get_xyz())
    back = np.asarray(sb.standardize().unstandardize().get_xyz())
    mask = ~np.isnan(xyz)
    np.testing.assert_allclose(back[mask], xyz[mask], rtol=1e-4, atol=1e-5)
    assert np.isnan(back[~mask]).all()


def test_standardized_not_nan_on_valid_atoms():
    sb = StructureBatch.from_pdb_id("1REX")
    std = sb.standardize()
    xyz = np.asarray(std.get_xyz())
    am = np.asarray(std.get_atom_mask())
    assert not np.isnan(xyz[am]).any()


def test_center_at_1rex():
    sb = StructureBatch.from_pdb_id("1REX")
    centered = sb.center_at()
    np.testing.assert_allclose(
        np.asarray(centered.center_of_mass()), 0.0, atol=1e-4
    )


def test_residue_masked_select_1rex():
    sb = StructureBatch.from_pdb_id("1REX")
    rng = np.random.RandomState(0)
    mask = rng.randint(0, 2, size=(1, 130)).astype(bool)
    sub = sb.residue_masked_select(mask)
    assert sub.get_xyz().shape == (1, mask.sum(), 15, 3)


def test_gap_filling_unk():
    """Intra-chain numbering gaps appear as atom-less UNK residues."""
    import io

    pdb_text = "".join(
        [
            "ATOM      1  N   ALA A   1       0.000   0.000   0.000  1.00  0.00\n",
            "ATOM      2  CA  ALA A   1       1.458   0.000   0.000  1.00  0.00\n",
            "ATOM      3  C   ALA A   1       2.000   1.400   0.000  1.00  0.00\n",
            # gap: residues 2, 3 missing
            "ATOM      4  N   GLY A   4       5.000   0.000   0.000  1.00  0.00\n",
            "ATOM      5  CA  GLY A   4       6.458   0.000   0.000  1.00  0.00\n",
            "ATOM      6  C   GLY A   4       7.000   1.400   0.000  1.00  0.00\n",
        ]
    )
    p = parse_pdb(io.BytesIO(pdb_text.encode()))
    assert p.n_residues == 4
    assert p.get_seq() == "AXXG"
    assert not p.atom_mask[1].any() and not p.atom_mask[2].any()
    assert np.isnan(p.atom_xyz[1]).all()
    assert p.chain_idx.tolist() == [0, 0, 0, 0]


def test_no_gap_filling_across_chains():
    import io

    pdb_text = "".join(
        [
            "ATOM      1  N   ALA A  10       0.000   0.000   0.000  1.00  0.00\n",
            "ATOM      2  CA  ALA A  10       1.458   0.000   0.000  1.00  0.00\n",
            "ATOM      3  N   GLY B  90       5.000   0.000   0.000  1.00  0.00\n",
            "ATOM      4  CA  GLY B  90       6.458   0.000   0.000  1.00  0.00\n",
        ]
    )
    p = parse_pdb(io.BytesIO(pdb_text.encode()))
    assert p.n_residues == 2
    assert p.chain_idx.tolist() == [0, 1]
    assert p.chain_order == ["A", "B"]


def test_non_standard_residue_substitution():
    import io

    pdb_text = "".join(
        [
            "HETATM    1  N   MSE A   1       0.000   0.000   0.000  1.00  0.00\n",
            "HETATM    2  CA  MSE A   1       1.458   0.000   0.000  1.00  0.00\n",
            "HETATM    3  SD  MSE A   1       3.000   1.000   0.000  1.00  0.00\n",
            "ATOM      4  O   HOH A 100       9.000   9.000   9.000  1.00  0.00\n",
        ]
    )
    p = parse_pdb(io.BytesIO(pdb_text.encode()))
    assert p.n_residues == 1  # water dropped
    assert p.get_seq() == "M"  # MSE -> MET
    assert p.atom_mask[0, 6]  # SD sits in MET slot 6


def test_altloc_first_kept():
    import io

    pdb_text = "".join(
        [
            "ATOM      1  N  AALA A   1       0.000   0.000   0.000  0.50  0.00\n",
            "ATOM      2  N  BALA A   1       9.000   9.000   9.000  0.50  0.00\n",
            "ATOM      3  CA  ALA A   1       1.458   0.000   0.000  1.00  0.00\n",
        ]
    )
    p = parse_pdb(io.BytesIO(pdb_text.encode()))
    assert p.n_residues == 1
    np.testing.assert_allclose(p.atom_xyz[0, 0], [0.0, 0.0, 0.0])


def test_writer_roundtrip(tmp_path):
    sb = StructureBatch.from_pdb_id("1REX")
    out = tmp_path / "rt.pdb"
    structure_batch_to_pdb(sb, str(out))
    sb2 = StructureBatch.from_pdb(str(out))
    assert sb2.get_batch_size() == 1
    # same valid-backbone coordinates to printf precision (3 decimals)
    m1 = np.asarray(sb.get_atom_mask())
    m2 = np.asarray(sb2.get_atom_mask())
    # residue counts match
    assert sb2.n_residues == sb.n_residues
    both = m1 & m2
    np.testing.assert_allclose(
        np.asarray(sb.get_xyz())[both], np.asarray(sb2.get_xyz())[both], atol=1.5e-3
    )


def test_gzip_ingest(tmp_path):
    import gzip

    src = open(pdb_path("1REX.pdb"), "rb").read()
    gz = tmp_path / "1rex.pdb.gz"
    gz.write_bytes(gzip.compress(src))
    sb = StructureBatch.from_pdb(str(gz))
    assert sb.get_xyz().shape == (1, 130, 15, 3)


def test_cif_writer_roundtrip(tmp_path):
    from protstruc_tpu.pdbio.writer import structure_batch_to_cif

    sb = StructureBatch.from_pdb_id("1REX")
    out = tmp_path / "rt.cif"
    structure_batch_to_cif(sb, str(out))
    sb2 = StructureBatch.from_pdb(str(out))  # auto-detects mmCIF
    assert sb2.n_residues == sb.n_residues
    m = np.asarray(sb.get_atom_mask()) & np.asarray(sb2.get_atom_mask())
    np.testing.assert_allclose(
        np.asarray(sb.get_xyz())[m], np.asarray(sb2.get_xyz())[m], atol=1.5e-3
    )
    assert sb2.get_seq() == sb.get_seq()


def test_get_chain_mask():
    sb = StructureBatch.from_pdb(pdb_path("1ad0_DC.pdb"))
    md = np.asarray(sb.get_chain_mask("D"))
    mc = np.asarray(sb.get_chain_mask("C"))
    assert md.any() and mc.any()
    assert not (md & mc).any()
    total = int(np.asarray(sb.residue_mask).sum())
    assert ((md | mc) & np.asarray(sb.residue_mask)).sum() == total
    assert not np.asarray(sb.get_chain_mask("Z")).any()


def test_to_pdb_writer_legacy_format(tmp_path):
    coords = np.random.rand(5, 4, 3).astype(np.float32) * 10
    out = tmp_path / "bb.pdb"
    to_pdb(str(out), coords, ["ACGY"], ["A"])
    p = parse_pdb(str(out))
    assert p.n_residues == 4
    assert p.get_seq() == "ACGY"
    # G has no CB line
    assert not p.atom_mask[2, 4]
    assert p.atom_mask[0, 4]
