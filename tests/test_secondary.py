"""Secondary-structure assignment tests on real structures."""

import jax.numpy as jnp
import numpy as np
import pytest

from protstruc_tpu import StructureBatch
from protstruc_tpu.ops.secondary import (
    SS_COIL,
    SS_HELIX,
    SS_STRAND,
    assign_secondary_structure,
    hbond_energy_map,
)

from tests.conftest import pdb_path


def _ss_of(sb):
    xyz = jnp.nan_to_num(sb.get_xyz(), nan=0.0)
    return assign_secondary_structure(
        xyz[:, :, 0], xyz[:, :, 1], xyz[:, :, 2], xyz[:, :, 3], sb.residue_mask
    )


def test_lysozyme_is_helix_rich():
    # 1REX (human lysozyme): ~35-40% helix, little strand
    sb = StructureBatch.from_pdb(pdb_path("1REX.pdb"))
    ss, hb = _ss_of(sb)
    m = np.asarray(sb.residue_mask)
    frac_h = (np.asarray(ss) == SS_HELIX)[m].mean()
    frac_e = (np.asarray(ss) == SS_STRAND)[m].mean()
    assert 0.2 < frac_h < 0.6, frac_h
    assert frac_e < frac_h
    assert np.asarray(hb).any()


def test_antibody_is_strand_rich():
    # immunoglobulin folds are beta sandwiches
    sb = StructureBatch.from_pdb(pdb_path("6dc4.pdb"))
    ss, _ = _ss_of(sb)
    m = np.asarray(sb.residue_mask)
    frac_h = (np.asarray(ss) == SS_HELIX)[m].mean()
    frac_e = (np.asarray(ss) == SS_STRAND)[m].mean()
    assert frac_e > 0.2, frac_e
    assert frac_e > frac_h


def test_ideal_helix_from_torsions():
    # a NeRF-folded ideal alpha-helix must assign as helix in the interior
    tor = np.zeros((1, 30, 3), np.float32)
    tor[:, :, 0] = -1.05
    tor[:, :, 1] = -0.79
    tor[:, :, 2] = np.pi
    sb = StructureBatch.from_dihedrals(tor)
    ss, _ = _ss_of(sb)
    interior = np.asarray(ss)[0, 4:-6]
    assert (interior == SS_HELIX).mean() > 0.8, interior


def test_extended_chain_is_coil():
    sb = StructureBatch.from_sequence("A" * 30)
    ss, _ = _ss_of(sb)
    assert (np.asarray(ss)[0] == SS_COIL).all()


def test_energy_map_masks():
    sb = StructureBatch.from_pdb(pdb_path("1REX.pdb"))
    xyz = jnp.nan_to_num(sb.get_xyz(), nan=0.0)
    e = hbond_energy_map(
        xyz[:, :, 0], xyz[:, :, 1], xyz[:, :, 2], xyz[:, :, 3], sb.residue_mask
    )
    E = np.asarray(e)
    L = E.shape[1]
    ij = np.abs(np.arange(L)[:, None] - np.arange(L)[None, :])
    assert (E[0][ij <= 1] == 0).all()   # no self/neighbor bonds
    assert (E[0][:, 0] == 0).all()      # first residue has no amide H
    assert (E < 0).any()                # real H-bonds exist


class TestAuthorAnnotationOracle:
    """Ground truth: wwPDB HELIX/SHEET author annotations (VERDICT r2 item 6).

    The curator-assigned records in the PDB header are an external oracle
    for the device-side DSSP-style assignment — per-residue agreement, not
    "helix-rich" plausibility bounds.
    """

    @staticmethod
    def _agreement(name):
        from protstruc_tpu.pdbio.annotations import (
            author_ss_classes, parse_ss_records)
        from protstruc_tpu.pdbio.parser import parse_pdb

        sb = StructureBatch.from_pdb(pdb_path(name))
        st = parse_pdb(pdb_path(name))
        recs = parse_ss_records(pdb_path(name))
        assert recs, f"{name} has no annotations"
        # alpha_only: the 4-turn detector matches PDB helix class 1; 3-10
        # helices (class 5) are legitimately coil here
        auth_alpha = author_ss_classes(
            recs, st.chain_id_per_res, st.residue_number, alpha_only=True)
        auth_any = author_ss_classes(
            recs, st.chain_id_per_res, st.residue_number)
        ss, _ = _ss_of(sb)
        ss = np.asarray(ss)[0][: len(auth_alpha)]
        return ss, auth_alpha, auth_any

    def test_1rex_per_residue_agreement(self):
        ss, alpha, any_ = self._agreement("1REX.pdb")
        helix = alpha == SS_HELIX
        strand = alpha == SS_STRAND
        assert (ss[helix] == SS_HELIX).mean() >= 0.85   # measured 0.95
        assert (ss[strand] == SS_STRAND).mean() >= 0.9  # measured 1.00
        # precision: residues we call helix are author-annotated helix
        called_h = ss == SS_HELIX
        assert (any_[called_h] == SS_HELIX).mean() >= 0.9  # measured 1.00

    def test_1ad0_per_residue_agreement(self):
        ss, alpha, any_ = self._agreement("1ad0_DC.pdb")
        strand = alpha == SS_STRAND
        assert strand.sum() > 150
        assert (ss[strand] == SS_STRAND).mean() >= 0.9  # measured 0.97
        called_e = ss == SS_STRAND
        assert (any_[called_e] == SS_STRAND).mean() >= 0.75  # measured 0.86
        helix = alpha == SS_HELIX
        assert (ss[helix] == SS_HELIX).mean() >= 0.5  # 12 residues, measured 0.67


class TestSS8:
    """Full 8-class DSSP alphabet (helices G/H/I, E/B, T, S, C)."""

    @staticmethod
    def _ss8_of(sb):
        from protstruc_tpu.ops.secondary import assign_secondary_structure_8

        xyz = jnp.nan_to_num(sb.get_xyz(), nan=0.0)
        return assign_secondary_structure_8(
            xyz[:, :, 0], xyz[:, :, 1], xyz[:, :, 2], xyz[:, :, 3],
            sb.residue_mask)

    def test_310_helix_oracle_1rex(self):
        """Author class-5 HELIX records (3-10) are detected as G — the
        alpha-only 3-class correctly leaves them coil; the 8-class must
        pick them up."""
        from protstruc_tpu.ops.secondary import SS8_310, SS8_HELIX
        from protstruc_tpu.pdbio.annotations import parse_ss_records
        from protstruc_tpu.pdbio.parser import parse_pdb

        sb = StructureBatch.from_pdb(pdb_path("1REX.pdb"))
        ss8 = np.asarray(self._ss8_of(sb))[0]
        st = parse_pdb(pdb_path("1REX.pdb"))
        g_res = np.zeros(len(st.residue_number), bool)
        for r in parse_ss_records(pdb_path("1REX.pdb")):
            if r.kind == "helix" and r.helix_class == 5:
                g_res |= ((st.chain_id_per_res == r.chain_id)
                          & (st.residue_number >= r.start)
                          & (st.residue_number <= r.end))
        assert g_res.sum() >= 10
        hit = ss8[: len(g_res)][g_res] == SS8_310
        assert hit.mean() >= 0.8, hit.mean()  # measured 14/15

    def test_consistent_with_3class_on_cores(self):
        """8->3 grouping agrees with the 3-class assignment on alpha-helix
        and strand residues (the classes both alphabets define)."""
        from protstruc_tpu.ops.secondary import SS8_TO_3

        sb = StructureBatch.from_pdb(pdb_path("1ad0_DC.pdb"))
        ss3, _ = _ss_of(sb)
        ss8 = self._ss8_of(sb)
        grouped = np.asarray(SS8_TO_3)[np.asarray(ss8)]
        ss3 = np.asarray(ss3)
        core = (ss3 == SS_HELIX) | (ss3 == SS_STRAND)
        agree = (grouped == ss3)[core].mean()
        assert agree >= 0.95, agree

    def test_ideal_helix_is_H(self):
        from protstruc_tpu.ops.secondary import SS8_HELIX

        tor = np.zeros((1, 30, 3), np.float32)
        tor[:, :, 0] = -1.05
        tor[:, :, 1] = -0.79
        tor[:, :, 2] = np.pi
        sb = StructureBatch.from_dihedrals(tor)
        ss8 = np.asarray(self._ss8_of(sb))[0]
        assert (ss8[4:-6] == SS8_HELIX).mean() > 0.8


def test_two_chain_batch_matches_per_chain_assignment():
    """SS of each chain in a two-chain structure equals the chains
    assessed individually: the amide-H and bend constructions must not
    leak across the chain boundary."""
    import jax.numpy as jnp

    from protstruc_tpu import StructureBatch
    from tests.conftest import pdb_path

    sb = StructureBatch.from_pdb(pdb_path("1ad0_DC.pdb"))  # two chains
    ci = np.asarray(sb.chain_idx)[0]
    rm = np.asarray(sb.residue_mask)[0]
    ss_joint8 = np.asarray(sb.secondary_structure_8())[0]
    ss_joint3 = np.asarray(sb.secondary_structure())[0]

    for code in np.unique(ci[ci >= 0]):
        keep = (ci == code)
        sub = sb.residue_masked_select(keep[None])
        np.testing.assert_array_equal(
            np.asarray(sub.secondary_structure_8())[0],
            ss_joint8[keep], err_msg=f"chain {code} SS8")
        np.testing.assert_array_equal(
            np.asarray(sub.secondary_structure())[0],
            ss_joint3[keep], err_msg=f"chain {code} SS3")
