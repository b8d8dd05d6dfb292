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
