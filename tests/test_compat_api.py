"""Reference-layout API shims: module aliases and PDB wrapper classes."""

import numpy as np
import pytest

from tests.conftest import pdb_path


def test_alphabet_alias():
    from protstruc_tpu.alphabet import one2three, three2one

    assert three2one["ALA"] == "A"
    assert one2three["A"] == "ALA"


def test_decorator_alias():
    from protstruc_tpu.decorator import with_tensor

    @with_tensor
    def double(x):
        import jax.numpy as jnp

        return jnp.asarray(x) * 2

    out = double(np.ones(3))
    assert isinstance(out, np.ndarray)


def test_io_alias():
    from protstruc_tpu.io import to_pdb  # noqa: F401


def test_general_alias():
    import protstruc_tpu.general as general

    assert general.ATOM.CA == 1
    assert general.AA("MSE") is general.AA.MET
    assert len(general.restype_to_heavyatom_names[general.AA.TRP]) == 15


def test_geometry_reconstruction_reexports():
    import protstruc_tpu.geometry as geom

    assert callable(geom.reconstruct_backbone_distmat_from_interresidue_geometry)
    assert callable(geom.initialize_backbone_with_mds)
    with pytest.raises(AttributeError):
        geom.not_a_function


def test_pdb_class():
    from protstruc_tpu.pdbio.pdb import PDB

    pdb = PDB.read_pdb(pdb_path("1REX.pdb"))
    xyz, mask = pdb.get_atom_xyz()
    assert xyz.shape == (130, 15, 3)
    assert mask.shape == (130, 15)
    assert pdb.get_chain_ids() == ["A"]
    assert pdb.get_chain_idx().tolist() == [0] * 130
    assert pdb.get_residue_idx().tolist() == list(range(130))
    assert pdb.get_seq().startswith("KVFERCELART")
    assert pdb.get_seq_dict()["A"] == pdb.get_seq()
    assert pdb.get_seq_idx().shape == (130,)
    assert pdb.get_seq_idx()[0] == 8  # K -> LYS


def test_chothia_antibody_pdb_class():
    from protstruc_tpu.pdbio.pdb import ChothiaAntibodyPDB

    pdb = ChothiaAntibodyPDB.read_pdb(pdb_path("6dc4.pdb"), "H", "L")
    assert pdb.n_residues == 437
    h = pdb.get_heavy_chain_mask()
    l = pdb.get_light_chain_mask()
    assert h.sum() + l.sum() == 437
    assert not pdb.get_antigen_mask().any()
    fv = pdb.get_fv_mask()
    assert fv.sum() == 231
    cdr_all = pdb.get_cdr_mask()  # subset=None works (reference crashes here)
    cdr_h3 = pdb.get_cdr_mask("h3")  # case-insensitive like the reference
    assert cdr_h3.sum() > 0 and (cdr_h3 <= cdr_all).all()
    with pytest.raises(ValueError):
        pdb.get_cdr_mask("H9")

    heavy = pdb.get_heavy_chain_structure()
    assert heavy.n_residues == h.sum()
    assert heavy.chain_order == ["H"]
    assert pdb.get_antigen_chains_structure() is None
