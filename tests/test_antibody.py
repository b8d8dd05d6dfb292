"""AntibodyStructureBatch tests (mirrors reference
tests/test_AntibodyStructureBatch.py plus CDR/anchor-mask invariants)."""

import numpy as np
import pytest

from protstruc_tpu import AntibodyStructureBatch
from protstruc_tpu.antibody import NUMBERING_SCHEMES

from tests.conftest import pdb_path


@pytest.fixture(scope="module")
def ab6dc4():
    return AntibodyStructureBatch.from_pdb(pdb_path("6dc4.pdb"), "H", "L")


def test_shapes_6dc4(ab6dc4):
    # reference test_AntibodyStructureBatch.py:8-13
    assert ab6dc4.get_xyz().shape == (1, 437, 15, 3)
    assert ab6dc4.get_atom_mask().shape == (1, 437, 15)


def test_chain_masks_cover_everything(ab6dc4):
    h = np.asarray(ab6dc4.get_heavy_chain_mask())
    l = np.asarray(ab6dc4.get_light_chain_mask())
    ag = np.asarray(ab6dc4.get_antigen_mask())
    assert h.shape == (1, 437)
    assert not (h & l).any()
    assert not ag.any()  # no antigen requested
    assert (h | l).sum() == 437
    assert ab6dc4.get_heavy_chain_id() == ["H"]
    assert ab6dc4.get_light_chain_id() == ["L"]


def test_cdr_masks(ab6dc4):
    cdr_all = np.asarray(ab6dc4.get_cdr_mask())
    assert cdr_all.any()
    h3 = np.asarray(ab6dc4.get_cdr_mask("H3"))
    assert h3.any()
    # H3 inside heavy chain only
    assert not (h3 & ~np.asarray(ab6dc4.get_heavy_chain_mask())).any()
    # union of singles == all
    singles = np.zeros_like(cdr_all)
    for name in ["H1", "H2", "H3", "L1", "L2", "L3"]:
        singles |= np.asarray(ab6dc4.get_cdr_mask(name))
    np.testing.assert_array_equal(singles, cdr_all)


def test_cdr_ranges_match_chothia(ab6dc4):
    h1 = np.asarray(ab6dc4.get_cdr_mask("H1"))[0]
    ridx = np.asarray(ab6dc4.residue_idx[0])
    heavy = np.asarray(ab6dc4.get_heavy_chain_mask())[0]
    # the H1 loop length under Chothia is 7 (26..32) when fully resolved
    lo, hi = NUMBERING_SCHEMES["chothia"]["H1"]
    assert h1.sum() <= (hi - lo + 1)
    assert (heavy[h1]).all()


def test_cdr_anchor_mask(ab6dc4):
    cdr = np.asarray(ab6dc4.get_cdr_mask())
    anchors = np.asarray(ab6dc4.get_cdr_anchor_mask())
    # anchors never inside CDRs and each is adjacent to a CDR residue
    assert not (anchors & cdr).any()
    adj = np.zeros_like(cdr)
    adj[:, :-1] |= cdr[:, 1:]
    adj[:, 1:] |= cdr[:, :-1]
    assert (adj[anchors]).all()
    # 6 loops x 2 anchors on fully resolved chains
    assert anchors.sum() == 12

    with pytest.raises(ValueError):
        ab6dc4.get_cdr_anchor_mask("H9")


def test_keep_fv_only():
    full = AntibodyStructureBatch.from_pdb(pdb_path("6dc4.pdb"), "H", "L")
    fv = AntibodyStructureBatch.from_pdb(
        pdb_path("6dc4.pdb"), "H", "L", keep_fv_only=True
    )
    assert fv.n_residues < full.n_residues
    # all retained author residue numbers fall inside the Fv ranges
    # (insertion codes allow more residues than the numeric span)
    from protstruc_tpu.pdbio.parser import parse_pdb

    p = parse_pdb(
        pdb_path("6dc4.pdb"),
        chains=["H", "L"],
        residue_range_by_chain={"H": (1, 113), "L": (1, 106)},
    )
    assert fv.n_residues == p.n_residues
    heavy = p.chain_id_per_res == "H"
    assert (p.residue_number[heavy] <= 113).all()
    assert (p.residue_number[~heavy] <= 106).all()


def test_antigen_chains():
    ab = AntibodyStructureBatch.from_pdb(
        pdb_path("1a6v_JN.pdb"), "H", "L", antigen_chain_ids=None
    )
    assert (np.asarray(ab.get_n_terminal_mask().sum(axis=1)) == 2).all()
    assert np.asarray(ab.get_heavy_chain_mask()).any()
    assert np.asarray(ab.get_light_chain_mask()).any()


def test_batch_of_antibodies():
    ab = AntibodyStructureBatch.from_pdb(
        [pdb_path("15c8_HL.pdb"), pdb_path("5cjx_HL.pdb")],
        heavy_chain_id=["H", "H"],
        light_chain_id=["L", "L"],
    )
    assert ab.get_batch_size() == 2
    h = np.asarray(ab.get_heavy_chain_mask())
    assert h.shape[0] == 2 and h.any(axis=1).all()
    # featurization still works on the subclass
    d, m = ab.backbone_dihedrals()
    assert d.shape[0] == 2 and d.shape[2] == 3


def test_from_pdb_id_antibody():
    ab = AntibodyStructureBatch.from_pdb_id("6dc4", "H", "L")
    assert ab.get_xyz().shape == (1, 437, 15, 3)
    assert np.asarray(ab.get_cdr_mask()).any()


def test_invalid_scheme():
    with pytest.raises(ValueError):
        AntibodyStructureBatch.from_pdb(pdb_path("6dc4.pdb"), "H", "L",
                                        numbering_scheme="martin")


def test_imgt_and_kabat_schemes_accepted():
    for scheme in ["kabat", "imgt"]:
        ab = AntibodyStructureBatch.from_pdb(
            pdb_path("6dc4.pdb"), "H", "L", numbering_scheme=scheme
        )
        assert ab.numbering_scheme == scheme
        assert np.asarray(ab.get_cdr_mask()).any()


def test_residue_compact_reorders_masks(ab6dc4):
    import jax.numpy as jnp

    # keep only the heavy chain; CDR masks must follow the reordering
    hmask = ab6dc4.get_heavy_chain_mask()
    comp = ab6dc4.residue_compact(hmask)
    n_h = int(np.asarray(hmask).sum())
    assert np.asarray(comp.get_heavy_chain_mask())[:, :n_h].all()
    assert not np.asarray(comp.get_heavy_chain_mask())[:, n_h:].any()
    assert not np.asarray(comp.get_light_chain_mask()).any()
    # H-loop CDR count preserved, L-loops gone
    h_cdrs = np.asarray(ab6dc4.get_cdr_mask(["H1", "H2", "H3"])).sum()
    assert np.asarray(comp.get_cdr_mask(["H1", "H2", "H3"])).sum() == h_cdrs
    assert np.asarray(comp.get_cdr_mask(["L1", "L2", "L3"])).sum() == 0


def test_pytree_with_masks():
    import jax

    ab = AntibodyStructureBatch.from_pdb(pdb_path("6dc4.pdb"), "H", "L")

    @jax.jit
    def cdr_count(batch):
        return batch.get_cdr_mask().sum()

    assert int(cdr_count(ab)) == int(np.asarray(ab.get_cdr_mask()).sum())


class TestWrongSchemeGuard:
    """Feeding a Chothia-numbered file under a mismatched scheme: since r4
    the default (source_scheme="auto") detects the file's scheme from its
    conserved-Cys anchors and CONVERTS the numbering (protstruc_tpu/
    numbering.py) — correct masks, no warning.  source_scheme=None keeps
    the r3 behavior: ranges applied as-is plus a loud diagnostic (the
    reference's silent-Chothia bug, protstruc.py:1084-1087)."""

    def test_imgt_on_chothia_numbered_file_converts_silently(self):
        import warnings

        import protstruc_tpu as ps

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            ab = ps.AntibodyStructureBatch.from_pdb(
                "tests/data/6dc4.pdb", heavy_chain_id="H", light_chain_id="L",
                numbering_scheme="imgt",
            )
        msgs = [str(x.message) for x in w if issubclass(x.category, UserWarning)]
        assert not msgs, msgs
        for name in ["H1", "H2", "H3", "L1", "L2", "L3"]:
            assert np.asarray(ab.get_cdr_mask(name)).any(), name

    def test_imgt_on_chothia_numbered_file_warns_without_conversion(self):
        import warnings

        import protstruc_tpu as ps

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            ps.AntibodyStructureBatch.from_pdb(
                "tests/data/6dc4.pdb", heavy_chain_id="H", light_chain_id="L",
                numbering_scheme="imgt", source_scheme=None,
            )
        msgs = [str(x.message) for x in w if issubclass(x.category, UserWarning)]
        assert any("numbering" in m and "scheme" in m for m in msgs), msgs

    def test_matching_scheme_is_silent(self):
        import warnings

        import protstruc_tpu as ps

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            ps.AntibodyStructureBatch.from_pdb(
                "tests/data/6dc4.pdb", heavy_chain_id="H", light_chain_id="L",
                numbering_scheme="chothia",
            )
        msgs = [str(x.message) for x in w
                if issubclass(x.category, UserWarning) and "scheme" in str(x.message)]
        assert not msgs, msgs
