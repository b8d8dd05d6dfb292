"""Buckets, serialization, compat adapter, fv mask."""

import io

import numpy as np
import pytest

from protstruc_tpu import AntibodyStructureBatch, StructureBatch
from protstruc_tpu.utils.buckets import DEFAULT_BUCKETS, bucket_length, pad_batch_to_bucket
from protstruc_tpu.utils.serialization import load_structure_batch, save_structure_batch

from tests.conftest import pdb_path


def test_bucket_length():
    assert bucket_length(1) == 64
    assert bucket_length(64) == 64
    assert bucket_length(65) == 128
    assert bucket_length(130) == 256
    assert bucket_length(513) == 768
    assert bucket_length(3000) == 3072  # beyond table -> multiple of 128


def test_pad_batch_to_bucket():
    sb = StructureBatch.from_pdb(pdb_path("1REX.pdb"))  # L=130
    padded = pad_batch_to_bucket(sb)
    assert padded.n_residues == 256
    assert int(padded.residue_mask.sum()) == int(sb.residue_mask.sum())
    np.testing.assert_array_equal(np.asarray(padded.chain_idx[0, 130:]), -1)
    # featurization results agree on the valid region
    d1, m1 = sb.backbone_dihedrals()
    d2, m2 = padded.backbone_dihedrals()
    np.testing.assert_array_equal(np.asarray(m2[:, :130]), np.asarray(m1))
    np.testing.assert_allclose(
        np.asarray(d2[:, :130])[np.asarray(m1)], np.asarray(d1)[np.asarray(m1)], atol=1e-6
    )
    assert not np.asarray(m2[:, 130:]).any()
    # idempotent
    assert pad_batch_to_bucket(padded) is padded


def test_pad_batch_pads_antibody_masks():
    ab = AntibodyStructureBatch.from_pdb(pdb_path("6dc4.pdb"), "H", "L")
    padded = pad_batch_to_bucket(ab)  # 437 -> 512
    assert padded.n_residues == 512
    h = np.asarray(padded.get_heavy_chain_mask())
    assert h.shape == (1, 512)
    assert h.sum() == np.asarray(ab.get_heavy_chain_mask()).sum()
    assert not h[0, 437:].any()


def test_concat_batches():
    from protstruc_tpu.utils.buckets import concat_batches

    a = StructureBatch.from_pdb(pdb_path("1REX.pdb"))    # L=130
    b = StructureBatch.from_pdb(pdb_path("4EOT.pdb"))    # L=184
    cat = concat_batches([a, b])
    assert cat.get_batch_size() == 2
    assert cat.n_residues == 256  # common bucket
    assert sorted(np.asarray(cat.get_total_lengths()).tolist()) == [130, 184]
    assert cat.get_seq()[0] == a.get_seq()[0]
    assert cat.get_seq()[1] == b.get_seq()[0]

    # antibody masks concatenate too
    ab1 = AntibodyStructureBatch.from_pdb(pdb_path("6dc4.pdb"), "H", "L")
    ab2 = AntibodyStructureBatch.from_pdb(pdb_path("15c8_HL.pdb"), "H", "L")
    abc = concat_batches([ab1, ab2])
    assert abc.get_heavy_chain_mask().shape == (2, abc.n_residues)
    assert np.asarray(abc.get_cdr_mask()).any(axis=1).all()

    with pytest.raises(ValueError):
        concat_batches([a, a.standardize()])


def test_serialization_roundtrip_plain():
    sb = StructureBatch.from_pdb(pdb_path("1ad0_DC.pdb")).standardize()
    buf = io.BytesIO()
    save_structure_batch(sb, buf)
    buf.seek(0)
    back = load_structure_batch(buf)
    assert type(back).__name__ == "StructureBatch"
    assert back.standardized
    np.testing.assert_allclose(np.asarray(back.mu), np.asarray(sb.mu), atol=0)
    x1, x2 = np.asarray(sb.get_xyz()), np.asarray(back.get_xyz())
    m = ~np.isnan(x1)
    np.testing.assert_allclose(x1[m], x2[m], atol=0)
    assert back.get_seq() == sb.get_seq()
    assert back.get_chain_ids() == sb.get_chain_ids()


def test_serialization_roundtrip_antibody():
    ab = AntibodyStructureBatch.from_pdb(pdb_path("6dc4.pdb"), "H", "L")
    buf = io.BytesIO()
    save_structure_batch(ab, buf)
    buf.seek(0)
    back = load_structure_batch(buf)
    assert type(back).__name__ == "AntibodyStructureBatch"
    np.testing.assert_array_equal(
        np.asarray(back.get_cdr_mask()), np.asarray(ab.get_cdr_mask())
    )
    assert back.get_heavy_chain_id() == ["H"]
    assert back.numbering_scheme == "chothia"


def test_fv_mask():
    ab = AntibodyStructureBatch.from_pdb(pdb_path("6dc4.pdb"), "H", "L")
    fv = np.asarray(ab.get_fv_mask())
    h = np.asarray(ab.get_heavy_chain_mask())
    l = np.asarray(ab.get_light_chain_mask())
    assert fv.any()
    assert (fv <= (h | l)).all()  # fv is a subset of the two chains
    # CDRs live inside the Fv region
    cdr = np.asarray(ab.get_cdr_mask())
    assert (cdr <= fv).all()
    # trimming to Fv keeps exactly the fv residues
    fv_only = AntibodyStructureBatch.from_pdb(
        pdb_path("6dc4.pdb"), "H", "L", keep_fv_only=True
    )
    assert fv_only.n_residues == fv.sum()


def test_compat_numpy_echo():
    from protstruc_tpu.compat import geometry as cgeom
    import jax.numpy as jnp

    a = np.array([[1.0, 0, 0]], np.float32)
    b = np.zeros((1, 3), np.float32)
    c = np.array([[0.0, 1, 0]], np.float32)
    d = np.array([[0.0, 1, 1]], np.float32)

    out = cgeom.dihedral(a, b, c, d, to_degree=True)
    assert isinstance(out, np.ndarray)
    np.testing.assert_allclose(out, [-90.0], atol=1e-4)

    out_jax = cgeom.dihedral(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d))
    assert not isinstance(out_jax, np.ndarray)

    # tuple outputs (kabsch) convert too
    r, t = cgeom.kabsch(np.random.randn(10, 3), np.random.randn(10, 3))
    assert isinstance(r, np.ndarray) and isinstance(t, np.ndarray)


def test_antibody_roundtrip_without_residue_masks(tmp_path):
    """An AntibodyStructureBatch with residue_masks=None must round-trip
    (the loader reads the chain-id metadata unconditionally)."""
    import jax.numpy as jnp

    from protstruc_tpu.antibody import AntibodyStructureBatch
    from protstruc_tpu.utils.serialization import (
        load_structure_batch, save_structure_batch)

    rng = np.random.RandomState(0)
    ab = AntibodyStructureBatch(
        xyz=jnp.asarray(rng.randn(1, 8, 15, 3).astype(np.float32)),
        atom_mask=jnp.ones((1, 8, 15), bool),
        chain_idx=jnp.zeros((1, 8), jnp.int32),
        residue_idx=jnp.arange(8, dtype=jnp.int32)[None],
        chain_ids=None, seq=None,
        residue_masks=None, heavy_chain_id=("H",), light_chain_id=(None,),
        antigen_chain_ids=((),))
    p = str(tmp_path / "ab.npz")
    save_structure_batch(ab, p)
    back = load_structure_batch(p)
    assert type(back).__name__ == "AntibodyStructureBatch"
    assert back.heavy_chain_id == ("H",)


def test_save_load_path_without_npz_suffix(tmp_path):
    from protstruc_tpu import StructureBatch
    from protstruc_tpu.utils.serialization import (
        load_structure_batch, save_structure_batch)

    sb = StructureBatch.from_xyz(np.zeros((1, 4, 15, 3), np.float32))
    p = str(tmp_path / "batch.bin")  # no .npz suffix
    save_structure_batch(sb, p)
    back = load_structure_batch(p)
    assert back.xyz.shape == (1, 4, 15, 3)


def test_validate_batch_catches_nonstandard_pad_and_residue_idx():
    from protstruc_tpu import StructureBatch
    from protstruc_tpu.utils.checks import validate_batch

    xyz = np.zeros((1, 6, 15, 3), np.float32)
    am = np.zeros((1, 6, 15), bool)
    am[0, :3] = True
    sb = StructureBatch.from_xyz(xyz, am)
    # corrupt padding with a -2 chain idx and garbage residue_idx
    sb = sb.replace(
        chain_idx=sb.chain_idx.at[0, 4].set(-2),
        residue_idx=sb.residue_idx.at[0, 5].set(99))
    problems = validate_batch(sb, raise_on_error=False)
    assert any("chain_idx not -1" in p for p in problems)
    assert any("residue_idx not -1" in p for p in problems)
