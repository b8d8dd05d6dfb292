"""StructureBatch tests (ports of reference tests/test_StructureBatch.py
that don't need PDB parsing, plus pytree/jit behavior checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protstruc_tpu import StructureBatch
from protstruc_tpu.vocab import ATOM


def _random_batch(bsz=4, n_res=50, n_atoms=15, seed=0, chains=True):
    rng = np.random.RandomState(seed)
    xyz = rng.rand(bsz, n_res, n_atoms, 3).astype(np.float32)
    if chains:
        chain_idx = np.zeros((bsz, n_res))
        chain_idx[:, 20:40] = 1.0
        chain_idx[:, 40:] = 2.0
        chain_ids = [["A", "B", "C"] for _ in range(bsz)]
        return StructureBatch.from_xyz(xyz, chain_idx=chain_idx, chain_ids=chain_ids)
    return StructureBatch.from_xyz(xyz)


def test_from_xyz_basic():
    sb = _random_batch(16, 100, 25, chains=False)
    assert sb.get_batch_size() == 16
    assert sb.get_max_n_residues() == 100
    assert sb.get_max_n_atoms_per_residue() == 25
    assert sb.get_xyz().shape == (16, 100, 25, 3)
    assert bool(sb.residue_mask.all())


def test_chain_idx_must_come_with_chain_ids():
    xyz = np.random.rand(2, 10, 15, 3)
    with pytest.raises(ValueError):
        StructureBatch.from_xyz(xyz, chain_idx=np.zeros((2, 10)))


def test_chain_idx_must_start_at_zero():
    xyz = np.random.rand(1, 10, 15, 3)
    with pytest.raises(ValueError):
        StructureBatch.from_xyz(
            xyz, chain_idx=np.ones((1, 10)), chain_ids=[["B"]]
        )


def test_terminal_masks_three_chains():
    # reference test_StructureBatch.py:24-41
    sb = _random_batch(16, 100)
    nterm, cterm = sb.get_n_terminal_mask(), sb.get_c_terminal_mask()
    assert nterm.shape == (16, 100)
    assert (np.asarray(nterm.sum(axis=1)) == 3).all()
    assert (np.asarray(cterm.sum(axis=1)) == 3).all()
    # exact positions
    assert bool(nterm[0, 0]) and bool(nterm[0, 20]) and bool(nterm[0, 40])
    assert bool(cterm[0, 19]) and bool(cterm[0, 39]) and bool(cterm[0, 99])


def test_terminal_masks_with_padding():
    xyz = np.random.rand(1, 10, 15, 3).astype(np.float32)
    atom_mask = np.ones((1, 10, 15), bool)
    atom_mask[:, 7:] = False  # residues 7..9 are padding
    chain_idx = np.zeros((1, 10))
    chain_idx[:, 7:] = np.nan  # NaN padding accepted like the reference
    sb = StructureBatch.from_xyz(xyz, atom_mask, chain_idx, chain_ids=[["A"]])
    assert np.asarray(sb.get_n_terminal_mask()).sum() == 1
    assert np.asarray(sb.get_c_terminal_mask()).sum() == 1
    assert bool(sb.get_c_terminal_mask()[0, 6])


def test_backbone_dihedrals_range_and_termini():
    # reference test_StructureBatch.py:68-95
    sb = _random_batch(16, 100, 25)
    dihedrals, dihedral_mask = sb.backbone_dihedrals()
    assert dihedrals.shape == (16, 100, 3)
    assert dihedral_mask.shape == (16, 100, 3)

    d = np.asarray(dihedrals)
    assert (d >= -np.pi).all() and (d <= np.pi).all()
    assert ((d >= -np.pi) & (d < 0)).any() and ((d >= 0) & (d <= np.pi)).any()

    nterm = np.asarray(sb.get_n_terminal_mask())
    cterm = np.asarray(sb.get_c_terminal_mask())
    assert (d[nterm][:, 0] == 0.0).all()
    assert (d[cterm][:, 1] == 0.0).all() and (d[cterm][:, 2] == 0.0).all()


def test_pairwise_distance_matrix_full():
    sb = _random_batch(2, 30)
    dist, mask = sb.pairwise_distance_matrix()
    assert dist.shape == (2, 30, 30, 15, 15)
    assert mask.shape == (2, 30, 30, 15, 15)
    assert (np.asarray(dist) >= 0).all()
    # CA slice equals the fused single-pair map
    d_ca, m_ca = sb.pairwise_atom_distance("CA", "CA")
    np.testing.assert_allclose(
        np.asarray(dist[:, :, :, ATOM.CA, ATOM.CA]), np.asarray(d_ca), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(mask[:, :, :, ATOM.CA, ATOM.CA]), np.asarray(m_ca)
    )


def test_pairwise_dihedrals_shapes():
    sb = _random_batch(1, 40)
    phi = sb.pairwise_dihedrals(["C"], ["N", "CA", "C"])
    assert phi.shape == (1, 40, 40)
    psi = sb.pairwise_dihedrals(["N", "CA", "C"], ["N"])
    assert psi.shape == (1, 40, 40)
    with pytest.raises(ValueError):
        sb.pairwise_dihedrals(["C"], ["N"])
    with pytest.raises(ValueError):
        sb.pairwise_dihedrals(["ZZ"], ["N", "CA", "C"])


def test_backbone_orientations_and_translations():
    sb = _random_batch(2, 25)
    r = sb.backbone_orientations()
    assert r.shape == (2, 25, 3, 3)
    det = np.asarray(jnp.linalg.det(r))
    np.testing.assert_allclose(det, 1.0, atol=1e-3)
    t = sb.backbone_translations()
    np.testing.assert_allclose(
        np.asarray(t), np.asarray(sb.get_xyz()[:, :, ATOM.CA]), atol=0
    )


def test_frames_roundtrip():
    """from_backbone_orientations_translations inverts orientations/translations."""
    sb = _random_batch(2, 20)
    r = sb.backbone_orientations()
    t = sb.backbone_translations()
    sb2 = StructureBatch.from_backbone_orientations_translations(r, t, include_cb=True)
    assert sb2.get_max_n_atoms_per_residue() == 15
    r2 = sb2.backbone_orientations()
    t2 = sb2.backbone_translations()
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-4)


def test_translate_rotate_functional():
    sb = _random_batch(2, 10)
    t = np.ones((2, 10, 3), np.float32)
    sb2 = sb.translate(t)
    # original untouched (immutability)
    np.testing.assert_allclose(np.asarray(sb2.get_xyz()), np.asarray(sb.get_xyz()) + 1.0, atol=1e-6)

    rot = np.eye(3, dtype=np.float32)
    sb3 = sb.rotate(rot)
    np.testing.assert_allclose(np.asarray(sb3.get_xyz()), np.asarray(sb.get_xyz()), atol=1e-6)


def test_standardize_roundtrip():
    sb = _random_batch(2, 30)
    std = sb.standardize()
    assert std.standardized
    back = std.unstandardize()
    np.testing.assert_allclose(
        np.asarray(back.get_xyz()), np.asarray(sb.get_xyz()), rtol=1e-4, atol=1e-5
    )
    with pytest.raises(ValueError):
        std.standardize()
    with pytest.raises(ValueError):
        sb.unstandardize()


def test_standardize_statistics():
    sb = _random_batch(3, 40)
    std = sb.standardize()
    x = np.asarray(std.get_xyz()).reshape(3, -1, 3)
    np.testing.assert_allclose(x.mean(axis=1), 0.0, atol=1e-5)
    np.testing.assert_allclose(x.std(axis=1), 1.0, atol=1e-3)


def test_center_at():
    sb = _random_batch(2, 30)
    centered = sb.center_at()
    np.testing.assert_allclose(np.asarray(centered.center_of_mass()), 0.0, atol=1e-5)

    targets = np.array([[1.0, 2.0, 3.0], [-1.0, 0.0, 5.0]], np.float32)
    moved = sb.center_at(targets)
    np.testing.assert_allclose(np.asarray(moved.center_of_mass()), targets, rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError):
        sb.center_at(np.zeros((5, 3)))
    with pytest.raises(ValueError):
        sb.center_at(np.zeros((2, 4)))


def test_diffuse_xyz():
    sb = _random_batch(2, 30)
    key = jax.random.PRNGKey(0)
    beta = jnp.array([0.01, 0.5])
    noisy = sb.diffuse_xyz(key, beta)
    assert noisy.get_xyz().shape == sb.get_xyz().shape
    # small beta barely changes coords; large beta changes a lot
    d0 = np.abs(np.asarray(noisy.get_xyz() - sb.get_xyz()))[0].mean()
    d1 = np.abs(np.asarray(noisy.get_xyz() - sb.get_xyz()))[1].mean()
    assert d0 < d1


def test_align_recovers_transform():
    sb = _random_batch(3, 20)
    # random rigid transform per structure
    key = jax.random.PRNGKey(1)
    q, _ = jnp.linalg.qr(jax.random.normal(key, (3, 3, 3)))
    det = jnp.linalg.det(q)[:, None, None]
    q = q * jnp.sign(det)
    moved = sb.rotate(q).translate(jnp.ones((3, 1, 3)))

    aligned, (r, t) = sb.align(moved)
    np.testing.assert_allclose(
        np.asarray(aligned.get_xyz()), np.asarray(moved.get_xyz()), atol=1e-4
    )


def test_align_broadcast_target():
    sb = _random_batch(3, 20)
    target = _random_batch(1, 20, seed=9)
    aligned, _ = sb.align(target)
    assert aligned.get_xyz().shape == sb.get_xyz().shape

    with pytest.raises(ValueError):
        sb.align(_random_batch(2, 20))


def test_topk_nearest_residue_mask_batched():
    sb = _random_batch(2, 50)
    query = np.asarray(sb.get_xyz()[0, 5, ATOM.CA])[None]  # one point near residue 5
    m = sb.get_topk_nearest_residue_mask(query, k=10)
    assert m.shape == (2, 50)
    assert np.asarray(m).sum(axis=1).tolist() == [10, 10]
    assert bool(m[0, 5])  # residue 5 itself must be among nearest for batch 0


def test_topk_respects_mask_and_overflow():
    sb = _random_batch(1, 30)
    allow = np.zeros((1, 30), bool)
    allow[0, :5] = True
    m = sb.get_topk_nearest_residue_mask(np.zeros((1, 3)), k=10, mask=allow)
    # only 5 candidates available -> exactly 5 selected despite k=10
    assert np.asarray(m).sum() == 5
    assert np.asarray(m)[0, :5].all()


def test_residue_masked_select():
    sb = _random_batch(1, 30)
    mask = np.zeros((1, 30), bool)
    mask[0, [1, 5, 7, 20]] = True
    sub = sb.residue_masked_select(mask)
    assert sub.get_xyz().shape == (1, 4, 15, 3)
    with pytest.raises(ValueError):
        _random_batch(2, 30).residue_masked_select(np.zeros((2, 30), bool))
    with pytest.raises(ValueError):
        sb.residue_masked_select(np.zeros((1, 30), np.int32))


def test_residue_compact_matches_masked_select():
    sb = _random_batch(1, 30)
    mask = np.zeros((1, 30), bool)
    mask[0, [1, 5, 7, 20]] = True
    sub = sb.residue_masked_select(mask)
    comp = sb.residue_compact(jnp.asarray(mask))
    assert comp.get_xyz().shape == (1, 30, 15, 3)  # static shape
    np.testing.assert_allclose(
        np.asarray(comp.get_xyz()[0, :4]), np.asarray(sub.get_xyz()[0]), atol=0
    )
    assert not np.asarray(comp.residue_mask[0, 4:]).any()


def test_get_total_lengths():
    xyz = np.random.rand(2, 20, 15, 3).astype(np.float32)
    atom_mask = np.ones((2, 20, 15), bool)
    atom_mask[0, 15:] = False  # structure 0 has 15 residues
    atom_mask[1, 10:] = False  # structure 1 has 10
    sb = StructureBatch.from_xyz(xyz, atom_mask)
    np.testing.assert_array_equal(np.asarray(sb.get_total_lengths()), [15, 10])


def test_get_local_xyz_shape():
    sb = _random_batch(2, 25)
    local = sb.get_local_xyz()
    assert local.shape == (2, 25, 15, 3)


def test_inter_residue_geometry_keys():
    sb = _random_batch(1, 20)
    g = sb.inter_residue_geometry()
    for k in ["d_ca", "d_cb", "d_no", "omega", "theta", "phi"]:
        assert g[k].shape == (1, 20, 20), k
    for k in ["d_ca_mask", "d_cb_mask", "d_no_mask"]:
        assert g[k].dtype == jnp.bool_


def test_structurebatch_is_pytree():
    sb = _random_batch(2, 10)
    leaves = jax.tree_util.tree_leaves(sb)
    assert len(leaves) == 4  # xyz, atom_mask, chain_idx, residue_idx

    @jax.jit
    def com(batch):
        return batch.center_of_mass()

    np.testing.assert_allclose(
        np.asarray(com(sb)), np.asarray(sb.center_of_mass()), atol=1e-6
    )

    # vmap over an added leading axis
    stacked = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), sb)
    out = jax.vmap(lambda b: b.center_of_mass())(stacked)
    assert out.shape == (2, 2, 3)


def test_split_chains():
    from tests.conftest import pdb_path

    sb = StructureBatch.from_pdb(pdb_path("1ad0_DC.pdb"))
    chains = sb.split_chains()
    assert len(chains) == 2
    assert sum(c.n_residues for c in chains) == sb.n_residues
    for c in chains:
        assert len(c.get_chain_ids()[0]) == 1
        assert (np.asarray(c.get_n_terminal_mask()).sum(axis=1) == 1).all()
        # sequence metadata restricted to the one chain
        assert len(c.get_seq()[0]) == 1
    with pytest.raises(ValueError):
        _random_batch(2, 10).split_chains()


def test_interface_residues():
    from protstruc_tpu import StructureBatch
    from tests.conftest import pdb_path

    sb = StructureBatch.from_pdb(pdb_path("6dc4.pdb"))  # H + L chains
    iface = np.asarray(sb.interface_residues(cutoff=8.0))
    assert iface.shape == (1, sb.n_residues)
    frac = iface.sum() / np.asarray(sb.residue_mask).sum()
    # an Fab H-L pairing buries a substantial interface, but most residues
    # are not interfacial
    assert 0.05 < frac < 0.5, frac

    # single-chain structure has no interface
    one = StructureBatch.from_pdb(pdb_path("1REX.pdb"))
    assert not np.asarray(one.interface_residues()).any()


def test_random_crop():
    xyz = np.random.rand(2, 40, 15, 3).astype(np.float32)
    atom_mask = np.ones((2, 40, 15), bool)
    atom_mask[1, 20:] = False  # structure 1 has only 20 valid residues
    sb = StructureBatch.from_xyz(xyz, atom_mask)

    crop = sb.random_crop(jax.random.PRNGKey(0), 16)
    assert crop.get_xyz().shape == (2, 16, 15, 3)
    # crops come from the original coordinates
    flat = np.asarray(sb.get_xyz()[0]).reshape(-1)
    assert np.isin(np.asarray(crop.get_xyz()[0]).reshape(-1), flat).all()
    # short structure: window stays inside its 20 valid residues
    assert np.asarray(crop.residue_mask[1]).sum() == 16

    # different keys give different windows (w.h.p.)
    crop2 = sb.random_crop(jax.random.PRNGKey(1), 16)
    assert (np.asarray(crop.residue_idx) != np.asarray(crop2.residue_idx)).any()

    # jit-safe
    out = jax.jit(lambda b, k: b.random_crop(k, 16))(sb, jax.random.PRNGKey(2))
    assert out.get_xyz().shape == (2, 16, 15, 3)

    with pytest.raises(ValueError):
        sb.random_crop(jax.random.PRNGKey(0), 100)


def test_from_sequence():
    sb = StructureBatch.from_sequence(["ACDY", "GG"])
    assert sb.get_xyz().shape == (2, 4, 15, 3)
    idx = np.asarray(sb.get_seq_idx())
    assert idx[0].tolist() == [0, 1, 2, 19]
    assert idx[1, :2].tolist() == [5, 5]
    # padding masked out for the shorter sequence
    assert not np.asarray(sb.residue_mask)[1, 2:].any()
    # extended chain: consecutive CA-CA ~ 3.8 A
    ca = np.asarray(sb.get_xyz()[0, :, 1])
    d = np.linalg.norm(np.diff(ca, axis=0), axis=-1)
    np.testing.assert_allclose(d, 3.8, atol=0.15)


def test_seq_idx():
    xyz = np.random.rand(1, 6, 15, 3)
    sb = StructureBatch.from_xyz(
        xyz,
        chain_idx=np.zeros((1, 6)),
        chain_ids=[["A"]],
        seq=[{"A": "ACDY"}],
    )
    idx = np.asarray(sb.get_seq_idx())
    assert idx.tolist() == [[0, 1, 2, 19, 20, 20]]  # A C D Y UNK UNK


# ---------------------------------------------------------------------------
# round-4 review regressions
# ---------------------------------------------------------------------------


def test_from_sequence_ragged_padding_invariants():
    """Ragged from_sequence padding must carry PAD_IDX in the int fields:
    the short structure's true C-terminus is detected and chain masks
    exclude padding."""
    from protstruc_tpu.batch import PAD_IDX

    sb = StructureBatch.from_sequence(["AAAA", "AA"])
    ci = np.asarray(sb.chain_idx)
    ri = np.asarray(sb.residue_idx)
    assert (ci[1, 2:] == PAD_IDX).all() and (ri[1, 2:] == PAD_IDX).all()

    cterm = np.asarray(sb.get_c_terminal_mask())
    assert cterm[0].nonzero()[0].tolist() == [3]
    assert cterm[1].nonzero()[0].tolist() == [1]  # was missed with 0-pad

    chain_mask = np.asarray(sb.get_chain_mask("A"))
    assert not chain_mask[1, 2:].any()  # padding excluded

    # psi/omega at the short structure's C-term are masked invalid
    _, dmask = sb.backbone_dihedrals()
    dmask = np.asarray(dmask)
    assert not dmask[1, 1, 1] and not dmask[1, 1, 2]


def test_residue_masked_select_preserves_standardization():
    rng = np.random.RandomState(0)
    sb = StructureBatch.from_xyz(rng.randn(1, 8, 15, 3).astype(np.float32))
    std = sb.standardize()
    mask = np.zeros((1, 8), bool)
    mask[0, :5] = True
    sel = std.residue_masked_select(mask)
    assert sel.standardized
    # unstandardize round-trips through the carried statistics
    back = sel.unstandardize()
    expect = np.asarray(sb.xyz)[0, :5]
    np.testing.assert_allclose(np.asarray(back.xyz)[0], expect, atol=1e-4)


def test_topk_nearest_ignores_residues_without_ca():
    """Residues with atoms but no CA (NaN distance) must not steal top-k
    slots: NaN sorts above everything in lax.top_k."""
    rng = np.random.RandomState(1)
    xyz = rng.randn(1, 6, 15, 3).astype(np.float32)
    atom_mask = np.ones((1, 6, 15), bool)
    # residue 0: CA missing (NaN coords) but other atoms present
    xyz[0, 0, 1] = np.nan
    sb = StructureBatch.from_xyz(xyz, atom_mask)
    out = np.asarray(sb.get_topk_nearest_residue_mask(
        np.zeros((1, 1, 3), np.float32), k=3))
    assert out.sum() == 3
    assert not out[0, 0]  # the CA-less residue is excluded, not picked
