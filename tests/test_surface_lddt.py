"""SASA / radius of gyration / contact order / lDDT tests."""

import jax
import jax.numpy as jnp
import numpy as np

import protstruc_tpu as ps
from protstruc_tpu.ops.metrics import lddt
from protstruc_tpu.ops.rigid import random_rotations
from protstruc_tpu.ops.surface import (
    atom_radii_table,
    contact_order,
    radius_of_gyration,
    sasa,
)


def _single_atom_batch(positions):
    """Batch with one ALA residue per position, only the CB atom set."""
    n = len(positions)
    xyz = np.full((1, n, 15, 3), np.nan, np.float32)
    mask = np.zeros((1, n, 15), bool)
    for i, p in enumerate(positions):
        xyz[0, i, 4] = p  # CB slot (carbon)
        mask[0, i, 4] = True
    seq_idx = np.zeros((1, n), np.int32)  # ALA
    return jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(seq_idx)


class TestSASA:
    def test_isolated_atom_full_sphere(self):
        xyz, mask, seq = _single_atom_batch([[0.0, 0.0, 0.0]])
        area = sasa(xyz, mask, seq, per_atom=True)
        r = 1.70 + 1.4  # carbon + probe
        expect = 4.0 * np.pi * r**2
        np.testing.assert_allclose(float(area[0, 0, 4]), expect, rtol=1e-5)

    def test_two_distant_atoms_unoccluded(self):
        xyz, mask, seq = _single_atom_batch([[0.0, 0.0, 0.0], [50.0, 0.0, 0.0]])
        per_res = sasa(xyz, mask, seq)
        r = 1.70 + 1.4
        expect = 4.0 * np.pi * r**2
        np.testing.assert_allclose(np.asarray(per_res[0]), [expect, expect],
                                   rtol=1e-5)

    def test_overlapping_atoms_occlude(self):
        xyz, mask, seq = _single_atom_batch([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        per_res = np.asarray(sasa(xyz, mask, seq))
        r = 1.70 + 1.4
        full = 4.0 * np.pi * r**2
        assert per_res[0, 0] < 0.75 * full
        assert per_res[0, 1] < 0.75 * full

    def test_real_protein_magnitude_and_burial(self):
        sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
        per_res = sasa(sb.xyz, sb.atom_mask, sb.get_seq_idx(), n_points=92)
        total = float(jnp.sum(per_res))
        # lysozyme-family total SASA ~ 6500 A^2 (NACCESS); generous bounds
        assert 4000.0 < total < 11000.0
        per_res = np.asarray(per_res[0])
        # some residues buried (near zero), some exposed (> 100 A^2)
        assert per_res.min() < 15.0
        assert per_res.max() > 100.0

    def test_radii_table(self):
        tab = atom_radii_table()
        assert tab.shape == (21, 15)
        assert tab[0, 1] == np.float32(1.70)   # ALA CA carbon
        assert tab[0, 0] == np.float32(1.55)   # N
        assert (tab[20] == 0).all()            # UNK -> no radius


class TestCompactness:
    def test_rg_known_value(self):
        # two points separated by 2d -> rg = d
        xyz = jnp.asarray(
            np.array([[[[-3.0, 0, 0]] + [[np.nan]*3]*14,
                       [[3.0, 0, 0]] + [[np.nan]*3]*14]], np.float32)
        )
        rg = radius_of_gyration(xyz)
        np.testing.assert_allclose(float(rg[0]), 3.0, atol=1e-5)

    def test_rg_real_protein(self):
        sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
        rg = float(radius_of_gyration(sb.xyz, sb.atom_mask)[0])
        assert 10.0 < rg < 20.0  # compact ~130-residue globular protein

    def test_contact_order_range(self):
        sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
        ca = sb.xyz[:, :, 1]
        co = float(contact_order(ca, sb.get_residue_mask())[0])
        assert 0.0 < co < 0.5  # relative CO of globular proteins ~0.05-0.25


class TestLDDT:
    def _ca(self, key, B=2, L=30):
        return jax.random.normal(key, (B, L, 3)) * 6.0

    def test_identity_is_one(self):
        ca = self._ca(jax.random.PRNGKey(0))
        val = lddt(ca, ca)
        np.testing.assert_allclose(np.asarray(val), 1.0, atol=1e-6)

    def test_superposition_free(self):
        key = jax.random.PRNGKey(1)
        ca = self._ca(key)
        pert = ca + jax.random.normal(jax.random.PRNGKey(2), ca.shape) * 1.0
        base = lddt(pert, ca)

        rg = random_rotations(jax.random.PRNGKey(3), (ca.shape[0],))
        moved = jnp.einsum("bij,blj->bli", rg, pert) + 100.0
        np.testing.assert_allclose(lddt(moved, ca), base, atol=1e-5)

    def test_monotone_in_noise(self):
        ca = self._ca(jax.random.PRNGKey(4))
        noise = jax.random.normal(jax.random.PRNGKey(5), ca.shape)
        vals = [float(lddt(ca + noise * s, ca).mean()) for s in (0.1, 1.0, 4.0)]
        assert vals[0] > vals[1] > vals[2]
        assert vals[0] > 0.9

    def test_per_residue_and_mask(self):
        ca = self._ca(jax.random.PRNGKey(6))
        pert = ca.at[:, 0].add(5.0)  # break only residue 0's environment
        pr = lddt(pert, ca, per_residue=True)
        assert pr.shape == ca.shape[:2]
        assert float(pr[:, 0].mean()) < float(pr[:, 5:].mean())

        # masked-out residues don't affect the score
        mask = jnp.ones(ca.shape[:2], bool).at[:, 0].set(False)
        val_masked = lddt(pert, ca, mask=mask)
        val_clean = lddt(ca, ca)
        # with residue 0 excluded the remaining pairs are nearly intact
        assert float(val_masked.mean()) > 0.95
        np.testing.assert_allclose(np.asarray(val_clean), 1.0, atol=1e-6)


class TestSASAOracles:
    """Ground-truth SASA checks (VERDICT r2 item 6): the exact two-sphere
    analytic solution, and an independent float64 implementation (own sphere
    sampling, own neighbor search) on a real structure."""

    def test_two_sphere_analytic(self):
        # Shrake-Rupley with dense sampling vs the exact spherical-cap
        # formula: for equal extended radii R at distance d, each sphere's
        # accessible area is 2 pi R^2 (1 + d / (2R)).
        from protstruc_tpu.ops.surface import sasa

        d = 2.0
        xyz, mask, seq = _single_atom_batch([[0.0, 0.0, 0.0], [d, 0.0, 0.0]])
        r = 1.70 + 1.4
        expect = 2.0 * np.pi * r**2 * (1.0 + d / (2.0 * r))
        per_res = np.asarray(sasa(xyz, mask, seq, n_points=1920))
        np.testing.assert_allclose(per_res[0], [expect, expect], rtol=0.01)

    def test_independent_float64_oracle_1rex(self):
        """Library SASA vs an in-test float64 oracle with its own sphere
        construction (golden-spiral w/ different offset) and KD-tree pruning."""
        from scipy.spatial import cKDTree

        from protstruc_tpu.ops.surface import atom_radii_table, sasa

        sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
        seq = np.asarray(sb.get_seq_idx())
        radii = np.asarray(atom_radii_table())[np.clip(seq, 0, 20)]  # (B,L,A)
        xyz = np.asarray(sb.xyz)
        ok = (np.asarray(sb.atom_mask) & (radii > 0)
              & np.isfinite(xyz).all(-1))
        centers = xyz[0][ok[0]].astype(np.float64)
        rads = radii[0][ok[0]].astype(np.float64) + 1.4

        # independent unit sphere: golden-angle spiral, offset 0.5
        n_pts = 1000
        k = np.arange(n_pts, dtype=np.float64) + 0.5
        phi = np.arccos(1.0 - 2.0 * k / n_pts)
        theta = np.pi * (1.0 + 5.0**0.5) * k
        sphere = np.stack([np.cos(theta) * np.sin(phi),
                           np.sin(theta) * np.sin(phi), np.cos(phi)], -1)

        tree = cKDTree(centers)
        rmax = rads.max()
        total = 0.0
        for i in range(len(centers)):
            pts = centers[i] + rads[i] * sphere
            nbrs = [j for j in tree.query_ball_point(centers[i], rads[i] + rmax)
                    if j != i]
            buried = np.zeros(n_pts, bool)
            for j in nbrs:
                buried |= (np.linalg.norm(pts - centers[j], axis=1) < rads[j])
            total += (~buried).mean() * 4.0 * np.pi * rads[i] ** 2

        lib_total = float(np.sum(np.asarray(
            sasa(sb.xyz, sb.atom_mask, sb.get_seq_idx(), n_points=960))))
        np.testing.assert_allclose(lib_total, total, rtol=0.02)


class TestContactOrderChains:
    def test_homodimer_matches_monomer(self):
        """Relative CO with chain_idx normalizes by the PER-CHAIN Plaxco L:
        duplicating a chain into a (displaced) homodimer must reproduce the
        monomer's relative contact order, not half of it."""
        import protstruc_tpu as ps

        sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
        ca = np.asarray(sb.xyz[:, :, 1])
        mask = np.asarray(sb.get_residue_mask())
        L = ca.shape[1]
        co_mono = float(contact_order(jnp.asarray(ca),
                                      jnp.asarray(mask))[0])

        dimer_ca = np.concatenate([ca, ca + 300.0], axis=1)  # far apart
        dimer_mask = np.concatenate([mask, mask], axis=1)
        chain_idx = np.concatenate([np.zeros((1, L)), np.ones((1, L))],
                                   axis=1).astype(np.int32)
        co_dimer = float(contact_order(jnp.asarray(dimer_ca),
                                       jnp.asarray(dimer_mask),
                                       chain_idx=jnp.asarray(chain_idx))[0])
        np.testing.assert_allclose(co_dimer, co_mono, rtol=1e-5)
