"""Sidechain chi torsion tests: tables, extraction, rotation round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

import protstruc_tpu as ps
from protstruc_tpu.ops.chi import (
    CHI_ATOM_NAMES,
    chi_angles,
    chi_symmetry_mask,
    chi_tables,
    rotate_chi,
)
from protstruc_tpu.vocab import AA


class TestTables:
    def test_counts_match_convention(self):
        _, _, mask = chi_tables()
        expect = {"ALA": 0, "GLY": 0, "UNK": 0, "SER": 1, "CYS": 1, "THR": 1,
                  "VAL": 1, "ASP": 2, "ASN": 2, "HIS": 2, "ILE": 2, "LEU": 2,
                  "PHE": 2, "PRO": 2, "TRP": 2, "TYR": 2, "GLN": 3, "GLU": 3,
                  "MET": 3, "ARG": 4, "LYS": 4}
        for name, n in expect.items():
            aa = int(AA.__members__[name])
            assert mask[aa].sum() == n, name

    def test_moved_sets_nest(self):
        # chi_{k+1}'s moved set is a strict subset of chi_k's
        _, moved, mask = chi_tables()
        for aa in range(21):
            for k in range(3):
                if mask[aa, k + 1]:
                    assert (moved[aa, k + 1] & ~moved[aa, k]).sum() == 0

    def test_arg_chi1_moves_whole_sidechain(self):
        idx, moved, _ = chi_tables()
        aa = int(AA.ARG)
        # ARG sidechain beyond CB: CG, CD, NE, CZ, NH1, NH2 = 6 atoms
        assert moved[aa, 0].sum() == 6
        # chi4 moves only CZ, NH1, NH2
        assert moved[aa, 3].sum() == 3

    def test_symmetry_mask(self):
        sym = chi_symmetry_mask()
        assert sym[int(AA.ASP), 1] and sym[int(AA.PHE), 1]
        assert sym[int(AA.GLU), 2] and sym[int(AA.TYR), 1]
        assert sym.sum() == 4


class TestChiAngles:
    def test_real_pdb(self):
        sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
        chi, mask = chi_angles(sb.xyz, sb.get_seq_idx(), sb.atom_mask)
        assert chi.shape == mask.shape == sb.chain_idx.shape + (4,)
        assert np.isfinite(np.asarray(chi)).all()
        c = np.asarray(chi)[np.asarray(mask)]
        assert len(c) > 100  # lysozyme has plenty of sidechains
        assert (np.abs(c) <= np.pi + 1e-6).all()
        # masked entries zero-filled
        assert (np.asarray(chi)[~np.asarray(mask)] == 0).all()

        # per-residue chi counts respect the residue type
        _, _, defined = chi_tables()
        seq = np.asarray(sb.get_seq_idx())
        assert (np.asarray(mask) <= defined[np.clip(seq, 0, 20)]).all()

    def test_gly_ala_have_none(self):
        sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
        chi, mask = chi_angles(sb.xyz, sb.get_seq_idx(), sb.atom_mask)
        seq = np.asarray(sb.get_seq_idx())
        for name in ("GLY", "ALA"):
            rows = seq == int(AA.__members__[name])
            assert not np.asarray(mask)[rows].any()


class TestRotateChi:
    def test_round_trip(self):
        """rotate_chi(delta) shifts the measured chis by exactly delta."""
        sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
        seq = sb.get_seq_idx()
        chi0, mask = chi_angles(sb.xyz, seq, sb.atom_mask)

        key = jax.random.PRNGKey(0)
        delta = jax.random.uniform(key, chi0.shape, minval=-1.0, maxval=1.0)
        xyz2 = rotate_chi(sb.xyz, seq, delta, sb.atom_mask)
        chi1, mask1 = chi_angles(xyz2, seq, sb.atom_mask)

        np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask1))
        m = np.asarray(mask)
        want = np.asarray(chi0 + delta)
        got = np.asarray(chi1)
        # wrap to (-pi, pi]
        diff = (want - got + np.pi) % (2 * np.pi) - np.pi
        assert np.abs(diff[m]).max() < 2e-4

    def test_rigidity_and_locality(self):
        """Backbone fixed; bond lengths preserved (rigid rotations)."""
        from protstruc_tpu.ops.chi import _PARENT
        from protstruc_tpu.vocab import AA, RESTYPE_HEAVY_ATOMS

        sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
        seq = sb.get_seq_idx()
        delta = jnp.full(sb.chain_idx.shape + (4,), 0.7)
        xyz2 = rotate_chi(sb.xyz, seq, delta, sb.atom_mask)

        x0 = np.asarray(sb.xyz)
        x1 = np.asarray(xyz2)
        am = np.asarray(sb.atom_mask)

        # backbone N/CA/C/O/CB untouched
        np.testing.assert_allclose(
            x1[:, :, :5][am[:, :, :5]], x0[:, :, :5][am[:, :, :5]], atol=1e-6
        )

        # every sidechain bond (parent-child) length preserved
        seq_np = np.asarray(seq)
        worst = 0.0
        for res, parent in _PARENT.items():
            aa = int(AA.__members__[res])
            slots = {n: i for i, n in
                     enumerate(RESTYPE_HEAVY_ATOMS[AA(aa)]) if n}
            rows = np.nonzero(seq_np == aa)
            if not len(rows[0]):
                continue
            for child, par in parent.items():
                ci, pi = slots[child], slots[par]
                ok = am[rows[0], rows[1], ci] & am[rows[0], rows[1], pi]
                if not ok.any():
                    continue
                b0 = np.linalg.norm(
                    x0[rows[0], rows[1], ci] - x0[rows[0], rows[1], pi], axis=-1
                )[ok]
                b1 = np.linalg.norm(
                    x1[rows[0], rows[1], ci] - x1[rows[0], rows[1], pi], axis=-1
                )[ok]
                worst = max(worst, np.abs(b0 - b1).max())
        assert worst < 1e-4

    def test_missing_atoms_stay_nan(self):
        """A missing atom inside a chi's moved set must stay NaN.

        The NaN-for-missing-atom convention is load-bearing: rotate_chi must
        not resurrect a NaN coordinate as a rotated finite phantom atom.
        """
        sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
        seq = np.asarray(sb.get_seq_idx())
        idx_np, moved_np, defined_np = chi_tables()

        # knock out one atom from a chi-2 moved set of an ARG (chi1/chi2
        # both defined, deep moved sets)
        rows = np.argwhere(seq == int(AA.ARG))
        assert len(rows) > 0
        b, l = rows[0]
        aa = seq[b, l]
        # pick a moved atom of chi2 that is not a pivot of any chi
        moved_slots = np.nonzero(moved_np[aa, 1])[0]
        pivots = set(idx_np[aa][defined_np[aa]][:, 1:3].ravel().tolist())
        slot = next(int(s) for s in moved_slots if int(s) not in pivots)

        x = np.asarray(sb.xyz).copy()
        x[b, l, slot] = np.nan
        delta = jnp.full(seq.shape + (4,), 0.7)
        out = np.asarray(rotate_chi(jnp.asarray(x), sb.get_seq_idx(), delta))

        # the knocked-out atom is still NaN; present atoms moved and finite
        assert np.isnan(out[b, l, slot]).all()
        nan_in = np.isnan(x).any(-1)
        nan_out = np.isnan(out).any(-1)
        np.testing.assert_array_equal(nan_in, nan_out)

    def test_symmetric_chi_semantics(self):
        """Swapping the symmetric pair's labels shifts the chi by pi."""
        sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
        seq = np.asarray(sb.get_seq_idx())
        chi0, mask0 = chi_angles(sb.xyz, sb.get_seq_idx(), sb.atom_mask)

        # swap OD1 <-> OD2 coordinates of every ASP (slots 6 and 7)
        aa_asp = int(AA.ASP)
        x = np.asarray(sb.xyz).copy()
        rows = seq == aa_asp
        tmp = x[rows][:, 6].copy()
        x[np.nonzero(rows)[0], np.nonzero(rows)[1], 6] = x[rows][:, 7]
        x[np.nonzero(rows)[0], np.nonzero(rows)[1], 7] = tmp

        chi1, _ = chi_angles(jnp.asarray(x), sb.get_seq_idx(), sb.atom_mask)
        m = np.asarray(mask0[..., 1]) & rows
        if m.any():
            d = np.abs(np.asarray(chi1[..., 1]) - np.asarray(chi0[..., 1]))[m]
            # |delta chi2| == pi up to the real carboxylate's slight
            # deviation from ideal planar symmetry (~0.02 rad in 1REX)
            np.testing.assert_allclose(d, np.pi, atol=0.05)


def test_chi_angles_gradient_finite_with_ala_gly_and_missing():
    """Undefined chis (ALA/GLY gather four copies of slot 0) and missing
    atoms must not NaN gradients through chi_angles (double-where rule)."""
    import jax
    import jax.numpy as jnp

    from protstruc_tpu.ops.chi import chi_angles
    from protstruc_tpu.vocab import AA

    rng = np.random.RandomState(0)
    xyz = rng.randn(1, 4, 15, 3).astype(np.float32)
    xyz[0, 2, 6] = np.nan  # missing chi atom on a defined residue
    seq = np.asarray([[int(AA.ALA), int(AA.GLY), int(AA.LYS),
                       int(AA.ARG)]], np.int32)
    am = np.ones((1, 4, 15), bool)

    def loss(x):
        chi, m = chi_angles(x, jnp.asarray(seq), jnp.asarray(am))
        return jnp.sum(jnp.where(m, chi, 0.0) ** 2)

    g = jax.grad(loss)(jnp.asarray(xyz))
    assert np.isfinite(np.asarray(g)).all()


def test_rotate_chi_gradient_finite_with_missing_axis_atom():
    """Missing chi-axis atoms must not NaN gradients w.r.t. delta."""
    import jax
    import jax.numpy as jnp

    from protstruc_tpu.ops.chi import rotate_chi
    from protstruc_tpu.vocab import AA

    rng = np.random.RandomState(1)
    xyz = rng.randn(1, 2, 15, 3).astype(np.float32)
    xyz[0, 0, 5] = np.nan  # LYS CG missing -> chi2 axis undefined
    seq = np.asarray([[int(AA.LYS), int(AA.SER)]], np.int32)

    def loss(d):
        out = rotate_chi(jnp.asarray(xyz), jnp.asarray(seq), d)
        return jnp.sum(jnp.nan_to_num(out, nan=0.0) ** 2)

    g = jax.grad(loss)(jnp.zeros((1, 2, 4)))
    assert np.isfinite(np.asarray(g)).all()


def test_pack_freezes_proline_chis():
    """pack_sidechains must not move proline ring atoms (the ring-closure
    CD-N bond is invisible to clash_energy)."""
    import jax
    import jax.numpy as jnp

    from protstruc_tpu import StructureBatch
    from protstruc_tpu.ops.pack import pack_sidechains
    from protstruc_tpu.vocab import AA
    from tests.conftest import pdb_path

    sb = StructureBatch.from_pdb(pdb_path("1REX.pdb"))
    seq = np.asarray(sb.get_seq_idx())
    pro = seq[0] == int(AA.PRO)
    assert pro.any(), "fixture needs at least one proline"

    packed, _ = pack_sidechains(
        sb.xyz, jnp.asarray(seq), sb.atom_mask,
        jax.random.PRNGKey(0), n_sweeps=3, n_proposals=2)
    before = np.asarray(sb.xyz)[0, pro]
    after = np.asarray(packed)[0, pro]
    both = np.isfinite(before).all(-1) & np.isfinite(after).all(-1)
    assert np.abs(after[both] - before[both]).max() < 1e-5
