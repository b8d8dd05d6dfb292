"""Clash energy and sidechain repacking tests."""

import jax
import jax.numpy as jnp
import numpy as np

import protstruc_tpu as ps
from protstruc_tpu.ops.chi import rotate_chi
from protstruc_tpu.ops.pack import clash_energy, pack_sidechains


def _small_batch():
    """A compact region of 1REX (first 48 residues) keeps CPU tests fast."""
    sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
    sel = np.zeros(sb.chain_idx.shape, bool)
    sel[:, :48] = True
    return sb.residue_masked_select(jnp.asarray(sel))


class TestClashEnergy:
    def test_native_structure_is_nearly_clash_free(self):
        sb = _small_batch()
        e = clash_energy(sb.xyz, sb.atom_mask, sb.get_seq_idx())
        assert float(e[0]) < 2.0  # crystal structures: minimal overlap

    def test_scrambled_chis_clash(self):
        sb = _small_batch()
        seq = sb.get_seq_idx()
        e0 = clash_energy(sb.xyz, sb.atom_mask, seq)
        key = jax.random.PRNGKey(0)
        delta = jax.random.uniform(
            key, sb.chain_idx.shape + (4,), minval=-3.0, maxval=3.0
        )
        xyz2 = rotate_chi(sb.xyz, seq, delta, sb.atom_mask)
        e1 = clash_energy(xyz2, sb.atom_mask, seq)
        assert float(e1[0]) > float(e0[0]) + 1.0

    def test_two_overlapping_atoms(self):
        # two CB atoms 1 A apart on NON-adjacent residues (adjacent-residue
        # backbone/CB pairs are exempt): overlap (1.7+1.7-0.4-1.0) = 2.0
        xyz = np.full((1, 3, 15, 3), np.nan, np.float32)
        mask = np.zeros((1, 3, 15), bool)
        xyz[0, 0, 4] = [0, 0, 0]
        xyz[0, 2, 4] = [1, 0, 0]
        mask[0, 0, 4] = mask[0, 2, 4] = True
        seq = np.zeros((1, 3), np.int32)  # ALA
        e = clash_energy(jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(seq))
        np.testing.assert_allclose(float(e[0]), 2.0**2, atol=1e-4)

    def test_adjacent_backbone_exempt(self):
        sb = _small_batch()
        # the peptide bond C(i)-N(i+1) is ~1.33 A — would be a huge "clash"
        # if counted; native energy being tiny proves the exemption works
        e = clash_energy(sb.xyz, sb.atom_mask, sb.get_seq_idx())
        assert float(e[0]) < 2.0


class TestPackSidechains:
    def test_recovers_from_scrambled_chis(self):
        sb = _small_batch()
        seq = sb.get_seq_idx()
        key = jax.random.PRNGKey(1)
        delta = jax.random.uniform(
            key, sb.chain_idx.shape + (4,), minval=-2.5, maxval=2.5
        )
        scrambled = rotate_chi(sb.xyz, seq, delta, sb.atom_mask)
        e_bad = float(clash_energy(scrambled, sb.atom_mask, seq)[0])

        packed, traj = pack_sidechains(
            scrambled, seq, sb.atom_mask, jax.random.PRNGKey(2),
            n_sweeps=12, n_proposals=6,
        )
        e_packed = float(clash_energy(packed, sb.atom_mask, seq)[0])

        assert e_packed < 0.5 * e_bad          # substantial repair
        # trajectory is monotone non-increasing
        t = np.asarray(traj)[:, 0]
        assert (np.diff(t) <= 1e-5).all()
        # backbone untouched
        np.testing.assert_allclose(
            np.asarray(packed)[:, :, :5][np.asarray(sb.atom_mask)[:, :, :5]],
            np.asarray(scrambled)[:, :, :5][np.asarray(sb.atom_mask)[:, :, :5]],
            atol=1e-6,
        )
