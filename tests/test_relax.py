"""Structure relaxation tests (ops/relax.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import protstruc_tpu as ps
from protstruc_tpu.ops.relax import backbone_bonded_energy, relax_structure


def _noisy_native(sigma=0.3):
    sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
    noise = jax.random.normal(jax.random.PRNGKey(0), sb.xyz.shape) * sigma
    return sb, sb.replace(xyz=sb.xyz + noise)


class TestBondedEnergy:
    def test_native_is_near_ideal(self):
        """A crystal structure scores much lower bonded energy than a
        noise-perturbed copy of itself."""
        sb, noisy = _noisy_native()
        e_nat = float(backbone_bonded_energy(
            sb.xyz, sb.atom_mask, sb.chain_idx)[0])
        e_noisy = float(backbone_bonded_energy(
            noisy.xyz, noisy.atom_mask, noisy.chain_idx)[0])
        assert e_noisy > 5.0 * e_nat

    def test_differentiable_with_nans(self):
        sb, _ = _noisy_native()

        def loss(x):
            return jnp.sum(backbone_bonded_energy(
                jnp.where(jnp.isfinite(sb.xyz), x, jnp.nan),
                sb.atom_mask, sb.chain_idx))

        g = jax.grad(loss)(jnp.nan_to_num(sb.xyz, nan=0.0))
        assert np.isfinite(np.asarray(g)).all()


class TestRelax:
    def test_energy_decreases_and_geometry_restored(self):
        sb, noisy = _noisy_native(sigma=0.25)
        relaxed, e = noisy.relax(n_steps=150)

        assert float(e["final"][0]) < 0.5 * float(e["initial"][0])
        assert float(e["bonded_final"][0]) < float(e["bonded_initial"][0])

        # backbone bond lengths move toward ideal
        def mean_nca_err(b):
            d = np.linalg.norm(
                np.asarray(b.xyz[0, :, 0] - b.xyz[0, :, 1]), axis=-1)
            d = d[np.isfinite(d)]
            return np.abs(d - 1.458).mean()

        assert mean_nca_err(relaxed) < 0.5 * mean_nca_err(noisy)

        # the tether keeps the structure near where it started
        drift = np.nanmean(np.linalg.norm(
            np.asarray(relaxed.xyz - noisy.xyz), axis=-1))
        assert drift < 1.0, drift

    def test_missing_atoms_stay_nan(self):
        sb, noisy = _noisy_native()
        relaxed, _ = noisy.relax(n_steps=5)
        nan_in = np.isnan(np.asarray(noisy.xyz)).any(-1)
        nan_out = np.isnan(np.asarray(relaxed.xyz)).any(-1)
        np.testing.assert_array_equal(nan_in, nan_out)

    def test_clash_relief(self):
        """Two residues pushed into collision get pushed apart."""
        sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
        x = np.asarray(sb.xyz).copy()
        # slam residue 10's sidechain onto residue 50's CA
        target = x[0, 50, 1]
        shift = target - x[0, 10, 1]
        x[0, 10] = x[0, 10] + shift * 0.95
        clashed = sb.replace(xyz=jnp.asarray(x))
        relaxed, e = clashed.relax(n_steps=300, learning_rate=5e-3)
        assert float(e["clash_final"][0]) < 0.1 * float(e["clash_initial"][0])


def test_relax_preserves_sidechain_bonds():
    """A clashing sidechain atom must be pushed away WITHOUT stretching
    its covalent bond: the intra-residue restraint holds bonded distances
    while the clash resolves."""
    import jax.numpy as jnp

    from protstruc_tpu import StructureBatch
    from protstruc_tpu.ops.relax import relax_structure
    from tests.conftest import pdb_path

    sb = StructureBatch.from_pdb(pdb_path("1REX.pdb"))
    xyz = np.array(sb.xyz)[:, :40]
    am = np.asarray(sb.atom_mask)[:, :40]
    seq = np.asarray(sb.get_seq_idx())[:, :40]

    # record initial intra-residue bonded (<2.0 A) distances
    def intra_bonds(x):
        d = np.sqrt(np.nansum(
            (x[:, :, :, None] - x[:, :, None, :]) ** 2, -1))
        ok = am[:, :, :, None] & am[:, :, None, :]
        ok &= np.isfinite(x).all(-1)[:, :, :, None]
        ok &= np.isfinite(x).all(-1)[:, :, None, :]
        iu = np.triu(np.ones(d.shape[-2:], bool), 1)
        return d, ok & iu[None, None]

    d0, ok = intra_bonds(xyz)
    bonds = ok & (d0 < 2.0) & (d0 > 0.5)

    relaxed, energies = relax_structure(
        jnp.asarray(xyz), jnp.asarray(am), jnp.asarray(seq), n_steps=60)
    d1, _ = intra_bonds(np.asarray(relaxed))
    # bonded distances move < 0.1 A even while atoms relax
    assert np.abs(d1[bonds] - d0[bonds]).max() < 0.1
    assert float(energies["final"][0]) <= float(energies["initial"][0])
