"""DockQ complex-evaluation metric tests (1ad0_DC: a two-chain complex)."""

import jax
import jax.numpy as jnp
import numpy as np

import protstruc_tpu as ps
from protstruc_tpu.ops.metrics import dockq, fnat, interface_rmsd
from protstruc_tpu.ops.rigid import random_rotations


def _complex():
    sb = ps.StructureBatch.from_pdb("tests/data/1ad0_DC.pdb")
    rec = sb.chain_idx == 0
    lig = sb.chain_idx == 1
    return sb, rec, lig


class TestDockQ:
    def test_identity_is_perfect(self):
        sb, rec, lig = _complex()
        f = fnat(sb.xyz, sb.xyz, sb.atom_mask, rec, lig)
        i = interface_rmsd(sb.xyz, sb.xyz, sb.atom_mask, rec, lig)
        q = dockq(sb.xyz, sb.xyz, sb.atom_mask, rec, lig)
        assert float(f[0]) == 1.0
        assert float(i[0]) < 1e-3
        assert float(q[0]) > 0.99

    def test_native_has_contacts(self):
        from protstruc_tpu.ops.metrics import _min_interchain_dist

        sb, rec, lig = _complex()
        d = _min_interchain_dist(sb.xyz, sb.atom_mask, rec, lig)
        assert int((np.asarray(d) < 5.0).sum()) > 10  # a real interface

    def test_rigidly_moved_complex_still_perfect(self):
        """Moving the WHOLE complex rigidly changes nothing (all three
        components are superposition-based or internal)."""
        sb, rec, lig = _complex()
        rg = random_rotations(jax.random.PRNGKey(0), (1,))
        moved = jnp.einsum("bij,blaj->blai", rg, sb.xyz) + 25.0
        q = dockq(moved, sb.xyz, sb.atom_mask, rec, lig)
        assert float(q[0]) > 0.99

    def test_displaced_ligand_scores_low(self):
        """Translating only the ligand chain breaks the interface."""
        sb, rec, lig = _complex()
        shift = jnp.where(lig[:, :, None, None], 30.0, 0.0)
        model = sb.xyz + shift
        f = fnat(model, sb.xyz, sb.atom_mask, rec, lig)
        q = dockq(model, sb.xyz, sb.atom_mask, rec, lig)
        assert float(f[0]) == 0.0
        assert float(q[0]) < 0.23  # below the "acceptable" band

    def test_small_perturbation_intermediate(self):
        sb, rec, lig = _complex()
        key = jax.random.PRNGKey(1)
        noise = jax.random.normal(key, sb.xyz.shape) * 1.0
        model = sb.xyz + jnp.where(lig[:, :, None, None], noise, 0.0)
        q = float(dockq(model, sb.xyz, sb.atom_mask, rec, lig)[0])
        assert 0.4 < q < 1.0  # perturbed but clearly the same pose
