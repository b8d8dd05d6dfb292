"""Ramachandran classification tests (ops/rama.py)."""

import jax.numpy as jnp
import numpy as np

import protstruc_tpu as ps
from protstruc_tpu.ops.rama import (
    RAMA_ALLOWED, RAMA_FAVORED, RAMA_OUTLIER, ramachandran_classes)


class TestCrystalCalibration:
    def test_high_res_structures_mostly_favored(self):
        """1.5-2 A crystal structures: >= 85% favored, <= 3% outliers
        (measured 0.89-0.95 / 0.004-0.014 across the vendored set)."""
        for name in ("1REX.pdb", "1ad0_DC.pdb", "6dc4.pdb", "15c8_HL.pdb"):
            sb = ps.StructureBatch.from_pdb(f"tests/data/{name}")
            cls, valid = sb.ramachandran_classes()
            cls, v = np.asarray(cls), np.asarray(valid)
            fav = (cls[v] == RAMA_FAVORED).mean()
            out = (cls[v] == RAMA_OUTLIER).mean()
            assert fav >= 0.85, (name, fav)
            assert out <= 0.03, (name, out)

    def test_random_torsions_mostly_not_favored(self):
        """Uniform random (phi, psi) should be mostly allowed/outlier:
        favored regions cover a minority of the Ramachandran square."""
        rng = np.random.default_rng(0)
        phi = jnp.asarray(rng.uniform(-np.pi, np.pi, (1, 500)))
        psi = jnp.asarray(rng.uniform(-np.pi, np.pi, (1, 500)))
        seq = jnp.zeros((1, 500), jnp.int32)  # ALA
        cls = np.asarray(ramachandran_classes(
            phi, psi, seq, jnp.ones((1, 500), bool)))
        assert (cls == RAMA_FAVORED).mean() < 0.5


class TestKnownRegions:
    def test_ideal_helix_and_strand_are_favored(self):
        for phi_psi in ((-60.0, -45.0), (-120.0, 130.0)):
            phi = jnp.asarray([[np.deg2rad(phi_psi[0])]])
            psi = jnp.asarray([[np.deg2rad(phi_psi[1])]])
            cls = ramachandran_classes(
                phi, psi, jnp.zeros((1, 1), jnp.int32),
                jnp.ones((1, 1), bool))
            assert int(cls[0, 0]) == RAMA_FAVORED, phi_psi

    def test_forbidden_region_is_outlier_except_glycine(self):
        # phi = +120, psi = -120: deep in the forbidden quadrant for
        # L-amino acids, but the mirror of beta — accessible to glycine
        phi = jnp.asarray([[np.deg2rad(120.0)]])
        psi = jnp.asarray([[np.deg2rad(-135.0)]])
        ala = ramachandran_classes(phi, psi, jnp.zeros((1, 1), jnp.int32),
                                   jnp.ones((1, 1), bool))
        assert int(ala[0, 0]) == RAMA_OUTLIER
        from protstruc_tpu.vocab import AA

        gly = ramachandran_classes(
            phi, psi, jnp.full((1, 1), int(AA.GLY), jnp.int32),
            jnp.ones((1, 1), bool))
        assert int(gly[0, 0]) == RAMA_FAVORED

    def test_proline_restricted(self):
        # alpha-L region is an outlier for proline (ring constrains phi)
        from protstruc_tpu.vocab import AA

        phi = jnp.asarray([[np.deg2rad(57.0)]])
        psi = jnp.asarray([[np.deg2rad(40.0)]])
        pro = ramachandran_classes(
            phi, psi, jnp.full((1, 1), int(AA.PRO), jnp.int32),
            jnp.ones((1, 1), bool))
        ala = ramachandran_classes(phi, psi, jnp.zeros((1, 1), jnp.int32),
                                   jnp.ones((1, 1), bool))
        assert int(ala[0, 0]) == RAMA_FAVORED
        assert int(pro[0, 0]) == RAMA_OUTLIER
