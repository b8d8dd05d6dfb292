"""AOT-compiled featurizer (serving path) tests."""

import jax.numpy as jnp
import numpy as np
import pytest

import protstruc_tpu as ps
from protstruc_tpu.utils.aot import precompile_featurizer


class TestAOT:
    def test_precompile_and_dispatch_matches_direct(self):
        feat = precompile_featurizer(batch_sizes=(1,), buckets=(64, 128, 256))
        assert (1, 64) in feat.shapes and (1, 256) in feat.shapes

        sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")  # L=130 -> 256
        g, d, m, frames = feat(sb)

        B, L = sb.chain_idx.shape
        assert g["d_cb"].shape == (B, L, L)
        assert d.shape == (B, L, 3)
        assert frames.shape == (B, L, 3, 3)

        ref = sb.inter_residue_geometry()
        both_nan = jnp.isnan(ref["d_cb"]) & jnp.isnan(g["d_cb"])
        diff = jnp.where(both_nan, 0.0, jnp.abs(ref["d_cb"] - g["d_cb"]))
        assert float(jnp.nan_to_num(diff, nan=jnp.inf).max()) < 1e-5

        ref_d, ref_m = sb.backbone_dihedrals()
        np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(m), np.asarray(ref_m))

    def test_batch_rounds_up(self):
        feat = precompile_featurizer(batch_sizes=(2,), buckets=(64,))
        rng = np.random.RandomState(0)
        xyz = rng.randn(1, 50, 15, 3).astype(np.float32) * 5
        sb = ps.StructureBatch.from_xyz(xyz)  # B=1 -> runs in the B=2 exe
        g, d, m, frames = feat(sb)
        assert g["d_ca"].shape == (1, 50, 50)

    def test_missing_shape_raises(self):
        feat = precompile_featurizer(batch_sizes=(1,), buckets=(64,))
        rng = np.random.RandomState(0)
        xyz = rng.randn(1, 100, 15, 3).astype(np.float32)
        sb = ps.StructureBatch.from_xyz(xyz)
        with pytest.raises(KeyError):
            feat(sb)
