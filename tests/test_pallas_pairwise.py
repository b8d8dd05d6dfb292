"""Pallas fused pair-feature kernel vs the jnp reference path.

Runs in interpreter mode on CPU (the real compiled path is exercised by
bench.py on the TPU chip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from protstruc_tpu import StructureBatch
from protstruc_tpu.ops.pallas_pairwise import pairwise_maps, trrosetta_features

from tests.conftest import pdb_path


def _compare(sb, tile=64):
    ref = sb.inter_residue_geometry()
    out = trrosetta_features(
        sb.get_xyz(), sb.get_atom_mask(), tile_i=tile, tile_j=tile, interpret=True
    )
    for k in ["d_ca", "d_cb", "d_no", "omega", "theta", "phi"]:
        r, o = np.asarray(ref[k]), np.asarray(out[k])
        nan_r, nan_o = np.isnan(r), np.isnan(o)
        np.testing.assert_array_equal(nan_r, nan_o, err_msg=k)
        np.testing.assert_allclose(o[~nan_o], r[~nan_r], atol=2e-4, err_msg=k)
    for k in ["d_ca_mask", "d_cb_mask", "d_no_mask"]:
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(out[k]), err_msg=k)


def test_pallas_matches_jnp_random():
    rng = np.random.RandomState(0)
    xyz = rng.randn(2, 50, 15, 3).astype(np.float32) * 5
    sb = StructureBatch.from_xyz(xyz)
    _compare(sb)


def test_pallas_matches_jnp_real_structure():
    sb = StructureBatch.from_pdb(pdb_path("1ad0_DC.pdb"))
    _compare(sb, tile=128)


def test_pallas_tile_not_dividing_length():
    rng = np.random.RandomState(1)
    xyz = rng.randn(1, 37, 15, 3).astype(np.float32) * 5
    sb = StructureBatch.from_xyz(xyz)
    _compare(sb, tile=32)


def test_atan2_planes_tiny_magnitudes():
    """Sub-1e-20 magnitudes must not underflow to inf/NaN in the rsqrt
    range reduction (ADVICE r3): the exact ratio is scale-invariant, so
    the angle must match jnp.arctan2 even for denormal-range inputs."""
    from protstruc_tpu.ops.pallas_pairwise import _atan2_planes

    # all values >= the f32 min normal 1.18e-38 (denormals legitimately
    # flush to zero on TPU and under XLA:CPU multiplies)
    y = jnp.asarray([0.0, 1e-30, 1e-30, -1e-37, 1e-37, 0.0, 3e-23, 1e-30])
    x = jnp.asarray([1e-30, 0.0, 1e-30, 1e-37, 0.0, 0.0, -3e-23, 1.0])
    got = np.asarray(_atan2_planes(y, x))
    want = np.arctan2(np.asarray(y), np.asarray(x))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_atan2_planes_normal_range_unchanged():
    """The tiny-magnitude rescale is bit-neutral for ordinary inputs."""
    from protstruc_tpu.ops.pallas_pairwise import _atan2_planes

    rng = np.random.RandomState(3)
    y = jnp.asarray(rng.randn(256).astype(np.float32) * 10)
    x = jnp.asarray(rng.randn(256).astype(np.float32) * 10)
    np.testing.assert_allclose(
        np.asarray(_atan2_planes(y, x)),
        np.arctan2(np.asarray(y), np.asarray(x)), atol=2e-6)


def _grad_pair(xyz, tile=64, seed=0):
    """(pallas-bwd dxyz, jnp-vjp dxyz) for the same random cotangents."""
    import jax

    from protstruc_tpu.ops import pallas_pairwise as pp

    xyz = jnp.asarray(xyz)
    _, pallas_vjp = jax.vjp(
        lambda x: pairwise_maps(x, tile, tile, True), xyz)
    _, jnp_vjp = jax.vjp(pp._maps_jnp, xyz)
    rng = np.random.RandomState(seed)
    B, L = xyz.shape[:2]
    g = {k: jnp.asarray(rng.randn(B, L, L).astype(np.float32))
         for k in pp._MAP_NAMES}
    return np.asarray(pallas_vjp(g)[0]), np.asarray(jnp_vjp(g)[0])


def test_pallas_backward_matches_jnp_vjp_random():
    """Fused adjoint kernel vs the jnp formulation's VJP (VERDICT r4 #3)."""
    rng = np.random.RandomState(0)
    xyz = rng.randn(2, 50, 15, 3).astype(np.float32) * 5
    got, want = _grad_pair(xyz)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * max(scale, 1.0))


def test_pallas_backward_degenerate_zero_grads():
    """Coincident atoms (CB==CA, duplicated residues) must get exactly the
    jnp double-where gradients — 0 cotangent flow, never NaN/inf."""
    rng = np.random.RandomState(1)
    xyz = rng.randn(1, 24, 15, 3).astype(np.float32) * 5
    from protstruc_tpu.vocab import ATOM

    xyz[:, ::3, int(ATOM.CB)] = xyz[:, ::3, int(ATOM.CA)]  # glycine-like
    xyz[:, 7] = xyz[:, 3]  # fully duplicated residue pair
    got, want = _grad_pair(xyz, tile=32)
    assert np.isfinite(got).all()
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * max(scale, 1.0))


def test_pallas_backward_tile_not_dividing_length():
    rng = np.random.RandomState(2)
    xyz = rng.randn(1, 37, 15, 3).astype(np.float32) * 5
    got, want = _grad_pair(xyz, tile=32)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * max(scale, 1.0))


def test_pallas_backward_nan_coords_propagate():
    """Missing-atom (NaN) coordinates produce NaN gradients for the atoms
    of the affected residues (same contract as the jnp path: mask the
    cotangents upstream); finite residues keep finite, matching grads."""
    rng = np.random.RandomState(3)
    xyz = rng.randn(1, 16, 15, 3).astype(np.float32) * 5
    xyz[:, 5, :4] = np.nan  # residue 5 backbone missing
    got, want = _grad_pair(xyz, tile=32)
    # NaN rows: every map pairs residue 5 with everything -> its own atom
    # grads are NaN in both paths
    assert np.isnan(got[:, 5]).any() and np.isnan(want[:, 5]).any()
    finite = np.isfinite(want) & np.isfinite(got)
    assert finite[:, :5].any()
    scale = np.abs(want[finite]).max()
    np.testing.assert_allclose(got[finite], want[finite],
                               atol=1e-5 * max(scale, 1.0))


def test_pallas_backward_jnp_fallback_flag():
    from protstruc_tpu.ops import pallas_pairwise as pp

    rng = np.random.RandomState(4)
    xyz = rng.randn(1, 20, 15, 3).astype(np.float32) * 5
    pp.BWD_IMPL = "jnp"
    try:
        got, want = _grad_pair(xyz, tile=32)
    finally:
        pp.BWD_IMPL = "pallas"
    np.testing.assert_array_equal(got, want)


def test_inter_residue_geometry_use_pallas_flag():
    rng = np.random.RandomState(2)
    xyz = rng.randn(1, 20, 15, 3).astype(np.float32)
    sb = StructureBatch.from_xyz(xyz)
    a = sb.inter_residue_geometry()
    b = sb.inter_residue_geometry(use_pallas=True)
    np.testing.assert_allclose(
        np.asarray(a["d_cb"]), np.asarray(b["d_cb"]), atol=2e-4
    )
