"""Property-based invariants: rigid-motion invariance, gradients, bf16.

These go beyond the reference's test suite: featurization outputs must be
invariant under rigid motion, the Pallas path must be differentiable via
its custom VJP, and bf16 outputs must track f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protstruc_tpu import StructureBatch
from protstruc_tpu.utils.checks import BatchValidationError, validate_batch

from tests.conftest import pdb_path


def _rigid_move(sb, seed=0):
    key = jax.random.PRNGKey(seed)
    q, _ = jnp.linalg.qr(jax.random.normal(key, (3, 3)))
    q = q * jnp.sign(jnp.linalg.det(q))
    t = jnp.array([[[5.0, -3.0, 11.0]]])
    return sb.rotate(q).translate(jnp.broadcast_to(t, (sb.batch_size, 1, 3)))


def test_featurization_rigid_invariance():
    sb = StructureBatch.from_pdb(pdb_path("1REX.pdb"))
    moved = _rigid_move(sb)

    g0 = sb.inter_residue_geometry()
    g1 = moved.inter_residue_geometry()
    for k in ["d_ca", "d_cb", "d_no", "omega", "theta", "phi"]:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        m = ~(np.isnan(a) | np.isnan(b))
        np.testing.assert_allclose(a[m], b[m], atol=5e-3, err_msg=k)

    d0, m0 = sb.backbone_dihedrals()
    d1, m1 = moved.backbone_dihedrals()
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    np.testing.assert_allclose(
        np.asarray(d0)[np.asarray(m0)], np.asarray(d1)[np.asarray(m1)], atol=1e-3
    )


def test_frames_equivariance():
    """Frames rotate with the structure: R_frames' = Q @ R_frames."""
    sb = StructureBatch.from_pdb(pdb_path("1REX.pdb"))
    key = jax.random.PRNGKey(3)
    q, _ = jnp.linalg.qr(jax.random.normal(key, (3, 3)))
    q = q * jnp.sign(jnp.linalg.det(q))
    moved = sb.rotate(q)

    f0 = np.asarray(sb.backbone_orientations())
    f1 = np.asarray(moved.backbone_orientations())
    expected = np.einsum("ij,bljk->blik", np.asarray(q), f0)
    m = np.asarray(sb.get_residue_mask()).astype(bool)
    np.testing.assert_allclose(f1[m], expected[m], atol=1e-4)


def test_pairwise_maps_custom_vjp():
    """Gradient flows through the Pallas forward via the jnp backward."""
    from protstruc_tpu.ops.pallas_pairwise import pairwise_maps

    rng = np.random.RandomState(0)
    L = 16
    xyz = jnp.asarray(rng.randn(1, L, 15, 3).astype(np.float32) * 5)
    # off-diagonal mask: the diagonal is degenerate (zero distance -> the
    # sqrt in the norm has an undefined derivative), so losses must mask it
    # — true for the jnp path and the custom-VJP path alike
    offdiag = ~jnp.eye(L, dtype=bool)[None]

    def loss(x):
        g = pairwise_maps(x, 16, 16, True)  # interpret mode on CPU
        return jnp.sum(jnp.where(offdiag, g["d_cb"] ** 2, 0.0)) + jnp.sum(
            jnp.where(offdiag, jnp.cos(g["omega"]), 0.0)
        )

    val, grad = jax.value_and_grad(loss)(xyz)
    assert np.isfinite(float(val))
    assert grad.shape == xyz.shape
    assert np.isfinite(np.asarray(grad)[:, :, [0, 1, 4]]).all()  # N/CA/CB grads

    # gradient matches the pure-jnp formulation
    from protstruc_tpu.ops.pallas_pairwise import _maps_jnp

    def loss_jnp(x):
        g = _maps_jnp(x)
        return jnp.sum(jnp.where(offdiag, g["d_cb"] ** 2, 0.0)) + jnp.sum(
            jnp.where(offdiag, jnp.cos(g["omega"]), 0.0)
        )

    grad_ref = jax.grad(loss_jnp)(xyz)
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(grad_ref), rtol=1e-3, atol=1e-3
    )


def test_pallas_bf16_output():
    from protstruc_tpu.ops.pallas_pairwise import pairwise_maps_pallas

    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.randn(1, 32, 15, 3).astype(np.float32) * 5)
    g32 = pairwise_maps_pallas(xyz, 16, 16, True)
    g16 = pairwise_maps_pallas(xyz, 16, 16, True, out_dtype=jnp.bfloat16)
    assert g16["d_cb"].dtype == jnp.bfloat16
    a = np.asarray(g32["d_cb"])
    b = np.asarray(g16["d_cb"], dtype=np.float32)
    np.testing.assert_allclose(b, a, rtol=1e-2, atol=1e-2)


def test_checkify_catches_nan_featurization():
    """jax.experimental.checkify integrates with the geometry kernels for
    NaN surveillance (SURVEY §5: the TPU answer to the reference's absent
    sanitizer story)."""
    from jax.experimental import checkify

    import protstruc_tpu.geometry as geom

    def angle_of(a, b, c):
        return geom.angle(a, b, c)

    checked = checkify.checkify(jax.jit(angle_of), errors=checkify.nan_checks)

    x = jnp.ones((4, 3))
    err, _ = checked(x, x, x + 1.0)  # coincident a == b -> 0/0 NaN
    with pytest.raises(Exception):
        err.throw()

    rng = np.random.RandomState(0)
    pts = [jnp.asarray(rng.randn(4, 3), jnp.float32) for _ in range(3)]
    err2, _ = checked(*pts)  # well-separated points: no error
    err2.throw()


def test_validate_batch_ok():
    sb = StructureBatch.from_pdb(pdb_path("1ad0_DC.pdb"))
    assert validate_batch(sb) == []
    assert validate_batch(sb.standardize()) == []


def test_validate_batch_catches_problems():
    sb = StructureBatch.from_pdb(pdb_path("1ad0_DC.pdb"))
    # corrupt: claim an atom exists where coords are NaN
    bad = sb.replace(atom_mask=jnp.ones_like(sb.atom_mask))
    problems = validate_batch(bad, raise_on_error=False)
    assert any("non-finite" in p for p in problems)
    with pytest.raises(BatchValidationError):
        validate_batch(bad)

    # inconsistent standardization state
    bad2 = sb.replace(standardized=True)
    assert any("mu/std missing" in p for p in validate_batch(bad2, raise_on_error=False))
