"""Rigid-transform utilities and backbone idealization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from protstruc_tpu.ops.idealize import ideality_loss, idealize_backbone
from protstruc_tpu.ops.rigid import (
    frame_apply,
    frame_compose,
    frame_invert,
    quat_to_rot,
    random_rotations,
    rot_to_quat,
    rotation_angle,
)

from tests.conftest import pdb_path


def test_quat_rot_roundtrip():
    key = jax.random.PRNGKey(0)
    r = random_rotations(key, (32,))
    det = np.asarray(jnp.linalg.det(r))
    np.testing.assert_allclose(det, 1.0, atol=1e-5)
    ident = np.asarray(jnp.einsum("bij,bik->bjk", r, r))
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)

    q = rot_to_quat(r)
    r2 = quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-5)
    assert (np.asarray(q[:, 0]) >= 0).all()  # canonical sign


def test_rot_to_quat_edge_cases():
    # identity and 180-degree rotations exercise all Shepperd branches
    rots = [jnp.eye(3)]
    for axis in range(3):
        d = np.full(3, -1.0)
        d[axis] = 1.0
        rots.append(jnp.asarray(np.diag(d), jnp.float32))
    for r in rots:
        q = rot_to_quat(r)
        np.testing.assert_allclose(np.asarray(quat_to_rot(q)), np.asarray(r), atol=1e-5)


def test_frame_algebra():
    key = jax.random.PRNGKey(1)
    r1 = random_rotations(key, (8,))
    r2 = random_rotations(jax.random.PRNGKey(2), (8,))
    t1 = jax.random.normal(jax.random.PRNGKey(3), (8, 3))
    t2 = jax.random.normal(jax.random.PRNGKey(4), (8, 3))
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 10, 3))

    rc, tc = frame_compose(r1, t1, r2, t2)
    direct = frame_apply(r1, t1, frame_apply(r2, t2, x))
    np.testing.assert_allclose(np.asarray(frame_apply(rc, tc, x)), np.asarray(direct), atol=1e-5)

    ri, ti = frame_invert(r1, t1)
    back = frame_apply(ri, ti, frame_apply(r1, t1, x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_rotation_angle():
    assert float(rotation_angle(jnp.eye(3))) < 1e-6
    half = quat_to_rot(jnp.array([np.cos(0.5), np.sin(0.5), 0.0, 0.0]))
    np.testing.assert_allclose(float(rotation_angle(half)), 1.0, atol=1e-5)


def test_idealize_improves_noisy_backbone():
    from protstruc_tpu import StructureBatch

    sb = StructureBatch.from_pdb(pdb_path("1REX.pdb"))
    bb = jnp.nan_to_num(sb.get_xyz()[0, :, :4], nan=0.0)  # (L, 4, 3) N/CA/C/O
    mask = sb.residue_mask[0]

    noisy = bb + jax.random.normal(jax.random.PRNGKey(0), bb.shape) * 0.15
    loss_before = float(ideality_loss(noisy, mask))
    refined, loss_after = idealize_backbone(noisy, mask, n_steps=200)
    assert float(loss_after) < loss_before * 0.2, (loss_before, float(loss_after))

    # refined bond lengths near ideal; coordinates stay close to input
    n, ca = refined[:, 0], refined[:, 1]
    d = np.asarray(jnp.linalg.norm(ca - n, axis=-1))[np.asarray(mask)]
    assert abs(d.mean() - 1.458) < 0.03
    drift = np.asarray(jnp.linalg.norm(refined - noisy, axis=-1)).max()
    assert drift < 1.5


def test_idealize_nan_padding_and_chain_breaks():
    """NaN-padded residues must not poison idealization gradients, and
    chain boundaries must not be pulled together by the peptide terms."""
    import jax.numpy as jnp

    from protstruc_tpu import StructureBatch
    from protstruc_tpu.ops.idealize import idealize_backbone

    sb = StructureBatch.from_sequence(["ACDEFG", "ACD"])  # ragged: NaN-free
    coords = np.array(sb.xyz)[:, :, :4]
    coords[1, 3:] = np.nan  # padding rows as NaN (missing-atom convention)
    two_chain = np.concatenate([coords[0], coords[0]], axis=0)[None]
    chain_idx = np.repeat(np.asarray([0, 1]), 6)[None]

    out, loss = idealize_backbone(
        jnp.asarray(two_chain), n_steps=30,
        chain_idx=jnp.asarray(chain_idx))
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(out)).all()

    # NaN-padded single structure: refined finite where valid, NaN kept
    out2, loss2 = idealize_backbone(jnp.asarray(coords[1:2]), n_steps=10)
    assert np.isfinite(float(loss2))
    o2 = np.asarray(out2)
    assert np.isfinite(o2[0, :3]).all()
    assert np.isnan(o2[0, 3:]).all()

    # chain-boundary distance is NOT restrained toward a peptide bond:
    # the two copies stay well apart (they start superimposed, so just
    # check the cross-boundary C-N distance is not forced to ~1.33 A
    # when the chains begin far apart)
    shifted = two_chain.copy()
    shifted[0, 6:] += 50.0
    out3, _ = idealize_backbone(
        jnp.asarray(shifted), n_steps=50, chain_idx=jnp.asarray(chain_idx))
    d = np.linalg.norm(np.asarray(out3)[0, 6, 0] - np.asarray(out3)[0, 5, 2])
    assert d > 10.0
