"""L1 geometry kernel tests.

Ports the reference's synthetic-value tests (tests/test_geometry.py) to the
JAX implementation and adds jit/vmap coverage plus masked-Kabsch invariants.
Cross-implementation parity vs the reference torch code is in
test_parity_reference.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import protstruc_tpu.geometry as geom


def test_dot():
    assert geom.dot(jnp.array([1.0, 2, 3]), jnp.array([4.0, 5, 6])) == 32


def test_norm():
    a = jnp.array([[1.0, 2, 3], [4, 5, 6]])
    out = geom.norm(a)
    assert out.shape == (2, 1)
    np.testing.assert_allclose(out, [[14**0.5], [77**0.5]], rtol=1e-6)


def test_unit():
    v = geom.unit(jnp.array([3.0, 0.0, 4.0]))
    np.testing.assert_allclose(v, [0.6, 0.0, 0.8], rtol=1e-6)


def test_angle_degrees():
    a = jnp.array([[1.0, 0, 0], [1, 0, 0]])
    b = jnp.zeros((2, 3))
    c = jnp.array([[0.0, 1, 0], [0.5, np.sqrt(3) / 2, 0]])
    out = geom.angle(a, b, c, to_degree=True)
    assert out.shape == (2,)
    np.testing.assert_allclose(out, [90.0, 60.0], atol=1e-4)


def test_dihedral_sign_convention():
    # reference test_geometry.py:92-118: this configuration is exactly -90 deg
    a = jnp.array([[1.0, 0, 0]])
    b = jnp.array([[0.0, 0, 0]])
    c = jnp.array([[0.0, 1, 0]])
    d = jnp.array([[0.0, 1, 1]])
    out = geom.dihedral(a, b, c, d, to_degree=True)
    assert out.shape == (1,)
    np.testing.assert_allclose(out, [-90.0], atol=1e-4)


def test_dihedral_higher_dims():
    a = jnp.array([[[1.0, 0, 0]]])
    b = jnp.array([[[0.0, 0, 0]]])
    c = jnp.array([[[0.0, 1, 0]]])
    d = jnp.array([[[0.0, 1, 1]]])
    out = geom.dihedral(a, b, c, d, to_degree=True)
    assert out.shape == (1, 1)
    np.testing.assert_allclose(out, [[-90.0]], atol=1e-4)


def test_dihedral_range_random():
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (4, 64, 3))
    out = geom.dihedral(*pts)
    assert out.shape == (64,)
    assert jnp.all(out >= -np.pi) and jnp.all(out <= np.pi)


def test_dihedral_under_jit_and_vmap():
    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (4, 8, 16, 3))
    direct = geom.dihedral(*pts)
    jitted = jax.jit(geom.dihedral)(*pts)
    vmapped = jax.vmap(lambda p: geom.dihedral(*p), in_axes=1)(pts)
    np.testing.assert_allclose(direct, jitted, atol=1e-6)
    np.testing.assert_allclose(direct, vmapped, atol=1e-6)


def test_gram_schmidt_shapes_and_orthonormality():
    key = jax.random.PRNGKey(2)
    a, b, c = jax.random.normal(key, (3, 16, 30, 3))
    frame = geom.gram_schmidt(a, b, c)
    assert frame.shape == (16, 30, 3, 3)
    # random triples can be near-collinear -> f32 Gram-Schmidt loses a few
    # digits there; exactness on well-conditioned input is covered below.
    ident = jnp.einsum("...ij,...ik->...jk", frame, frame)
    np.testing.assert_allclose(ident, jnp.broadcast_to(jnp.eye(3), ident.shape), atol=2e-2)
    det = jnp.linalg.det(frame)
    np.testing.assert_allclose(det, jnp.ones_like(det), atol=1e-4)


def test_ideal_backbone_gives_identity_frame():
    # reference test_geometry.py:246-262
    xyz = geom.ideal_backbone_coordinates((16, 30))
    assert xyz.shape == (16, 30, 3, 3)
    xyz_cb = geom.ideal_backbone_coordinates((16, 30), include_cb=True)
    assert xyz_cb.shape == (16, 30, 4, 3)

    frame = geom.gram_schmidt(xyz[:, :, 0], xyz[:, :, 1], xyz[:, :, 2])
    np.testing.assert_allclose(
        frame, jnp.broadcast_to(jnp.eye(3), frame.shape), atol=1e-6
    )


def test_ideal_local_frame():
    x = geom.ideal_local_frame()
    assert x.shape == (4, 3)
    np.testing.assert_allclose(x[0], [0, 0, 0], atol=1e-7)  # N at origin
    np.testing.assert_allclose(jnp.linalg.norm(x[1] - x[0]), 1.458, atol=1e-5)


def test_place_fourth_atom_recovers_geometry():
    key = jax.random.PRNGKey(3)
    a, b, c = jax.random.normal(key, (3, 32, 3))
    length = jnp.full((32, 1), 1.5)
    planar = jnp.full((32, 1), 1.9)
    dih = jnp.full((32, 1), -2.0)
    x = geom.place_fourth_atom(a, b, c, length, planar, dih)
    assert x.shape == (32, 3)
    np.testing.assert_allclose(jnp.linalg.norm(x - c, axis=-1), 1.5, atol=1e-4)
    np.testing.assert_allclose(geom.angle(x, c, b), 1.9, atol=1e-4)


def test_kabsch_exact_recovery():
    """kabsch must exactly recover a known rigid transform."""
    key = jax.random.PRNGKey(4)
    a = jax.random.normal(key, (100, 3))
    # random rotation via QR
    q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(5), (3, 3)))
    q = q * jnp.sign(jnp.linalg.det(q))  # make proper rotation
    t_true = jnp.array([1.0, -2.0, 3.0])
    b = a @ q.T + t_true

    r, t = geom.kabsch(a, b)
    assert r.shape == (3, 3) and t.shape == (3,)
    np.testing.assert_allclose(r, q, atol=1e-5)
    np.testing.assert_allclose(t, t_true, atol=1e-5)
    aligned = a @ r.T + t
    np.testing.assert_allclose(aligned, b, atol=1e-5)


def test_masked_kabsch_ignores_masked_points():
    key = jax.random.PRNGKey(6)
    a = jax.random.normal(key, (50, 3))
    q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(7), (3, 3)))
    q = q * jnp.sign(jnp.linalg.det(q))
    b = a @ q.T + jnp.array([0.5, 0.5, 0.5])

    # corrupt (even NaN) the masked-out points
    a_bad = a.at[40:].set(jnp.nan)
    b_bad = b.at[40:].set(1e9)
    w = jnp.arange(50) < 40

    r, t = geom.masked_kabsch(a_bad, b_bad, w)
    np.testing.assert_allclose(r, q, atol=1e-5)
    aligned = a[:40] @ r.T + t
    np.testing.assert_allclose(aligned, b[:40], atol=1e-4)


def test_masked_kabsch_batched_vmap():
    key = jax.random.PRNGKey(8)
    a = jax.random.normal(key, (4, 30, 3))
    b = a + 1.0  # pure translation
    w = jnp.ones((4, 30))
    r, t = geom.masked_kabsch(a, b, w)
    assert r.shape == (4, 3, 3) and t.shape == (4, 3)
    np.testing.assert_allclose(r, jnp.broadcast_to(jnp.eye(3), (4, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(t, jnp.ones((4, 3)), atol=1e-5)


def test_fix_chirality_conditional_mirror():
    """Right-handed backbones pass through; their mirror image gets flipped
    back (divergence from the reference's unconditional mirror — see
    geometry.fix_chirality docstring)."""
    from protstruc_tpu.ops.nerf import backbone_from_dihedrals

    # fold a natural alpha-helical backbone: phi=-57deg, psi=-47deg
    tor = np.tile(np.array([-1.0, -0.82, np.pi], np.float32), (1, 12, 1))
    xyz4 = np.asarray(backbone_from_dihedrals(jnp.asarray(tor)))[0]
    coords = jnp.asarray(np.stack([xyz4[:, 0], xyz4[:, 1], xyz4[:, 2]]))

    out = geom.fix_chirality(coords)
    np.testing.assert_allclose(out, coords, atol=1e-6)  # already right-handed

    mirrored = coords * jnp.array([1.0, 1.0, -1.0])
    fixed = geom.fix_chirality(mirrored)
    np.testing.assert_allclose(fixed, coords, atol=1e-6)  # flipped back


def test_ideal_carbonyl_oxygen_geometry():
    """O placement reproduces the ideal CO bond, ACO angle, NACO dihedral."""
    from protstruc_tpu.constants import ideal

    rng = np.random.default_rng(0)
    # a curled synthetic backbone, batched (2, L, 3) per atom kind
    L = 6
    t = np.linspace(0, 2.0, L)
    ca = np.stack([np.cos(t) * 5, np.sin(t) * 5, t * 1.5], -1)
    n = ca + rng.normal(0, 0.1, ca.shape) + np.array([1.45, 0, 0])
    c = ca + rng.normal(0, 0.1, ca.shape) + np.array([0, 1.52, 0])
    n, ca, c = (jnp.asarray(np.stack([a, a + 0.3])) for a in (n, ca, c))

    o = geom.ideal_carbonyl_oxygen(n, ca, c)
    assert o.shape == ca.shape

    # bond length C-O and planar angle CA-C-O are ideal everywhere
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(o - c), axis=-1), ideal.CO, atol=1e-5
    )
    ang = np.asarray(geom.angle(ca, c, o))
    np.testing.assert_allclose(ang, ideal.ACO, atol=1e-5)

    # dihedral N_{i+1}-CA_i-C_i-O_i is the planarity constant (interior
    # residues; the final residue takes the documented ideal-psi placement)
    n_next = jnp.roll(n, -1, axis=-2)
    dih = np.asarray(geom.dihedral(n_next, ca, c, o))[:, :-1]
    np.testing.assert_allclose(np.abs(dih), abs(ideal.NACO), atol=1e-2)

    # terminal residue: dih(N_i, CA_i, C_i, O_i) = psi_ideal - pi (135 - 180)
    term = np.asarray(geom.dihedral(n, ca, c, o))[:, -1]
    np.testing.assert_allclose(term, np.deg2rad(135.0) - np.pi, atol=1e-5)


def test_ideal_carbonyl_oxygen_chain_breaks():
    """With chain_idx, the last residue of EACH chain ignores the next
    chain's N (ADVICE r3: the rolled N used to leak across chain breaks),
    so moving chain B must not move chain A's final carbonyl."""
    from protstruc_tpu.constants import ideal

    rng = np.random.default_rng(1)
    L = 8
    t = np.linspace(0, 2.5, L)
    ca = np.stack([np.cos(t) * 5, np.sin(t) * 5, t * 1.5], -1)
    n = ca + rng.normal(0, 0.1, ca.shape) + np.array([1.45, 0, 0])
    c = ca + rng.normal(0, 0.1, ca.shape) + np.array([0, 1.52, 0])
    chain_idx = np.array([0, 0, 0, 0, 1, 1, 1, 1])

    o = np.asarray(geom.ideal_carbonyl_oxygen(n, ca, c, chain_idx=chain_idx))

    # translate chain B far away: chain A's O placements are unchanged
    shift = (chain_idx == 1)[:, None] * 100.0
    o2 = np.asarray(geom.ideal_carbonyl_oxygen(
        n + shift, ca + shift, c + shift, chain_idx=chain_idx))
    np.testing.assert_allclose(o2[:4], o[:4], atol=1e-5)

    # both chain-final residues use the ideal-psi placement
    dih = np.asarray(geom.dihedral(n, ca, c, o))
    np.testing.assert_allclose(dih[[3, 7]], np.deg2rad(135.0) - np.pi,
                               atol=1e-5)
    # bond geometry stays ideal everywhere
    np.testing.assert_allclose(np.linalg.norm(o - c, axis=-1), ideal.CO,
                               atol=1e-5)


def test_angle_collinear_points_pinned_not_nan():
    """Collinear-but-distinct points: rounding can push |cos| above 1;
    the angle must pin to 0/pi, never NaN (NaN is reserved for
    coincident/missing atoms)."""
    rng = np.random.RandomState(0)
    bad = 0
    for _ in range(2000):
        a = rng.randn(3).astype(np.float32)
        c1 = -1.37 * a  # antiparallel through the origin
        c2 = 2.29 * a   # parallel
        th1 = float(geom.angle(a, np.zeros(3, np.float32), c1))
        th2 = float(geom.angle(a, np.zeros(3, np.float32), c2))
        if np.isnan(th1) or np.isnan(th2):
            bad += 1
            continue
        assert abs(th1 - np.pi) < 1e-3
        assert abs(th2) < 1e-3
    assert bad == 0

    # coincident points stay NaN (the load-bearing degenerate convention)
    p = np.ones(3, np.float32)
    assert np.isnan(float(geom.angle(p, p, p)))


def test_angle_gradient_finite_at_collinear():
    import jax
    import jax.numpy as jnp

    def loss(a):
        return jnp.sum(geom.angle(a, jnp.zeros(3), -2.0 * a) ** 2)

    g = jax.grad(loss)(jnp.asarray([1.0, 2.0, 3.0]))
    assert np.isfinite(np.asarray(g)).all()


def test_dihedral_degenerate_pinned_to_zero():
    """Coincident first two atoms (zero normal vectors): the dihedral is
    pinned to exactly 0 — not a backend-dependent sign-of-zero +/-pi."""
    a = np.asarray([1.0, 0.0, 0.0], np.float32)
    b = a.copy()
    c = np.asarray([0.0, 1.0, 0.0], np.float32)
    d = np.asarray([0.0, 1.0, 1.0], np.float32)
    assert float(geom.dihedral(a, b, c, d)) == 0.0
