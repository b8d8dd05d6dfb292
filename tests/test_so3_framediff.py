"""SO(3) ops and SE(3) frame-diffusion tests."""

import jax
import jax.numpy as jnp
import numpy as np

from protstruc_tpu.ops.rigid import random_rotations, rotation_angle
from protstruc_tpu.ops.so3 import (
    geodesic_interp,
    igso3_score_norm,
    igso3_table,
    rot_to_rotvec,
    rotvec_to_rot,
    sample_igso3,
)


class TestAxisAngle:
    def test_roundtrip(self):
        key = jax.random.PRNGKey(0)
        v = jax.random.normal(key, (64, 3))
        # keep angles in (0, pi) where the map is bijective
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        v = v / n * jnp.clip(n, 0.05, 3.0)
        r = rotvec_to_rot(v)
        v2 = rot_to_rotvec(r)
        np.testing.assert_allclose(v, v2, atol=1e-5)

    def test_small_angles(self):
        v = jnp.array([[1e-6, -2e-6, 1e-7], [0.0, 0.0, 0.0]])
        r = rotvec_to_rot(v)
        assert np.isfinite(np.asarray(r)).all()
        np.testing.assert_allclose(r[1], jnp.eye(3), atol=1e-7)
        np.testing.assert_allclose(rot_to_rotvec(r), v, atol=1e-7)

    def test_orthonormal(self):
        key = jax.random.PRNGKey(1)
        v = jax.random.normal(key, (32, 3))
        r = rotvec_to_rot(v)
        eye = jnp.einsum("bij,bkj->bik", r, r)
        np.testing.assert_allclose(eye, jnp.broadcast_to(jnp.eye(3), eye.shape),
                                   atol=1e-6)

    def test_gradients_finite_at_singularities(self):
        def f(v):
            return jnp.sum(rotvec_to_rot(v))

        g = jax.grad(f)(jnp.zeros((3,)))
        assert np.isfinite(np.asarray(g)).all()


class TestIGSO3:
    def test_table_shapes(self):
        sigmas, omegas, cdf, dlogf = igso3_table()
        assert cdf.shape == (len(sigmas), len(omegas))
        assert dlogf.shape == cdf.shape
        # CDFs are monotone in [0, 1]
        assert (np.diff(cdf, axis=1) >= -1e-6).all()
        np.testing.assert_allclose(cdf[:, -1], 1.0, atol=1e-6)

    def test_sampling_angle_grows_with_sigma(self):
        key = jax.random.PRNGKey(2)
        r_small = sample_igso3(key, 0.05, (512,))
        r_mid = sample_igso3(key, 1.5, (512,))
        r_big = sample_igso3(key, 2.5, (512,))
        a_small = float(jnp.mean(rotation_angle(r_small)))
        a_mid = float(jnp.mean(rotation_angle(r_mid)))
        a_big = float(jnp.mean(rotation_angle(r_big)))
        assert a_small < 0.2 < a_mid < a_big
        # large sigma approaches the uniform (Haar) mean angle ~126.5 deg
        assert abs(a_big - 2.2073) < 0.15

    def test_score_norm_sign(self):
        # density decreasing in omega at small sigma -> negative score at
        # mid-range angles
        s = igso3_score_norm(0.1, jnp.array([0.5, 1.0, 2.0]))
        assert (np.asarray(s) < 0).all()

    def test_samples_orthonormal(self):
        r = sample_igso3(jax.random.PRNGKey(3), 0.5, (16,))
        eye = jnp.einsum("bij,bkj->bik", r, r)
        np.testing.assert_allclose(eye, jnp.broadcast_to(jnp.eye(3), eye.shape),
                                   atol=1e-5)


class TestGeodesic:
    def test_endpoints_and_midpoint(self):
        key = jax.random.PRNGKey(4)
        r0 = random_rotations(key, (8,))
        r1 = random_rotations(jax.random.PRNGKey(5), (8,))
        np.testing.assert_allclose(geodesic_interp(r0, r1, 0.0), r0, atol=1e-5)
        np.testing.assert_allclose(geodesic_interp(r0, r1, 1.0), r1, atol=1e-4)
        mid = geodesic_interp(r0, r1, 0.5)
        d0 = rotation_angle(jnp.einsum("bji,bjk->bik", r0, mid))
        d1 = rotation_angle(jnp.einsum("bji,bjk->bik", mid, r1))
        np.testing.assert_allclose(d0, d1, atol=1e-4)


class TestFrameDiff:
    def _setup(self):
        from protstruc_tpu.models.framediff import FrameDenoiser, FrameDiffConfig

        cfg = FrameDiffConfig(node_dim=32, pair_dim=16, n_heads=2, n_iter=1, T=8)
        model = FrameDenoiser(cfg)
        B, L = 2, 10
        key = jax.random.PRNGKey(0)
        r0 = random_rotations(key, (B, L))
        x0 = jax.random.normal(jax.random.PRNGKey(1), (B, L, 3))
        mask = jnp.ones((B, L), bool)
        params = model.init(jax.random.PRNGKey(2), r0, x0,
                            jnp.zeros((B,)), mask)["params"]
        return cfg, model, params, r0, x0, mask

    def test_corrupt_shapes_and_noise_scale(self):
        from protstruc_tpu.models.framediff import FrameDiffConfig, corrupt_frames

        cfg = FrameDiffConfig(T=8)
        key = jax.random.PRNGKey(0)
        B, L = 4, 16
        r0 = random_rotations(key, (B, L))
        x0 = jnp.zeros((B, L, 3))
        t_lo = jnp.zeros((B,), jnp.int32)
        t_hi = jnp.full((B,), cfg.T - 1, jnp.int32)
        r_lo, _ = corrupt_frames(jax.random.PRNGKey(1), r0, x0, t_lo, cfg)
        r_hi, _ = corrupt_frames(jax.random.PRNGKey(1), r0, x0, t_hi, cfg)
        d_lo = float(jnp.mean(rotation_angle(jnp.einsum("blji,bljk->blik", r0, r_lo))))
        d_hi = float(jnp.mean(rotation_angle(jnp.einsum("blji,bljk->blik", r0, r_hi))))
        assert d_lo < 0.2 < d_hi

    def test_loss_and_grads(self):
        from protstruc_tpu.models.framediff import framediff_loss

        cfg, model, params, r0, x0, mask = self._setup()
        val, g = jax.value_and_grad(
            lambda p: framediff_loss(p, model, jax.random.PRNGKey(3),
                                     r0, x0, mask, cfg)
        )(params)
        assert np.isfinite(float(val))
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))

    def test_sample_shapes_valid(self):
        from protstruc_tpu.models.framediff import framediff_sample

        cfg, model, params, *_ = self._setup()
        r, x = jax.jit(
            lambda p, k: framediff_sample(p, model, k, (2, 10), cfg)
        )(params, jax.random.PRNGKey(4))
        assert r.shape == (2, 10, 3, 3)
        assert x.shape == (2, 10, 3)
        assert np.isfinite(np.asarray(r)).all()
        assert np.isfinite(np.asarray(x)).all()
        eye = jnp.einsum("blij,blkj->blik", r, r)
        np.testing.assert_allclose(eye, jnp.broadcast_to(jnp.eye(3), eye.shape),
                                   atol=1e-4)

    def test_overfit_decreases_loss(self):
        import optax

        from protstruc_tpu.models.framediff import framediff_loss

        cfg, model, params, r0, x0, mask = self._setup()
        tx = optax.adam(2e-3)
        opt = tx.init(params)

        @jax.jit
        def step(p, o, k):
            l, g = jax.value_and_grad(
                lambda q: framediff_loss(q, model, k, r0, x0, mask, cfg)
            )(p)
            u, o = tx.update(g, o, p)
            return optax.apply_updates(p, u), o, l

        first, last = None, None
        for i in range(10):
            params, opt, l = step(params, opt, jax.random.PRNGKey(100 + i))
            if first is None:
                first = float(l)
            last = float(l)
        assert last < first


class TestFrameFlow:
    def _setup(self):
        from protstruc_tpu.models.framediff import FrameDenoiser, FrameDiffConfig

        cfg = FrameDiffConfig(node_dim=32, pair_dim=16, n_heads=2, n_iter=1, T=8)
        model = FrameDenoiser(cfg)
        B, L = 2, 10
        r0 = random_rotations(jax.random.PRNGKey(20), (B, L))
        x0 = jax.random.normal(jax.random.PRNGKey(21), (B, L, 3))
        mask = jnp.ones((B, L), bool)
        params = model.init(jax.random.PRNGKey(22), r0, x0,
                            jnp.zeros((B,)), mask)["params"]
        return cfg, model, params, r0, x0, mask

    def test_loss_and_grads(self):
        from protstruc_tpu.models.framediff import frameflow_loss

        cfg, model, params, r0, x0, mask = self._setup()
        val, g = jax.value_and_grad(
            lambda p: frameflow_loss(p, model, jax.random.PRNGKey(23),
                                     r0, x0, mask, cfg)
        )(params)
        assert np.isfinite(float(val))
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))

    def test_ode_sample_valid(self):
        from protstruc_tpu.models.framediff import frameflow_sample

        cfg, model, params, *_ = self._setup()
        r, x = jax.jit(
            lambda p, k: frameflow_sample(p, model, k, (2, 10), cfg, n_steps=6)
        )(params, jax.random.PRNGKey(24))
        assert r.shape == (2, 10, 3, 3) and x.shape == (2, 10, 3)
        assert np.isfinite(np.asarray(r)).all()
        assert np.isfinite(np.asarray(x)).all()
        eye = jnp.einsum("blij,blkj->blik", r, r)
        np.testing.assert_allclose(eye, jnp.broadcast_to(jnp.eye(3), eye.shape),
                                   atol=1e-3)

    def test_overfit(self):
        import optax
        from protstruc_tpu.models.framediff import frameflow_loss

        cfg, model, params, r0, x0, mask = self._setup()
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        # per-step losses are extremely noisy in the random (t, noise) draw
        # at B=2; evaluate a fixed 8-key average before vs after training
        eval_keys = [jax.random.PRNGKey(900 + i) for i in range(8)]

        @jax.jit
        def eval_loss(p):
            return jnp.mean(jnp.stack([
                frameflow_loss(p, model, k, r0, x0, mask, cfg)
                for k in eval_keys
            ]))

        @jax.jit
        def step(p, o, k):
            l, g = jax.value_and_grad(
                lambda q: frameflow_loss(q, model, k, r0, x0, mask, cfg)
            )(p)
            u, o = tx.update(g, o, p)
            return optax.apply_updates(p, u), o, l

        before = float(eval_loss(params))
        for i in range(40):
            params, opt, _ = step(params, opt, jax.random.PRNGKey(300 + i))
        after = float(eval_loss(params))
        assert after < before


def test_rotation_angle_grad_finite_at_identity():
    """arccos saturation (trace >= 3 in f32) must not NaN the gradient —
    the routine convergence state of a rotation loss."""
    import jax
    import jax.numpy as jnp

    from protstruc_tpu.ops.rigid import rotation_angle

    def loss(r):
        return jnp.sum(rotation_angle(r) ** 2)

    g = jax.grad(loss)(jnp.eye(3)[None])
    assert np.isfinite(np.asarray(g)).all()
    # antipodal (trace = -1) saturation too
    r_pi = jnp.diag(jnp.asarray([1.0, -1.0, -1.0]))[None]
    g2 = jax.grad(loss)(r_pi)
    assert np.isfinite(np.asarray(g2)).all()


def test_denoiser_distance_bins_resolve_normalized_distances():
    """Pair-distance bin edges are in NORMALIZED units: CA pairs 5 A and
    9 A apart (0.5 / 0.9 normalized at trans_scale=10) must land in
    different bins."""
    import jax.numpy as jnp

    from protstruc_tpu.models.framediff import FrameDiffConfig

    cfg = FrameDiffConfig()
    edges = jnp.linspace(0.0, 2.0, cfg.n_dist_bins - 1)
    b1 = int(jnp.searchsorted(edges, 5.0 / cfg.trans_scale))
    b2 = int(jnp.searchsorted(edges, 9.0 / cfg.trans_scale))
    assert b1 != b2
