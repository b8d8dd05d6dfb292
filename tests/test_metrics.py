"""Structure-metric tests: rmsd / superimpose / TM-score / GDT."""

import jax
import jax.numpy as jnp
import numpy as np

from protstruc_tpu.ops.metrics import gdt_ts, rmsd, superimpose, tm_score


def _rigid(a, seed=0):
    q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(seed), (3, 3)))
    q = q * jnp.sign(jnp.linalg.det(q))
    return a @ q.T + jnp.array([3.0, -1.0, 2.0])


def test_rmsd_zero_after_rigid_motion():
    a = jax.random.normal(jax.random.PRNGKey(1), (64, 3)) * 10
    b = _rigid(a)
    assert float(rmsd(a, b)) < 1e-4          # aligned
    assert float(rmsd(a, b, align=False)) > 1.0


def test_rmsd_known_value():
    a = jnp.zeros((10, 3))
    b = jnp.zeros((10, 3)).at[:, 0].set(2.0)
    assert abs(float(rmsd(a, b, align=False)) - 2.0) < 1e-6


def test_rmsd_masked_ignores_outliers():
    a = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    b = a.at[30:].add(100.0)
    mask = jnp.arange(32) < 30
    assert float(rmsd(a, b, mask=mask)) < 1e-4


def test_superimpose_batched():
    a = jax.random.normal(jax.random.PRNGKey(3), (4, 50, 3)) * 5
    b = jnp.stack([_rigid(x, seed=i) for i, x in enumerate(a)])
    aligned, r = superimpose(a, b)
    assert aligned.shape == a.shape and r.shape == (4,)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-3)


def test_tm_score_bounds():
    a = jax.random.normal(jax.random.PRNGKey(4), (100, 3)) * 10
    assert float(tm_score(a, _rigid(a))) > 0.999          # identical
    far = a + jax.random.normal(jax.random.PRNGKey(5), a.shape) * 20
    assert float(tm_score(a, far)) < 0.4                  # garbage


def test_gdt_ts():
    a = jax.random.normal(jax.random.PRNGKey(6), (80, 3)) * 8
    assert float(gdt_ts(a, _rigid(a))) > 0.999
    # half the residues displaced by 3 A (between the 2 and 4 A cutoffs)
    b = a.at[:40].add(jnp.array([3.0, 0.0, 0.0]))
    val = float(gdt_ts(a, b, align=False))
    assert 0.5 < val < 1.0


def test_metrics_jit():
    a = jax.random.normal(jax.random.PRNGKey(7), (30, 3))
    b = _rigid(a)
    assert float(jax.jit(rmsd)(a, b)) < 1e-4
    assert float(jax.jit(tm_score)(a, b)) > 0.99


def test_rmsd_tm_nan_at_masked_positions():
    """NaN coordinates at masked positions (the library's missing-atom
    convention) must not poison rmsd/tm_score/superimpose."""
    import jax.numpy as jnp

    from protstruc_tpu.ops.metrics import rmsd, superimpose, tm_score

    rng = np.random.RandomState(0)
    a = rng.randn(1, 10, 3).astype(np.float32)
    b = a.copy()
    mask = np.ones((1, 10), bool)
    a[0, 3] = np.nan  # masked-out missing atom
    b[0, 3] = np.nan
    mask[0, 3] = False

    r = float(np.asarray(rmsd(a, b, mask=mask)))
    assert np.isfinite(r) and r < 1e-4
    t = float(np.asarray(tm_score(a, b, mask=mask)))
    assert np.isfinite(t) and t > 0.99
    _, r2 = superimpose(a, b, mask=mask)
    assert np.isfinite(float(np.asarray(r2)))
