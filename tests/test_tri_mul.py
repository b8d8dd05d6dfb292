"""Fused triangle-multiplication kernels (ops/tri_mul.py) vs the flax path.

The fused path must be a drop-in: identical param tree (same names, shapes
AND init values), matching forward values, and matching gradients through
pair and every param — so checkpoints and optimizer states are
interchangeable across the ``fused_tri`` flag.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protstruc_tpu.models.trfold import TrFoldConfig, TriangleMultiplication


def _setup(C=16, B=2, L=12, dtype=jnp.float32, outgoing=True, seed=0):
    cfg = TrFoldConfig(node_dim=2 * C, pair_dim=C, dtype=dtype)
    cfg_f = TrFoldConfig(node_dim=2 * C, pair_dim=C, dtype=dtype,
                         fused_tri=True)
    ref = TriangleMultiplication(cfg, outgoing=outgoing)
    fused = TriangleMultiplication(cfg_f, outgoing=outgoing)
    key = jax.random.PRNGKey(seed)
    pair = jax.random.normal(key, (B, L, L, C), dtype)
    mask = jnp.arange(L)[None, :] < jnp.asarray([[L], [L - 3]])[:, 0, None]
    params = ref.init(jax.random.PRNGKey(1), pair, mask)["params"]
    return ref, fused, params, pair, mask


def test_param_tree_identical():
    ref, fused, params, pair, mask = _setup()
    pf = fused.init(jax.random.PRNGKey(1), pair, mask)["params"]
    flat_r = jax.tree_util.tree_leaves_with_path(params)
    flat_f = jax.tree_util.tree_leaves_with_path(pf)
    assert [p for p, _ in flat_r] == [p for p, _ in flat_f]
    for (path, a), (_, b) in zip(flat_r, flat_f):
        assert a.shape == b.shape and a.dtype == b.dtype, path
        # same path -> same folded init RNG -> identical values
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))


@pytest.mark.parametrize("outgoing", [True, False])
def test_forward_parity_f32(outgoing):
    ref, fused, params, pair, mask = _setup(outgoing=outgoing)
    out_r = ref.apply({"params": params}, pair, mask)
    out_f = fused.apply({"params": params}, pair, mask)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)


def test_forward_parity_bf16():
    ref, fused, params, pair, mask = _setup(dtype=jnp.bfloat16)
    out_r = np.asarray(ref.apply({"params": params}, pair, mask), np.float32)
    out_f = np.asarray(fused.apply({"params": params}, pair, mask),
                       np.float32)
    scale = max(np.abs(out_r).max(), 1e-3)
    assert np.max(np.abs(out_f - out_r)) / scale < 5e-2


@pytest.mark.parametrize("outgoing", [True, False])
def test_gradient_parity(outgoing):
    ref, fused, params, pair, mask = _setup(outgoing=outgoing)
    # non-uniform cotangent so every output position is exercised
    w = jax.random.normal(jax.random.PRNGKey(3), pair.shape)

    def loss(mod):
        def f(params, pair):
            out = mod.apply({"params": params}, pair, mask)
            return jnp.sum(out * w)
        return f

    gr_p, gr_x = jax.grad(loss(ref), argnums=(0, 1))(params, pair)
    gf_p, gf_x = jax.grad(loss(fused), argnums=(0, 1))(params, pair)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               rtol=1e-4, atol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gr_p),
            jax.tree_util.tree_leaves_with_path(gf_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=str(path))


def test_row_padding_and_tile_override():
    """N not divisible by the row tile: pad rows must not leak into values
    or gradients."""
    from protstruc_tpu.ops.tri_mul import fused_triangle_multiplication

    ref, fused, params, pair, mask = _setup(C=8, L=9)  # N = 2*81 = 162

    def tolist(p):
        return {k: (tuple(v.values()) if "kernel" in v else
                    (v["scale"], v["bias"]))
                for k, v in p.items()}

    pd = {k: ((v["kernel"], v["bias"]) if "kernel" in v
              else (v["scale"], v["bias"])) for k, v in params.items()}
    out = fused_triangle_multiplication(pair, mask, pd, outgoing=True,
                                        tile_rows=128)
    out_r = ref.apply({"params": params}, pair, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)

    g = jax.grad(lambda x: jnp.sum(
        fused_triangle_multiplication(x, mask, pd, tile_rows=128) ** 2))(pair)
    g_r = jax.grad(lambda x: jnp.sum(
        ref.apply({"params": params}, x, mask) ** 2))(pair)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_r),
                               rtol=1e-4, atol=1e-5)


def test_fused_block_in_model():
    """A full TrFold step with fused_tri trains: loss finite, grads flow."""
    from protstruc_tpu.models.trfold import TrFold, loss_fn

    cfg = TrFoldConfig(node_dim=16, pair_dim=8, n_heads=2, n_blocks=1,
                       pair_update="triangle", fused_tri=True)
    model = TrFold(cfg)
    B, L = 2, 10
    feats = {
        "seq_idx": jnp.zeros((B, L), jnp.int32),
        "torsions": jnp.zeros((B, L, 3)),
        "torsion_mask": jnp.ones((B, L, 3), bool),
        "residue_mask": jnp.ones((B, L), bool),
        "chain_idx": jnp.zeros((B, L), jnp.int32),
        "d_cb": jnp.ones((B, L, L)) * 5.0,
        "omega": jnp.zeros((B, L, L)),
        "theta": jnp.zeros((B, L, L)),
        "phi": jnp.zeros((B, L, L)),
        "pair_mask": jnp.ones((B, L, L), bool),
    }
    params = model.init(jax.random.PRNGKey(0), feats)["params"]
    loss, grads = jax.value_and_grad(loss_fn)(params, model, feats)
    assert np.isfinite(float(loss))
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in jax.tree_util.tree_leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
