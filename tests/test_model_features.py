"""Fused model-featurization path: kernel parity + model/loss equivalence.

``featurize_for_model(fused=True)`` feeds TrFold pre-binned distances and
precomputed angle sin/cos from one Pallas kernel (no raw maps, no atan2);
these tests pin it to the raw-map path on real structures.
"""

import jax
import jax.numpy as jnp
import numpy as np

import protstruc_tpu as ps
from protstruc_tpu.models.trfold import (
    TrFold,
    TrFoldConfig,
    featurize_for_model,
    loss_fn,
)
from protstruc_tpu.ops.histogram import distogram_bins
from protstruc_tpu.ops.pallas_pairwise import model_features_pallas

from tests.conftest import pdb_path


def _batch():
    sb = ps.StructureBatch.from_pdb(pdb_path("1ad0_DC.pdb"))
    return sb.residue_compact(np.arange(sb.n_residues)[None] < 64)


def test_model_features_kernel_matches_raw_maps():
    sb = _batch()
    g = sb.inter_residue_geometry()
    bins, ang = model_features_pallas(sb.xyz, interpret=True,
                                      ang_dtype=jnp.float32)

    np.testing.assert_array_equal(
        np.asarray(bins), np.asarray(distogram_bins(g["d_cb"], 36, 20.0))
    )
    for k, (name, fn) in enumerate(
        [("omega", jnp.sin), ("omega", jnp.cos), ("theta", jnp.sin),
         ("theta", jnp.cos), ("phi", jnp.sin), ("phi", jnp.cos)]
    ):
        want = jnp.nan_to_num(fn(g[name]), nan=0.0)
        # 1e-4: at near-0/pi angles the raw path's arccos form is itself
        # only ~3e-5-conditioned in f32; the kernel's rsqrt form is the
        # more accurate of the two (measured: 3 of 188k pairs differ ~3e-5)
        np.testing.assert_allclose(
            np.asarray(ang[:, k]), np.asarray(want), atol=1e-4,
            err_msg=f"{name}/{fn.__name__}",
        )


def test_fused_feats_match_raw_feats_through_model():
    sb = _batch()
    cfg = TrFoldConfig(node_dim=16, pair_dim=8, n_heads=2, n_blocks=2)
    model = TrFold(cfg)

    raw = featurize_for_model(sb)
    # f32 angle features for a strict apples-to-apples forward (the bf16
    # default adds only its ~4e-3 rounding; test_fused_path_trains covers it)
    fused = featurize_for_model(sb, fused=True, ang_dtype=jnp.float32)

    np.testing.assert_array_equal(
        np.asarray(raw["pair_mask"]), np.asarray(fused["pair_mask"])
    )

    params = model.init(jax.random.PRNGKey(0), raw)["params"]
    out_raw = model.apply({"params": params}, raw)
    out_fused = model.apply({"params": params}, fused)
    for k in out_raw:
        np.testing.assert_allclose(
            np.asarray(out_raw[k]), np.asarray(out_fused[k]),
            atol=1e-4, err_msg=k,
        )

    l_raw = float(loss_fn(params, model, raw))
    l_fused = float(loss_fn(params, model, fused))
    assert abs(l_raw - l_fused) < 1e-3, (l_raw, l_fused)


def test_fused_path_trains():
    import optax

    sb = _batch()
    cfg = TrFoldConfig(node_dim=16, pair_dim=8, n_heads=2, n_blocks=1)
    model = TrFold(cfg)
    feats = featurize_for_model(sb, fused=True)
    params = model.init(jax.random.PRNGKey(0), feats)["params"]

    loss, grads = jax.value_and_grad(loss_fn)(params, model, feats)
    assert np.isfinite(float(loss))
    assert all(
        np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads)
    )


class TestRemat:
    """cfg.remat must not change values or the param tree."""

    def test_remat_matches_dense(self):
        import dataclasses

        import numpy as np

        import protstruc_tpu as ps
        from protstruc_tpu.models.trfold import (
            TrFold, TrFoldConfig, featurize_for_model, loss_fn)

        rng = np.random.RandomState(0)
        xyz = rng.randn(2, 24, 15, 3).astype(np.float32) * 5.0
        sb = ps.StructureBatch.from_xyz(xyz)
        feats = featurize_for_model(sb)

        cfg = TrFoldConfig(node_dim=32, pair_dim=16, n_heads=2, n_blocks=2)
        model = TrFold(cfg)
        params = model.init(jax.random.PRNGKey(0), feats)["params"]

        model_r = TrFold(dataclasses.replace(cfg, remat=True))
        # identical param tree: init under remat produces the same structure
        params_r = model_r.init(jax.random.PRNGKey(0), feats)["params"]
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_r)

        out = model.apply({"params": params}, feats)
        out_r = model_r.apply({"params": params}, feats)
        np.testing.assert_allclose(
            out["distogram_logits"], out_r["distogram_logits"], atol=1e-5
        )

        g = jax.grad(loss_fn)(params, model, feats)
        g_r = jax.grad(loss_fn)(params, model_r, feats)
        for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_remat_policy_matches(self):
        """remat_policy must change neither values nor grads (it only
        changes WHICH intermediates the backward pass recomputes), and
        'tri_dots' must cut the backward recompute flops vs 'none'."""
        import dataclasses

        import numpy as np

        import protstruc_tpu as ps
        from protstruc_tpu.models.trfold import (
            TrFold, TrFoldConfig, featurize_for_model, loss_fn)

        rng = np.random.RandomState(1)
        xyz = rng.randn(1, 24, 15, 3).astype(np.float32) * 5.0
        sb = ps.StructureBatch.from_xyz(xyz)
        feats = featurize_for_model(sb)

        cfg = TrFoldConfig(node_dim=32, pair_dim=16, n_heads=2, n_blocks=2,
                           pair_update="triangle", remat=True)
        model = TrFold(cfg)
        params = model.init(jax.random.PRNGKey(0), feats)["params"]

        grads, flops = {}, {}
        for policy in ("none", "tri_dots", "dots"):
            m = TrFold(dataclasses.replace(cfg, remat_policy=policy))
            p = m.init(jax.random.PRNGKey(0), feats)["params"]
            assert (jax.tree_util.tree_structure(p)
                    == jax.tree_util.tree_structure(params))
            grads[policy] = jax.grad(loss_fn)(params, m, feats)
            compiled = (jax.jit(jax.grad(loss_fn), static_argnums=1)
                        .lower(params, m, feats).compile())
            try:
                flops[policy] = float(compiled.cost_analysis()["flops"])
            except Exception:
                flops[policy] = None

        leaves0 = jax.tree_util.tree_leaves(grads["none"])
        for policy in ("tri_dots", "dots"):
            for a, b in zip(leaves0, jax.tree_util.tree_leaves(grads[policy])):
                np.testing.assert_allclose(a, b, atol=1e-5)
        # the saved contraction outputs must actually remove recompute work
        if flops["none"] and flops["tri_dots"]:
            assert flops["tri_dots"] < flops["none"]

    def test_remat_policy_rejects_unknown(self):
        import pytest

        from protstruc_tpu.models.trfold import _remat_policy

        with pytest.raises(ValueError, match="remat_policy"):
            _remat_policy("everything")


class TestChiFeatures:
    def test_include_chi(self):
        import protstruc_tpu as ps
        from protstruc_tpu.models.trfold import (
            TrFold, TrFoldConfig, featurize_for_model, loss_fn)

        sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
        feats = featurize_for_model(sb, include_chi=True)
        assert feats["chi"].shape == sb.chain_idx.shape + (4,)

        cfg = TrFoldConfig(node_dim=32, pair_dim=16, n_heads=2, n_blocks=1)
        model = TrFold(cfg)
        params = model.init(jax.random.PRNGKey(0), feats)["params"]
        assert "chi_embed" in params

        out = model.apply({"params": params}, feats)
        assert np.isfinite(np.asarray(out["distogram_logits"])).all()
        g = jax.grad(loss_fn)(params, model, feats)
        chi_g = g["chi_embed"]["kernel"]
        assert float(jnp.abs(chi_g).sum()) > 0  # chi features used

        # without chi the param tree has no chi_embed (lazy setup)
        feats0 = featurize_for_model(sb)
        params0 = model.init(jax.random.PRNGKey(0), feats0)["params"]
        assert "chi_embed" not in params0


class TestTriangleUpdate:
    def test_forward_and_grads(self):
        import dataclasses

        import protstruc_tpu as ps
        from protstruc_tpu.models.trfold import (
            TrFold, TrFoldConfig, featurize_for_model, loss_fn)

        rng = np.random.RandomState(0)
        sb = ps.StructureBatch.from_xyz(
            rng.randn(2, 20, 15, 3).astype(np.float32) * 5.0
        )
        feats = featurize_for_model(sb)
        cfg = TrFoldConfig(node_dim=32, pair_dim=16, n_heads=2, n_blocks=1,
                           pair_update="triangle")
        model = TrFold(cfg)
        params = model.init(jax.random.PRNGKey(0), feats)["params"]
        assert "tri_out" in params["block_0"] and "tri_in" in params["block_0"]

        out = model.apply({"params": params}, feats)
        assert np.isfinite(np.asarray(out["distogram_logits"])).all()
        g = jax.grad(loss_fn)(params, model, feats)
        tri = g["block_0"]["tri_out"]
        assert any(float(jnp.abs(x).sum()) > 0
                   for x in jax.tree_util.tree_leaves(tri))

    def test_overfit_beats_or_matches_gated_mix(self):
        """Distogram overfit: triangle updates should learn at least as well
        as the gated-mix stand-in on the same budget."""
        import optax

        import protstruc_tpu as ps
        from protstruc_tpu.models.trfold import (
            TrFold, TrFoldConfig, featurize_for_model, loss_fn)

        sb = ps.StructureBatch.from_pdb("tests/data/15c8_HL.pdb")
        sel = np.zeros(sb.chain_idx.shape, bool)
        sel[:, :48] = True
        sb = sb.residue_masked_select(jnp.asarray(sel))
        feats = featurize_for_model(sb)

        def train(mechanism, steps=60):
            cfg = TrFoldConfig(node_dim=32, pair_dim=16, n_heads=2,
                               n_blocks=1, pair_update=mechanism)
            model = TrFold(cfg)
            params = model.init(jax.random.PRNGKey(0), feats)["params"]
            tx = optax.adam(2e-3)
            opt = tx.init(params)

            @jax.jit
            def step(p, o):
                l, g = jax.value_and_grad(loss_fn)(p, model, feats)
                u, o = tx.update(g, o, p)
                return optax.apply_updates(p, u), o, l

            for _ in range(steps):
                params, opt, l = step(params, opt)
            return float(l)

        l_tri = train("triangle")
        l_mix = train("gated_mix")
        assert np.isfinite(l_tri) and np.isfinite(l_mix)
        assert l_tri < l_mix * 1.25  # at least in the same league


def test_split_mix_dense_equals_concat_dense():
    """The pair-update 'mix' projection computes concat([row,col]) @ K as
    two block dots (a @ K[:C] + b @ K[C:]) so XLA never materializes the
    (B, L, L, 2P) concat — at D=512/P=256 that temp was 1 GB per block and
    OOM'd the dense backward (r4 MFU sweep).  Param tree and values must
    match nn.Dense on the concatenation exactly."""
    import jax
    import jax.numpy as jnp

    from protstruc_tpu.models.trfold import _SplitDense

    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(2, 4, 4, 6).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 4, 4, 10).astype(np.float32))
    m = _SplitDense(8)
    p = m.init(jax.random.PRNGKey(0), a, b)
    assert p["params"]["kernel"].shape == (16, 8)  # nn.Dense-compatible
    assert p["params"]["bias"].shape == (8,)
    got = m.apply(p, a, b)
    want = jnp.concatenate([a, b], -1) @ p["params"]["kernel"] + p["params"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
