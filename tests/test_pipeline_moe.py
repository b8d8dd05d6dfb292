"""Pipeline (pp) and mixture-of-experts (ep) parallelism tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from protstruc_tpu.models.moe import MoEMLP, moe_param_shardings
from protstruc_tpu.parallel.pipeline import pipeline_forward, stack_stage_params


def _pp_mesh(s):
    return Mesh(np.asarray(jax.devices()[:s]), ("pp",))


def _stage_fn(params, x):
    return jnp.tanh(x @ params["w"] + params["b"])


def _make_stage_params(key, s, d):
    keys = jax.random.split(key, s)
    return [
        {"w": jax.random.normal(k, (d, d)) * 0.3, "b": jnp.zeros(d)} for k in keys
    ]


@pytest.mark.parametrize("S,M", [(2, 4), (4, 8)])
def test_pipeline_matches_sequential(S, M):
    d, mb = 16, 8
    params = _make_stage_params(jax.random.PRNGKey(0), S, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, mb, d))

    mesh = _pp_mesh(S)
    out = pipeline_forward(_stage_fn, stack_stage_params(params), x, mesh)

    # sequential reference
    ref = x
    for p in params:
        ref = jax.vmap(lambda xx: _stage_fn(p, xx))(ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_is_differentiable():
    S, M, d, mb = 2, 4, 8, 4
    params = stack_stage_params(_make_stage_params(jax.random.PRNGKey(2), S, d))
    x = jax.random.normal(jax.random.PRNGKey(3), (M, mb, d))
    mesh = _pp_mesh(S)

    def loss(p):
        return jnp.sum(pipeline_forward(_stage_fn, p, x, mesh) ** 2)

    g = jax.grad(loss)(params)
    assert g["w"].shape == (S, d, d)
    assert np.isfinite(np.asarray(g["w"])).all()
    assert float(jnp.abs(g["w"]).sum()) > 0


def test_pipelined_trfold_blocks():
    """TrFold blocks as pipeline stages (pytree activations: node + pair)."""
    from protstruc_tpu.models.trfold import TrFoldBlock, TrFoldConfig

    S, M, mb, L = 2, 4, 2, 12
    cfg = TrFoldConfig(node_dim=16, pair_dim=8, n_heads=2)
    block = TrFoldBlock(cfg)
    mask = jnp.ones((mb, L), bool)

    keys = jax.random.split(jax.random.PRNGKey(0), S)
    node0 = jax.random.normal(jax.random.PRNGKey(1), (mb, L, 16))
    pair0 = jax.random.normal(jax.random.PRNGKey(2), (mb, L, L, 8))
    stage_params = stack_stage_params(
        [block.init(k, node0, pair0, mask)["params"] for k in keys]
    )

    def stage_fn(p, act):
        node, pair, _aux = block.apply({"params": p}, act["node"], act["pair"], mask)
        return {"node": node, "pair": pair}

    x = {
        "node": jax.random.normal(jax.random.PRNGKey(3), (M, mb, L, 16)),
        "pair": jax.random.normal(jax.random.PRNGKey(4), (M, mb, L, L, 8)),
    }
    mesh = _pp_mesh(S)
    out = pipeline_forward(stage_fn, stage_params, x, mesh)

    # sequential reference
    ref = x
    for s in range(S):
        p = jax.tree_util.tree_map(lambda v: v[s], stage_params)
        ref = jax.vmap(lambda a: stage_fn(p, a))(ref)
    np.testing.assert_allclose(
        np.asarray(out["node"]), np.asarray(ref["node"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["pair"]), np.asarray(ref["pair"]), atol=1e-4
    )


def test_pipeline_apply_matches_plain_forward():
    """The full-model pipeline path (embed -> pp block stages -> heads) is
    numerically identical to TrFold.apply."""
    import protstruc_tpu as ps
    from protstruc_tpu.models.trfold import (
        TrFold, TrFoldConfig, featurize_for_model, pipeline_apply)

    S = 4
    cfg = TrFoldConfig(node_dim=16, pair_dim=8, n_heads=2, n_blocks=S)
    model = TrFold(cfg)

    rng = np.random.RandomState(0)
    xyz = rng.randn(4, 16, 15, 3).astype(np.float32) * 5.0
    sb = ps.StructureBatch.from_xyz(xyz)
    feats = featurize_for_model(sb)
    params = model.init(jax.random.PRNGKey(0), feats)["params"]

    ref = model.apply({"params": params}, feats)
    out = pipeline_apply(params, model, feats, _pp_mesh(S))

    for k in ref:
        if k == "moe_aux_loss":
            continue
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), atol=2e-4, err_msg=k
        )

    # trains: gradient through the whole pipelined schedule is finite
    def loss(p):
        o = pipeline_apply(p, model, feats, _pp_mesh(S))
        return jnp.sum(o["distogram_logits"] ** 2) / 1e3

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_pipeline_apply_validates_config():
    import protstruc_tpu as ps
    from protstruc_tpu.models.trfold import (
        TrFold, TrFoldConfig, featurize_for_model, pipeline_apply)

    cfg = TrFoldConfig(node_dim=16, pair_dim=8, n_heads=2, n_blocks=3)
    model = TrFold(cfg)
    xyz = np.random.RandomState(0).randn(2, 8, 15, 3).astype(np.float32)
    feats = featurize_for_model(ps.StructureBatch.from_xyz(xyz))
    params = model.init(jax.random.PRNGKey(0), feats)["params"]
    with pytest.raises(ValueError, match="n_blocks"):
        pipeline_apply(params, model, feats, _pp_mesh(2))


def test_moe_forward_and_balance():
    B, L, D = 2, 32, 16
    model = MoEMLP(n_experts=4, hidden_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, D))
    mask = jnp.ones((B, L), bool)
    params = model.init(jax.random.PRNGKey(1), x, mask)["params"]
    out, aux = model.apply({"params": params}, x, mask)
    assert out.shape == (B, L, D)
    assert np.isfinite(np.asarray(out)).all()
    assert float(aux) > 0  # balance loss defined


def test_moe_masked_tokens_produce_zero():
    B, L, D = 1, 16, 8
    model = MoEMLP(n_experts=2, hidden_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, L, D))
    mask = jnp.zeros((B, L), bool).at[:, :8].set(True)
    params = model.init(jax.random.PRNGKey(3), x, mask)["params"]
    out, _ = model.apply({"params": params}, x, mask)
    np.testing.assert_allclose(np.asarray(out[:, 8:]), 0.0, atol=1e-6)


def test_trfold_with_moe_blocks():
    """TrFold(moe_experts>0) trains end to end with the aux balance loss."""
    import functools

    import __graft_entry__ as ge
    from protstruc_tpu.models.trfold import (
        TrFold, TrFoldConfig, featurize_for_model, make_train_state, train_step)

    cfg = TrFoldConfig(node_dim=32, pair_dim=16, n_heads=2, n_blocks=2,
                       moe_experts=4)
    model = TrFold(cfg)
    feats = featurize_for_model(ge._example_batch(B=2, L=16))
    out = model.apply(
        {"params": model.init(jax.random.PRNGKey(0), feats)["params"]}, feats
    )
    assert float(out["moe_aux_loss"]) > 0

    params, opt_state, tx = make_train_state(model, feats, jax.random.PRNGKey(0), 3e-3)
    jstep = jax.jit(functools.partial(train_step, model=model, tx=tx))
    losses = []
    for _ in range(6):
        params, opt_state, loss = jstep(params, opt_state, feats)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    # expert params exist and are shaped (E, ...)
    assert params["block_0"]["moe"]["w1"].shape[0] == 4


def test_moe_expert_sharding():
    from protstruc_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)  # dp=2, sp=2, tp=2
    model = MoEMLP(n_experts=4, hidden_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 8))
    mask = jnp.ones((2, 16), bool)
    params = model.init(jax.random.PRNGKey(5), x, mask)["params"]

    shardings = moe_param_shardings(params, mesh, ep_axis="dp")
    params = jax.device_put(params, shardings)
    assert len(params["w1"].sharding.device_set) >= 2  # experts split over ep

    out, aux = jax.jit(lambda p, x, m: model.apply({"params": p}, x, m))(
        params, x, mask
    )
    ref, _ = model.apply({"params": jax.device_get(params)}, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
