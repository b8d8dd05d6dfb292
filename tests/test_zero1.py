"""ZeRO-1 optimizer-state sharding (parallel/zero.py) on the 8-device
virtual CPU mesh (conftest).

The reference has no distributed runtime (SURVEY.md §5) — this is
TPU-native new design: Adam moments partitioned over dp, params
replicated, tp axes preserved.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from protstruc_tpu.parallel.mesh import make_mesh
from protstruc_tpu.parallel.zero import (
    shard_opt_state_zero1,
    zero1_opt_shardings,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)  # dp=2 sp=2 tp=2


def _placed_params(mesh):
    params = {"w": jnp.ones((8, 16)), "b": jnp.zeros((16,)),
              "s": jnp.ones(())}
    p_shard = {
        "w": NamedSharding(mesh, P(None, "tp")),  # heads over tp
        "b": NamedSharding(mesh, P()),
        "s": NamedSharding(mesh, P()),
    }
    return jax.device_put(params, p_shard), p_shard


def test_moments_partitioned_over_dp(mesh):
    params, p_shard = _placed_params(mesh)
    tx = optax.adamw(1e-2)
    opt = jax.jit(tx.init)(params)
    opt_z, sh = shard_opt_state_zero1(opt, mesh, param_shardings=p_shard)

    mu = opt_z[0].mu
    # w: tp kept on axis 1, dp on the free axis 0 -> local shard is 1/4
    assert mu["w"].sharding.spec == P("dp", "tp")
    assert mu["w"].addressable_shards[0].data.shape == (4, 8)
    # b: only axis sharded over dp
    assert mu["b"].sharding.spec == P("dp")
    # scalars (and the step counter) stay replicated
    assert mu["s"].sharding.spec == P()
    assert opt_z[0].count.sharding.spec == P()


def test_step_parity_vs_replicated(mesh):
    """dp-partitioned moments give bit-comparable params to replicated."""
    params, p_shard = _placed_params(mesh)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-2))

    def loss(p):
        return jnp.sum((p["w"] @ p["b"]) ** 2) + p["s"] ** 2

    def run(opt_state, pin=None):
        p = params

        def step(p, o):
            g = jax.grad(loss)(p)
            u, o = tx.update(g, o, p)
            if pin is not None:
                o = jax.lax.with_sharding_constraint(o, pin)
            return optax.apply_updates(p, u), o

        jstep = jax.jit(step)
        for _ in range(4):
            p, opt_state = jstep(p, opt_state)
        return p, opt_state

    p_ref, _ = run(jax.jit(tx.init)(params))
    opt_z, sh = shard_opt_state_zero1(jax.jit(tx.init)(params), mesh,
                                      param_shardings=p_shard)
    p_z, o_z = run(opt_z, pin=sh)
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_ref[k]),
                                   np.asarray(p_z[k]), atol=1e-7)
    # the constraint held the partitioning through the jitted step
    post_specs = [x.sharding.spec for x in jax.tree_util.tree_leaves(o_z)
                  if getattr(x, "shape", None) == (8, 16)]
    assert post_specs and all(s == P("dp", "tp") for s in post_specs)


def test_no_divisible_axis_stays_replicated(mesh):
    params = {"odd": jnp.ones((3, 5))}  # nothing divides dp=2
    p_shard = {"odd": NamedSharding(mesh, P())}
    tx = optax.adam(1e-2)
    sh = zero1_opt_shardings(tx.init(params), mesh, param_shardings=p_shard)
    assert not any(e is not None for e in sh[0].mu["odd"].spec)


def test_without_param_shardings_all_axes_free(mesh):
    tx = optax.adam(1e-2)
    opt = tx.init({"w": jnp.ones((8, 16))})
    sh = zero1_opt_shardings(opt, mesh)
    # largest divisible axis (16) takes dp
    assert sh[0].mu["w"].spec == P(None, "dp")


def test_single_leaf_param_shardings_rejected(mesh):
    tx = optax.adam(1e-2)
    opt = tx.init({"w": jnp.ones((8,))})
    with pytest.raises(ValueError):
        zero1_opt_shardings(opt, mesh,
                            param_shardings=NamedSharding(mesh, P()))


def test_train_config_zero1_roundtrip():
    from protstruc_tpu.train import TrainConfig

    cfg = TrainConfig(zero1=True, mesh_shape=(2, 2, 2))
    assert TrainConfig.from_json(cfg.to_json()).zero1 is True


def test_zero1_without_mesh_rejected(tmp_path):
    from protstruc_tpu.train import TrainConfig, train

    with pytest.raises(ValueError, match="mesh_shape"):
        train(["x.pdb"], str(tmp_path / "ck"),
              TrainConfig(zero1=True, mesh_shape=None))
