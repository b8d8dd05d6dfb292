"""Orbax train-state checkpoint/resume tests."""

import jax
import numpy as np
import pytest

from protstruc_tpu.models.checkpoint import (
    latest_step,
    restore_train_state,
    save_train_state,
)
from protstruc_tpu.models.trfold import (
    TrFold,
    TrFoldConfig,
    featurize_for_model,
    make_train_state,
    train_step,
)


def _tiny_state():
    import __graft_entry__ as ge

    cfg = TrFoldConfig(node_dim=16, pair_dim=8, n_heads=2, n_blocks=1)
    model = TrFold(cfg)
    batch = ge._example_batch(B=1, L=12)
    feats = featurize_for_model(batch)
    params, opt_state, tx = make_train_state(model, feats, jax.random.PRNGKey(0))
    return model, feats, params, opt_state, tx


def test_checkpoint_roundtrip(tmp_path):
    model, feats, params, opt_state, tx = _tiny_state()
    ckpt = str(tmp_path / "ckpt")

    save_train_state(ckpt, 3, params, opt_state)
    assert latest_step(ckpt) == 3

    p2, o2, step = restore_train_state(ckpt, params_like=params, opt_state_like=opt_state)
    assert step == 3
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # training resumes from the restored state
    import functools

    jstep = jax.jit(functools.partial(train_step, model=model, tx=tx))
    _, _, loss = jstep(p2, o2, feats)
    assert np.isfinite(float(loss))


def test_restore_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        restore_train_state(str(tmp_path / "empty"))


def test_fold_model_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore for FoldModel (trunk + IPA) params + opt state."""
    import numpy as np
    import optax

    import protstruc_tpu as ps
    from protstruc_tpu.models.checkpoint import (
        latest_step, restore_train_state, save_train_state)
    from protstruc_tpu.models.ipa import FoldModel, IPAConfig
    from protstruc_tpu.models.trfold import TrFoldConfig, featurize_for_model

    rng = np.random.RandomState(0)
    sb = ps.StructureBatch.from_xyz(
        rng.randn(1, 16, 15, 3).astype(np.float32) * 5.0
    )
    feats = featurize_for_model(sb)
    model = FoldModel(
        trunk_cfg=TrFoldConfig(node_dim=32, pair_dim=16, n_heads=2, n_blocks=1),
        ipa_cfg=IPAConfig(node_dim=32, pair_dim=16, n_heads=2, scalar_dim=8,
                          n_iter=1),
    )
    params = model.init(jax.random.PRNGKey(0), feats)["params"]
    tx = optax.adamw(1e-3)
    opt = tx.init(params)

    d = str(tmp_path / "ckpt")
    save_train_state(d, 3, params, opt)
    assert latest_step(d) == 3
    params2, opt2, step = restore_train_state(
        d, params_like=params, opt_state_like=opt
    )
    assert step == 3

    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out = model.apply({"params": params2}, feats)
    assert np.isfinite(np.asarray(out["xyz"])).all()
