"""Params-EMA inside the optimizer state (train._params_ema)."""

import numpy as np
import pytest


def test_params_ema_closed_form():
    """chain(sgd(1.0), params_ema(0.5)) on a scalar: ema follows the
    exact recursion ema <- 0.5 ema + 0.5 p_new."""
    import jax.numpy as jnp
    import optax

    from protstruc_tpu.train import _params_ema, EmaParamsState

    tx = optax.chain(optax.sgd(1.0), _params_ema(0.5))
    p = {"w": jnp.asarray(1.0)}
    state = tx.init(p)
    g = {"w": jnp.asarray(1.0)}  # constant gradient

    # p: 1 -> 0 -> -1 ; ema: 1 -> 0.5 -> -0.25
    u, state = tx.update(g, state, p)
    p = optax.apply_updates(p, u)
    assert float(p["w"]) == 0.0
    assert float(state[1].ema["w"]) == 0.5
    u, state = tx.update(g, state, p)
    p = optax.apply_updates(p, u)
    assert float(p["w"]) == -1.0
    assert float(state[1].ema["w"]) == -0.25


def test_train_with_ema_and_load(tmp_path):
    """A checkpoint trained with ema_decay > 0 loads EMA weights by
    default; the raw last-step params differ and are reachable with
    use_ema=False."""
    import warnings

    import jax

    from protstruc_tpu.pdbio.writer import structure_batch_to_pdb
    from protstruc_tpu.train import TrainConfig, load_fold_model, train
    from protstruc_tpu import StructureBatch

    rng = np.random.RandomState(3)
    L = 24
    sb = StructureBatch.from_xyz(
        rng.randn(1, L, 15, 3).astype(np.float32) * 3.0,
        chain_idx=np.zeros((1, L)), chain_ids=[["A"]],
        seq=[{"A": ("ACDEFGHIKLMNPQRSTVWY" * 2)[:L]}])
    p = str(tmp_path / "s.pdb")
    structure_batch_to_pdb(sb, p)

    cfg = TrainConfig(steps=3, batch_size=1, ema_decay=0.9, node_dim=16,
                      pair_dim=8, n_heads=2, n_blocks=1, n_ipa_iter=2,
                      n_recycle=1, save_every=0, shuffle=False)
    m = train([p], str(tmp_path / "ck"), cfg, log_fn=lambda *a: None)
    assert np.isfinite(m["final_loss"])

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _, ema_params, _ = load_fold_model(str(tmp_path / "ck"))
        _, raw_params, _ = load_fold_model(str(tmp_path / "ck"),
                                           use_ema=False)
    ema_leaves = jax.tree_util.tree_leaves(ema_params)
    raw_leaves = jax.tree_util.tree_leaves(raw_params)
    assert all(np.isfinite(np.asarray(x)).all() for x in ema_leaves)
    # after 3 updates from a shared init the EMA lags the raw params
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(ema_leaves, raw_leaves)]
    assert max(diffs) > 0.0
