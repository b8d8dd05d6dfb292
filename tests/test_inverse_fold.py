"""InverseFold model family tests."""

import functools

import jax
import numpy as np
import pytest

from protstruc_tpu import StructureBatch
from protstruc_tpu.models.inverse_fold import (
    InverseFold,
    InverseFoldConfig,
    featurize_backbone,
    if_train_step,
    make_if_train_state,
    sequence_recovery,
)

from tests.conftest import pdb_path


@pytest.fixture(scope="module")
def setup():
    sb = StructureBatch.from_pdb(pdb_path("1REX.pdb"))
    feats = featurize_backbone(sb)
    cfg = InverseFoldConfig(node_dim=48, pair_dim=16, n_heads=2, n_blocks=2)
    model = InverseFold(cfg)
    params, opt_state, tx = make_if_train_state(
        model, feats, jax.random.PRNGKey(0), 2e-3
    )
    return sb, feats, model, params, opt_state, tx


def test_forward_shapes(setup):
    sb, feats, model, params, *_ = setup
    logits = model.apply({"params": params}, feats)
    assert logits.shape == (1, 130, 21)
    assert np.isfinite(np.asarray(logits)).all()


def test_features_exclude_sequence(setup):
    _, feats, *_ = setup
    # nothing except the target carries residue identity
    assert set(feats) == {
        "torsions", "torsion_mask", "d_ca", "d_mask", "frames",
        "residue_mask", "target_seq",
    }


def test_sample_sequence(setup):
    from protstruc_tpu.models.inverse_fold import sample_sequence

    sb, feats, model, params, *_ = setup
    s1 = sample_sequence(params, model, feats, jax.random.PRNGKey(0), 1.0)
    s2 = sample_sequence(params, model, feats, jax.random.PRNGKey(1), 1.0)
    assert s1.shape == (1, 130)
    assert (np.asarray(s1) <= 20).all() and (np.asarray(s1) >= 0).all()
    assert (np.asarray(s1) != np.asarray(s2)).any()  # stochastic
    # near-zero temperature == argmax
    cold_a = sample_sequence(params, model, feats, jax.random.PRNGKey(2), 1e-4)
    cold_b = sample_sequence(params, model, feats, jax.random.PRNGKey(3), 1e-4)
    np.testing.assert_array_equal(np.asarray(cold_a), np.asarray(cold_b))


def test_overfit_single_structure_recovers_sequence(setup):
    """Training on one structure must push sequence recovery far above the
    5% random / ~10% majority-class baselines."""
    sb, feats, model, params, opt_state, tx = setup
    jstep = jax.jit(functools.partial(if_train_step, model=model, tx=tx))

    rec0 = float(sequence_recovery(params, model, feats))
    losses = []
    for _ in range(60):
        params, opt_state, loss = jstep(params, opt_state, feats)
        losses.append(float(loss))
    rec1 = float(sequence_recovery(params, model, feats))

    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert rec1 > 0.5, (rec0, rec1)
    assert np.isfinite(losses).all()
