"""Gradient accumulation (TrainConfig.accum_steps, optax.MultiSteps)."""

import numpy as np
import pytest


def test_accum_matches_big_batch(tmp_path):
    """k microbatches with accum_steps=k apply the same update as one
    batch of k-times the size: final params must match (same data order,
    shuffle off, no crop so featurization is deterministic)."""
    import jax.numpy as jnp

    from protstruc_tpu.pdbio.writer import structure_batch_to_pdb
    from protstruc_tpu.train import TrainConfig, train, load_fold_model
    from protstruc_tpu import StructureBatch

    rng = np.random.RandomState(0)
    paths = []
    L = 24
    for i in range(2):
        xyz = rng.randn(1, L, 15, 3).astype(np.float32) * 3.0
        sb = StructureBatch.from_xyz(
            xyz, chain_idx=np.zeros((1, L)), chain_ids=[["A"]],
            seq=[{"A": ("ACDEFGHIKLMNPQRSTVWY" * 2)[:L]}])
        p = str(tmp_path / f"s{i}.pdb")
        structure_batch_to_pdb(sb, p)
        paths.append(p)

    common = dict(node_dim=16, pair_dim=8, n_heads=2, n_blocks=1,
                  n_ipa_iter=2, n_recycle=1, save_every=0, shuffle=False,
                  seed=0)
    # 2 microbatches of 1 with accumulation == 1 batch of 2
    cfg_a = TrainConfig(steps=2, batch_size=1, accum_steps=2, **common)
    cfg_b = TrainConfig(steps=1, batch_size=2, **common)
    train(paths, str(tmp_path / "a"), cfg_a, log_fn=lambda *x: None)
    train(paths, str(tmp_path / "b"), cfg_b, log_fn=lambda *x: None)

    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _, pa, _ = load_fold_model(str(tmp_path / "a"))
        _, pb, _ = load_fold_model(str(tmp_path / "b"))
    import jax
    for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(pa),
            jax.tree_util.tree_leaves_with_path(pb)):
        # f32 reduction-order noise through Adam's normalization on
        # tiny-gradient elements is ~1e-5; a semantic mismatch (sum vs
        # mean accumulation, wrong step count) would show at the update
        # scale lr=3e-4
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   atol=5e-5, err_msg=str(ka))


def test_accum_composes_with_mesh_and_zero1(tmp_path):
    """MultiSteps state (acc_grads + wrapped moments) passes through the
    ZeRO-1 subtree detection and a sharded accumulate/apply cycle runs."""
    import jax.numpy as jnp

    from protstruc_tpu.pdbio.writer import structure_batch_to_pdb
    from protstruc_tpu.train import TrainConfig, train
    from protstruc_tpu import StructureBatch

    rng = np.random.RandomState(1)
    L = 24
    sb = StructureBatch.from_xyz(
        rng.randn(1, L, 15, 3).astype(np.float32) * 3.0,
        chain_idx=np.zeros((1, L)), chain_ids=[["A"]],
        seq=[{"A": ("ACDEFGHIKLMNPQRSTVWY" * 2)[:L]}])
    p = str(tmp_path / "s.pdb")
    structure_batch_to_pdb(sb, p)

    cfg = TrainConfig(steps=2, batch_size=2, accum_steps=2, node_dim=16,
                      pair_dim=8, n_heads=2, n_blocks=1, n_ipa_iter=2,
                      n_recycle=1, save_every=0, shuffle=False,
                      mesh_shape=(2, 2, 2), zero1=True)
    m = train([p, p], str(tmp_path / "ck"), cfg, log_fn=lambda *a: None)
    assert np.isfinite(m["final_loss"])


def test_warmup_cosine_schedule(tmp_path):
    """warmup_cosine trains end-to-end and the schedule is indexed by
    optimizer steps (count advances once per accum cycle)."""
    from protstruc_tpu.pdbio.writer import structure_batch_to_pdb
    from protstruc_tpu.train import TrainConfig, train
    from protstruc_tpu import StructureBatch

    rng = np.random.RandomState(2)
    L = 24
    sb = StructureBatch.from_xyz(
        rng.randn(1, L, 15, 3).astype(np.float32) * 3.0,
        chain_idx=np.zeros((1, L)), chain_ids=[["A"]],
        seq=[{"A": ("ACDEFGHIKLMNPQRSTVWY" * 2)[:L]}])
    p = str(tmp_path / "s.pdb")
    structure_batch_to_pdb(sb, p)

    cfg = TrainConfig(steps=4, batch_size=1, accum_steps=2,
                      lr_schedule="warmup_cosine", warmup_steps=1,
                      node_dim=16, pair_dim=8, n_heads=2, n_blocks=1,
                      n_ipa_iter=2, n_recycle=1, save_every=0, shuffle=False)
    m = train([p], str(tmp_path / "ck"), cfg, log_fn=lambda *a: None)
    assert np.isfinite(m["final_loss"])

    with pytest.raises(ValueError, match="lr_schedule"):
        train([p], str(tmp_path / "ck2"),
              TrainConfig(lr_schedule="nope"), log_fn=lambda *a: None)
