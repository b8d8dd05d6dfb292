"""InverseFold model family tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import protstruc_tpu as ps
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


class TestAutoregressive:
    def _setup(self, L=24):
        rng = np.random.RandomState(3)
        xyz = rng.randn(2, L, 15, 3).astype(np.float32) * 4.0
        seq = [{"A": "ACDEFGHIKLMNPQRSTVWYACDE"[:L]}] * 2
        sb = ps.StructureBatch.from_xyz(
            xyz, chain_idx=np.zeros((2, L)), chain_ids=[["A"]] * 2, seq=seq
        )
        feats = featurize_backbone(sb)
        cfg = InverseFoldConfig(node_dim=32, pair_dim=16, n_heads=2,
                                n_blocks=1, n_decoder_blocks=1)
        model = InverseFold(cfg)
        from protstruc_tpu.models.inverse_fold import random_decode_order
        rank = random_decode_order(jax.random.PRNGKey(0), (2, L))
        f = dict(feats, prev_seq=feats["target_seq"], decode_rank=rank)
        params = model.init(jax.random.PRNGKey(1), f)["params"]
        return model, params, feats

    def test_causality(self):
        """Changing a later-ranked residue's identity cannot affect
        earlier-ranked positions' logits."""
        from protstruc_tpu.models.inverse_fold import random_decode_order

        model, params, feats = self._setup()
        B, L = feats["residue_mask"].shape
        rank = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))

        seq_a = feats["target_seq"]
        seq_b = seq_a.at[:, -1].set((seq_a[:, -1] + 3) % 20)  # last in order

        fa = dict(feats, prev_seq=seq_a, decode_rank=rank)
        fb = dict(feats, prev_seq=seq_b, decode_rank=rank)
        la = model.apply({"params": params}, fa)
        lb = model.apply({"params": params}, fb)
        # the last-in-order identity is visible to NO query (strict-<
        # causal mask, and own identity enters keys/values only), so all
        # logits — including its own row — must be identical
        np.testing.assert_allclose(la, lb, atol=1e-5)

        # changing a MIDDLE identity affects only strictly-later rows
        seq_c = seq_a.at[:, 10].set((seq_a[:, 10] + 5) % 20)
        lc = model.apply(
            {"params": params}, dict(feats, prev_seq=seq_c, decode_rank=rank)
        )
        np.testing.assert_allclose(la[:, : 10 + 1], lc[:, : 10 + 1], atol=1e-5)
        assert float(jnp.abs(la[:, 11:] - lc[:, 11:]).max()) > 1e-6

    def test_ar_loss_and_grads(self):
        from protstruc_tpu.models.inverse_fold import if_ar_loss

        model, params, feats = self._setup()
        val, g = jax.value_and_grad(
            lambda p: if_ar_loss(p, model, feats, jax.random.PRNGKey(2))
        )(params)
        assert np.isfinite(float(val))
        # decoder params receive gradient
        dec = g["dec_attn_0"]
        assert any(
            float(jnp.abs(x).sum()) > 0
            for x in jax.tree_util.tree_leaves(dec)
        )

    def test_ar_sampling_and_fixed_regions(self):
        from protstruc_tpu.models.inverse_fold import ar_sample_sequence

        model, params, feats = self._setup()
        B, L = feats["residue_mask"].shape
        seq = jax.jit(
            lambda p, k: ar_sample_sequence(p, model, feats, k)
        )(params, jax.random.PRNGKey(4))
        assert seq.shape == (B, L)
        assert int(seq.max()) < 21 and int(seq.min()) >= 0

        # fixed region is preserved exactly
        fixed = jnp.zeros((B, L), bool).at[:, :8].set(True)
        seq2 = ar_sample_sequence(params, model, feats, jax.random.PRNGKey(5),
                                  fixed_mask=fixed)
        np.testing.assert_array_equal(
            np.asarray(seq2[:, :8]), np.asarray(feats["target_seq"][:, :8])
        )

    def test_ar_overfit_recovery(self):
        """Teacher-forced AR training overfits a single structure."""
        import optax
        from protstruc_tpu.models.inverse_fold import if_ar_loss, sequence_recovery

        model, params, feats = self._setup()
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        @jax.jit
        def step(p, o, k):
            l, g = jax.value_and_grad(
                lambda q: if_ar_loss(q, model, feats, k)
            )(p)
            u, o = tx.update(g, o, p)
            return optax.apply_updates(p, u), o, l

        first = None
        for i in range(25):
            params, opt, l = step(params, opt, jax.random.PRNGKey(10 + i))
            if first is None:
                first = float(l)
        assert float(l) < first
        rec = float(sequence_recovery(params, model, feats))
        assert rec > 0.3  # well above the 1/20 chance level


def test_ar_sampling_never_emits_unk():
    """The designer's vocabulary is the 20 standard AAs; UNK (20) is the
    padding/teacher-context class and must never be sampled, even at high
    temperature from an untrained model."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import protstruc_tpu as ps
    from protstruc_tpu.models.inverse_fold import (
        InverseFold, InverseFoldConfig, ar_sample_sequence,
        featurize_backbone, random_decode_order)

    sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
    feats = featurize_backbone(sb)
    feats["target_seq"] = jnp.zeros(sb.chain_idx.shape, jnp.int32)
    cfg = InverseFoldConfig(node_dim=16, pair_dim=8, n_heads=2,
                            n_blocks=1, n_decoder_blocks=1)
    model = InverseFold(cfg)
    rank = random_decode_order(jax.random.PRNGKey(0),
                               feats["residue_mask"].shape)
    params = model.init(
        jax.random.PRNGKey(1),
        dict(feats, prev_seq=feats["target_seq"], decode_rank=rank))["params"]
    seq = ar_sample_sequence(params, model, feats, jax.random.PRNGKey(2),
                             temperature=5.0)
    m = np.asarray(sb.residue_mask)
    assert (np.asarray(seq)[m] < 20).all()
