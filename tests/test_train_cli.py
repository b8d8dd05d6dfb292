"""Production training-loop surface: train -> checkpoint -> resume -> fold."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_pdb(tmp_path_factory):
    """A 40-residue fragment of 1REX so the loop runs in seconds on CPU."""
    import jax.numpy as jnp

    import protstruc_tpu as ps
    from protstruc_tpu.pdbio.writer import structure_batch_to_pdb

    sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
    sel = np.zeros(sb.chain_idx.shape, bool)
    sel[:, :40] = True
    frag = sb.residue_masked_select(jnp.asarray(sel))
    path = tmp_path_factory.mktemp("data") / "frag.pdb"
    structure_batch_to_pdb(frag, str(path))
    return str(path)


def test_train_checkpoint_resume_fold(small_pdb, tmp_path):
    from protstruc_tpu.train import TrainConfig, fold_sequence, train

    ck = str(tmp_path / "ck")
    cfg = TrainConfig(steps=3, batch_size=1, node_dim=16, pair_dim=8,
                      n_heads=2, n_blocks=1, n_ipa_iter=2, n_recycle=0,
                      save_every=0, shuffle=False)
    logs = []
    m = train([small_pdb], ck, cfg, log_fn=lambda *a: logs.append(" ".join(map(str, a))))
    assert m["steps"] == 3 and np.isfinite(m["final_loss"])
    assert os.path.exists(os.path.join(ck, "config.json"))

    # steps is the TOTAL target: rerunning the completed command is a
    # no-op (crash-recovery semantics), extending needs a larger steps
    m2 = train([small_pdb], ck, cfg, log_fn=lambda *a: logs.append(" ".join(map(str, a))))
    assert m2["steps"] == 3 and m2["final_loss"] is None
    assert any("already at step 3" in l for l in logs)

    import dataclasses

    m3 = train([small_pdb], ck, dataclasses.replace(cfg, steps=6),
               log_fn=lambda *a: logs.append(" ".join(map(str, a))))
    assert m3["steps"] == 6
    assert any("resumed from step 3" in l for l in logs)

    # fold from the checkpoint: valid coordinates, right shapes
    coords = np.asarray(fold_sequence(ck, "ACDEFGHIKLMNPQRSTVWY"))
    assert coords.shape == (20, 5, 3)
    assert np.isfinite(coords).all()
    # carbonyl O is at the ideal bond length from C
    d_co = np.linalg.norm(coords[:, 3] - coords[:, 2], axis=-1)
    np.testing.assert_allclose(d_co, 1.231, atol=1e-4)


def test_resume_with_mismatched_config_errors(small_pdb, tmp_path):
    """Resuming into a checkpoint dir with different model shapes must fail
    loudly instead of silently overwriting config.json (ADVICE r3)."""
    from protstruc_tpu.train import TrainConfig, train

    ck = str(tmp_path / "ck_mismatch")
    cfg = TrainConfig(steps=2, batch_size=1, node_dim=16, pair_dim=8,
                      n_heads=2, n_blocks=1, n_ipa_iter=2, n_recycle=0,
                      save_every=0, shuffle=False)
    train([small_pdb], ck, cfg, log_fn=lambda *a: None)

    import dataclasses

    bigger = dataclasses.replace(cfg, node_dim=32)
    with pytest.raises(ValueError, match="node_dim"):
        train([small_pdb], ck, bigger, log_fn=lambda *a: None)
    # the on-disk config still describes the checkpoint's params
    cfg_on_disk = json.load(open(os.path.join(ck, "config.json")))
    assert cfg_on_disk["node_dim"] == 16
    # changing only non-shape fields (steps, lr) resumes fine; steps is
    # the TOTAL target so 3 trains one more step on the step-2 checkpoint
    more_steps = dataclasses.replace(cfg, steps=3, learning_rate=1e-4)
    m = train([small_pdb], ck, more_steps, log_fn=lambda *a: None)
    assert m["steps"] == 3


def test_fold_from_structure_conditioned_checkpoint_warns(small_pdb, tmp_path):
    """fold from a sequence_only=False checkpoint is out-of-distribution;
    load_fold_model must say so (ADVICE r3, medium)."""
    import warnings

    from protstruc_tpu.train import TrainConfig, load_fold_model, train

    ck = str(tmp_path / "ck_warn")
    cfg = TrainConfig(steps=2, batch_size=1, node_dim=16, pair_dim=8,
                      n_heads=2, n_blocks=1, n_ipa_iter=2, n_recycle=0,
                      save_every=0, shuffle=False)
    train([small_pdb], ck, cfg, log_fn=lambda *a: None)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        load_fold_model(ck)
    assert any("structure-conditioned" in str(w.message) for w in rec)


def test_train_cli_and_fold_cli(small_pdb, tmp_path, capsys):
    from protstruc_tpu.__main__ import main as cli_main

    ck = str(tmp_path / "ck2")
    rc = cli_main(["train", small_pdb, "--checkpoint-dir", ck,
                   "--steps", "2", "--node-dim", "16", "--pair-dim", "8",
                   "--blocks", "1", "--recycle", "0", "--save-every", "0"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["steps"] == 2

    out = str(tmp_path / "fold.pdb")
    rc = cli_main(["fold", "--checkpoint-dir", ck, "--seq", "ACDEFG",
                   "--out", out])
    assert rc == 0
    text = open(out).read()
    assert text.count("ATOM") >= 6 * 4  # >= N/CA/C/O per residue


def test_train_on_device_mesh(small_pdb, tmp_path):
    """Mesh-parallel training: dp/sp/tp sharded step on the 8-device CPU
    mesh (conftest); loss finite, checkpoint written, fold still works."""
    import jax

    from protstruc_tpu.train import TrainConfig, fold_sequence, train

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device virtual mesh")

    ck = str(tmp_path / "ck_mesh")
    cfg = TrainConfig(steps=2, batch_size=2, node_dim=16, pair_dim=8,
                      n_heads=2, n_blocks=1, n_ipa_iter=2, n_recycle=0,
                      save_every=0, shuffle=False, mesh_shape=(2, 2, 2))
    # batch of 2 structures so B divides dp
    m = train([small_pdb, small_pdb], ck, cfg, log_fn=lambda *a: None)
    assert np.isfinite(m["final_loss"])

    coords = np.asarray(fold_sequence(ck, "ACDEFGHIKL"))
    assert coords.shape == (10, 5, 3) and np.isfinite(coords).all()


def test_metrics_jsonl_written(small_pdb, tmp_path):
    import json as _json

    from protstruc_tpu.train import TrainConfig, train

    ck = str(tmp_path / "ck_metrics")
    cfg = TrainConfig(steps=3, batch_size=1, node_dim=16, pair_dim=8,
                      n_heads=2, n_blocks=1, n_ipa_iter=2, n_recycle=0,
                      save_every=0, shuffle=False)
    train([small_pdb], ck, cfg, log_fn=lambda *a: None)
    lines = open(os.path.join(ck, "metrics.jsonl")).read().strip().splitlines()
    assert len(lines) >= 3
    rec = _json.loads(lines[-1])
    assert {"step", "loss", "ms", "t"} <= set(rec)
    assert np.isfinite(rec["loss"]) and rec["ms"] > 0


def test_crop_eval_and_multichain_fold(small_pdb, tmp_path):
    """crop_len training + held-out eval + multi-chain fold round trip."""
    from protstruc_tpu.train import TrainConfig, fold_sequence, train

    ck = str(tmp_path / "ck_crop")
    cfg = TrainConfig(steps=3, batch_size=1, node_dim=16, pair_dim=8,
                      n_heads=2, n_blocks=1, n_ipa_iter=2, n_recycle=0,
                      save_every=2, shuffle=False, crop_len=24)
    m = train([small_pdb], ck, cfg, log_fn=lambda *a: None,
              eval_paths=[small_pdb])
    assert np.isfinite(m["final_loss"])
    assert "eval_ca_lddt" in m and 0.0 <= m["eval_ca_lddt"] <= 1.0
    assert np.isfinite(m["eval_ca_rmsd"])

    coords, plddt, pae = fold_sequence(ck, "ACDEF:GHIKL",
                                       return_confidence=True)
    assert coords.shape == (10, 5, 3)
    assert plddt.shape == (10,) and pae.shape == (10, 10)
    assert np.isfinite(np.asarray(coords)).all()


def test_fold_cli_multichain_pdb(small_pdb, tmp_path, capsys):
    from protstruc_tpu.__main__ import main as cli_main

    ck = str(tmp_path / "ck_mc")
    rc = cli_main(["train", small_pdb, "--checkpoint-dir", ck,
                   "--steps", "2", "--node-dim", "16", "--pair-dim", "8",
                   "--blocks", "1", "--recycle", "0", "--save-every", "0"])
    assert rc == 0
    capsys.readouterr()
    out = str(tmp_path / "complex.pdb")
    rc = cli_main(["fold", "--checkpoint-dir", ck, "--seq", "ACD:EFG",
                   "--out", out])
    assert rc == 0
    text = open(out).read()
    # both chains present in the written PDB
    assert " A   1 " in text.replace("  ", " ") or " A " in text
    chain_col = {l[21] for l in text.splitlines() if l.startswith("ATOM")}
    assert chain_col == {"A", "B"}


def test_train_triangle_remat_production_loop(small_pdb, tmp_path):
    """pair_update="triangle" + remat through the full production loop:
    train -> checkpoint -> fold, and the config gate treats pair_update as
    a shape field (triangle adds params; resuming across it must error)."""
    import dataclasses

    from protstruc_tpu.train import TrainConfig, fold_sequence, train

    ck = str(tmp_path / "ck_tri")
    cfg = TrainConfig(steps=2, batch_size=1, node_dim=16, pair_dim=8,
                      n_heads=2, n_blocks=1, n_ipa_iter=2, n_recycle=0,
                      save_every=0, shuffle=False,
                      pair_update="triangle", remat=True,
                      remat_policy="tri_dots")
    m = train([small_pdb], ck, cfg, log_fn=lambda *a: None)
    assert np.isfinite(m["final_loss"])
    cfg_on_disk = json.load(open(os.path.join(ck, "config.json")))
    assert cfg_on_disk["pair_update"] == "triangle"

    coords = np.asarray(fold_sequence(ck, "ACDEFGH"))
    assert coords.shape == (7, 5, 3) and np.isfinite(coords).all()

    with pytest.raises(ValueError, match="pair_update"):
        train([small_pdb], ck,
              dataclasses.replace(cfg, pair_update="gated_mix"),
              log_fn=lambda *a: None)


def test_best_eval_step_and_load(small_pdb, tmp_path):
    """step='best' loads the checkpoint with the best recorded held-out
    eval (eval curves routinely peak before the final step)."""
    import warnings

    import jax

    from protstruc_tpu.models.checkpoint import restore_train_state
    from protstruc_tpu.train import (
        TrainConfig, best_eval_step, load_fold_model, train)

    ck = str(tmp_path / "ck_best")
    cfg = TrainConfig(steps=3, batch_size=1, node_dim=16, pair_dim=8,
                      n_heads=2, n_blocks=1, n_ipa_iter=2, n_recycle=0,
                      save_every=1, shuffle=False)
    train([small_pdb], ck, cfg, log_fn=lambda *a: None)

    # fabricate the eval curve: best at step 2; step 999 has no
    # checkpoint and must be ignored even though its metric is higher
    with open(os.path.join(ck, "metrics.jsonl"), "w") as fh:
        for step, v in [(1, 0.2), (2, 0.9), (3, 0.5), (999, 1.0)]:
            fh.write(json.dumps({"step": step, "eval_ca_lddt": v}) + "\n")
        fh.write(json.dumps({"step": 2, "loss": 1.0}) + "\n")  # no metric
        fh.write("not json\n")                                  # tolerated
    assert best_eval_step(ck) == 2
    # rmsd metrics select the minimum
    with open(os.path.join(ck, "metrics.jsonl"), "a") as fh:
        for step, v in [(1, 5.0), (2, 9.0), (3, 7.0)]:
            fh.write(json.dumps({"step": step, "eval_ca_rmsd": v}) + "\n")
    assert best_eval_step(ck, metric="eval_ca_rmsd") == 1

    model, params, _ = load_fold_model(ck, step="best")
    want, _, _ = restore_train_state(ck, step=2)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # explicit int step
    _, params1, _ = load_fold_model(ck, step=1)
    want1, _, _ = restore_train_state(ck, step=1)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(params1)[0]),
        np.asarray(jax.tree_util.tree_leaves(want1)[0]))

    # no eval rows matching a saved checkpoint -> warn + fall back to latest
    os.remove(os.path.join(ck, "metrics.jsonl"))
    assert best_eval_step(ck) is None
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _, params_fb, _ = load_fold_model(ck, step="best")
    assert any("best" in str(x.message) for x in w)
    want3, _, _ = restore_train_state(ck, step=3)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(params_fb)[0]),
        np.asarray(jax.tree_util.tree_leaves(want3)[0]))


def test_final_offcadence_eval_row_persisted(small_pdb, tmp_path):
    """steps off the save_every cadence: the final checkpoint's eval must
    still land in metrics.jsonl so step='best' can select it."""
    from protstruc_tpu.train import TrainConfig, best_eval_step, train

    ck = str(tmp_path / "ck_final_eval")
    cfg = TrainConfig(steps=3, batch_size=1, node_dim=16, pair_dim=8,
                      n_heads=2, n_blocks=1, n_ipa_iter=2, n_recycle=0,
                      save_every=2, shuffle=False)
    train([small_pdb], ck, cfg, eval_paths=[small_pdb],
          log_fn=lambda *a: None)
    rows = [json.loads(l) for l in open(os.path.join(ck, "metrics.jsonl"))]
    eval_steps = {r["step"] for r in rows if "eval_ca_lddt" in r}
    assert {2, 3} <= eval_steps
    assert best_eval_step(ck) in (2, 3)


def test_mesh_flash_attn_train(small_pdb, tmp_path):
    """Flash attention under a dp/tp mesh: the custom_partitioning rules
    shard the kernel over batch + heads; under sp>1 the trunk switches to
    ring flash attention (ops/ring_attn.py) instead of rejecting."""
    import jax
    import pytest

    from protstruc_tpu.train import TrainConfig, train

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")

    base = dict(steps=2, batch_size=4, node_dim=16, pair_dim=8,
                n_heads=2, n_blocks=1, n_ipa_iter=2, n_recycle=0,
                save_every=0, shuffle=False, use_flash_attn=True)

    logs = []
    # eval_paths exercises the ragged/partial-batch eval under ring: the
    # B=1 held-out batch cannot satisfy the ring shard_map's B % dp == 0,
    # so eval_batch_metrics must strip ring_mesh (single-device flash)
    m = train([small_pdb] * 4, str(tmp_path / "ck_ring"),
              TrainConfig(mesh_shape=(2, 2, 2), **base),
              log_fn=lambda s: logs.append(s), eval_paths=[small_pdb])
    assert np.isfinite(m["final_loss"])
    assert np.isfinite(m["eval_ca_lddt"])
    assert any("rings over sp=2" in s for s in logs)

    m = train([small_pdb] * 4, str(tmp_path / "ck_flash_mesh"),
              TrainConfig(mesh_shape=(4, 1, 2), **base),
              log_fn=lambda *a: None)
    assert np.isfinite(m["final_loss"])

    # ring composes with the full production trunk: remat (tri_dots
    # policy) + triangle pair updates around the shard_map/ppermute island
    m = train([small_pdb] * 4, str(tmp_path / "ck_ring_remat"),
              TrainConfig(mesh_shape=(2, 2, 2), remat=True,
                          pair_update="triangle", remat_policy="tri_dots",
                          **base),
              log_fn=lambda *a: None)
    assert np.isfinite(m["final_loss"])


def test_flash_checkpoint_loads_jnp_path_off_tpu(small_pdb, tmp_path):
    """A flash-trained checkpoint folds off-TPU via the jnp attention (the
    interpreter-mode kernel has no upside at inference; params are
    path-interchangeable)."""
    from protstruc_tpu.train import TrainConfig, load_fold_model, train

    ck = str(tmp_path / "ck_flash")
    cfg = TrainConfig(steps=2, batch_size=1, node_dim=16, pair_dim=8,
                      n_heads=2, n_blocks=1, n_ipa_iter=2, n_recycle=0,
                      save_every=0, shuffle=False, use_flash_attn=True,
                      sequence_only=True)
    train([small_pdb], ck, cfg, log_fn=lambda *a: None)
    model, params, cfg_loaded = load_fold_model(ck)
    assert cfg_loaded.use_flash_attn is False  # cpu backend in tests


def test_resume_across_lr_schedule_change_errors(small_pdb, tmp_path):
    """lr_schedule shapes the optax state tree (adamw(float) -> EmptyState,
    adamw(schedule) -> ScaleByScheduleState), so resuming across a schedule
    change must fail the loud config check, not the orbax restore."""
    import dataclasses

    from protstruc_tpu.train import TrainConfig, train

    ck = str(tmp_path / "ck_sched")
    cfg = TrainConfig(steps=2, batch_size=1, node_dim=16, pair_dim=8,
                      n_heads=2, n_blocks=1, n_ipa_iter=2, n_recycle=0,
                      save_every=0, shuffle=False)
    train([small_pdb], ck, cfg, log_fn=lambda *a: None)
    cosine = dataclasses.replace(cfg, steps=4, lr_schedule="warmup_cosine")
    with pytest.raises(ValueError, match="lr_schedule"):
        train([small_pdb], ck, cosine, log_fn=lambda *a: None)


def test_cadence_aligned_final_eval_not_duplicated(small_pdb, tmp_path):
    """steps on the save_every cadence: the in-loop eval at the final step
    is the final eval — no second identical metrics.jsonl row, no second
    full held-out pass."""
    from protstruc_tpu.train import TrainConfig, train

    ck = str(tmp_path / "ck_dup_eval")
    cfg = TrainConfig(steps=2, batch_size=1, node_dim=16, pair_dim=8,
                      n_heads=2, n_blocks=1, n_ipa_iter=2, n_recycle=0,
                      save_every=2, shuffle=False)
    m = train([small_pdb], ck, cfg, eval_paths=[small_pdb],
              log_fn=lambda *a: None)
    assert "eval_ca_lddt" in m  # result still carries the final eval
    rows = [json.loads(l) for l in open(os.path.join(ck, "metrics.jsonl"))]
    final_rows = [r for r in rows
                  if r.get("step") == 2 and "eval_ca_lddt" in r]
    assert len(final_rows) == 1


def test_eval_windowing_long_structures(small_pdb, tmp_path):
    """Structures longer than eval_max_len evaluate on contiguous windows
    (full-length pair tensors of very long chains OOM one chip — 8gpi is
    2364 residues); metrics stay finite and the window count is exposed."""
    import dataclasses

    import jax

    from protstruc_tpu.train import (TrainConfig, _build_model,
                                     eval_batch_metrics, evaluate)
    from protstruc_tpu.train import _featurize
    from protstruc_tpu.utils.buckets import pad_batch_to_bucket
    import protstruc_tpu as ps

    cfg = TrainConfig(steps=1, batch_size=1, node_dim=16, pair_dim=8,
                      n_heads=2, n_blocks=1, n_ipa_iter=2, n_recycle=0,
                      eval_max_len=48)
    model = _build_model(cfg)
    sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")  # 130 residues
    feats, _, _ = _featurize(pad_batch_to_bucket(sb), cfg, model.trunk_cfg)
    params = model.init(jax.random.PRNGKey(0), feats)["params"]

    l, r, n_windows = eval_batch_metrics(model, params, cfg, sb)
    assert n_windows == 3  # ceil(130 / 48)
    assert np.isfinite(l).all() and np.isfinite(r).all()

    # uncapped: single window
    _, _, nw = eval_batch_metrics(
        model, params, dataclasses.replace(cfg, eval_max_len=None), sb)
    assert nw == 1

    # sequence-only mode routes identities through the stale-seq override
    lq, _, nwq = eval_batch_metrics(
        model, params, dataclasses.replace(cfg, sequence_only=True), sb)
    assert nwq == 3 and np.isfinite(lq).all()

    ev = evaluate(model, params, ["tests/data/1REX.pdb"], cfg)
    assert np.isfinite(ev["eval_ca_lddt"]) and np.isfinite(ev["eval_ca_rmsd"])
