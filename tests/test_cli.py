"""CLI (`python -m protstruc_tpu`) tests — in-process via main()."""

import json

import numpy as np

from protstruc_tpu.__main__ import main


def test_featurize_roundtrip(tmp_path, capsys):
    out = tmp_path / "f.npz"
    rc = main(["featurize", "tests/data/15c8_HL.pdb", "--out", str(out)])
    assert rc == 0
    data = np.load(out)
    assert "d_cb" in data and "dihedrals" in data and "frames" in data
    L = data["d_cb"].shape[1]
    assert data["d_cb"].shape == (1, L, L)
    assert data["frames"].shape == (1, L, 3, 3)


def test_analyze_json(capsys):
    rc = main(["analyze", "tests/data/1REX.pdb"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["n_structures"] == 1
    assert report["n_residues"] == [130]
    assert 10.0 < report["radius_of_gyration_A"][0] < 20.0
    assert 0.1 < report["helix_frac"][0] < 0.6


def test_analyze_two_residue_chain_valid_json(tmp_path, capsys):
    """No residue has both phi AND psi defined in a 2-residue chain; the
    rama fractions must emit 0.0, not NaN (invalid JSON) — ADVICE r3."""
    import jax.numpy as jnp

    import protstruc_tpu as ps
    from protstruc_tpu.pdbio.writer import structure_batch_to_pdb

    sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
    sel = np.zeros(sb.chain_idx.shape, bool)
    sel[:, :2] = True
    frag = sb.residue_masked_select(jnp.asarray(sel))
    path = tmp_path / "tiny.pdb"
    structure_batch_to_pdb(frag, str(path))

    rc = main(["analyze", str(path)])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)  # would raise on NaN
    assert report["rama_favored_frac"] == [0.0]
    assert report["rama_outlier_frac"] == [0.0]


def test_convert_pdb_to_cif_and_back(tmp_path, capsys):
    cif = tmp_path / "x.cif"
    rc = main(["convert", "tests/data/15c8_HL.pdb", str(cif)])
    assert rc == 0

    import protstruc_tpu as ps

    orig = ps.StructureBatch.from_pdb("tests/data/15c8_HL.pdb")
    conv = ps.StructureBatch.from_pdb(str(cif))
    assert conv.n_residues == orig.n_residues
    a, b = np.asarray(orig.xyz), np.asarray(conv.xyz)
    m = np.asarray(orig.atom_mask & conv.atom_mask)
    np.testing.assert_allclose(a[m], b[m], atol=2e-3)


def test_info(capsys):
    rc = main(["info"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert "backend" in report and "native_parser" in report


def test_serve_loop(tmp_path):
    """JSONL service: ready banner, featurize/analyze/error/shutdown."""
    import io
    import json

    import numpy as np

    from protstruc_tpu.__main__ import serve_loop

    out_npz = str(tmp_path / "f.npz")
    reqs = "\n".join([
        json.dumps({"op": "ping"}),
        json.dumps({"op": "featurize", "path": "tests/data/15c8_HL.pdb",
                    "out": out_npz}),
        json.dumps({"op": "analyze", "path": "tests/data/1REX.pdb"}),
        json.dumps({"op": "nope"}),
        json.dumps({"op": "shutdown"}),
    ])
    outfile = io.StringIO()
    rc = serve_loop(io.StringIO(reqs), outfile, buckets=(256,))
    assert rc == 0
    lines = [json.loads(l) for l in outfile.getvalue().strip().splitlines()]
    assert lines[0]["ready"] is True
    assert lines[1] == {"ok": True}
    assert lines[2]["ok"] and lines[2]["n_residues"] == 229
    dat = np.load(out_npz)
    assert np.isfinite(np.nansum(dat["d_cb"]))
    assert lines[3]["ok"] and 0.2 < lines[3]["helix_frac"] < 0.6
    assert not lines[4]["ok"] and "unknown op" in lines[4]["error"]
    assert lines[5]["bye"] is True


def test_serve_fold_op(tmp_path):
    """fold requests through the service use the cached checkpoint."""
    import io
    import json

    import numpy as np

    import protstruc_tpu as ps
    from protstruc_tpu.__main__ import serve_loop
    from protstruc_tpu.pdbio.writer import structure_batch_to_pdb
    from protstruc_tpu.train import TrainConfig, train

    # tiny checkpoint
    sb = ps.StructureBatch.from_pdb("tests/data/1REX.pdb")
    sel = np.zeros(sb.chain_idx.shape, bool)
    sel[:, :40] = True
    frag_pdb = str(tmp_path / "frag.pdb")
    structure_batch_to_pdb(sb.residue_masked_select(sel), frag_pdb)
    ck = str(tmp_path / "ck")
    train([frag_pdb], ck,
          TrainConfig(steps=2, batch_size=1, node_dim=16, pair_dim=8,
                      n_heads=2, n_blocks=1, n_ipa_iter=2, n_recycle=0,
                      save_every=0, shuffle=False),
          log_fn=lambda *a: None)

    out_pdb = str(tmp_path / "fold.pdb")
    reqs = "\n".join([
        json.dumps({"op": "fold", "seq": "ACDEF", "out": out_pdb}),
        json.dumps({"op": "fold", "seq": "GHIKL", "out": out_pdb}),
        json.dumps({"op": "shutdown"}),
    ])
    outfile = io.StringIO()
    rc = serve_loop(io.StringIO(reqs), outfile, checkpoint_dir=ck,
                    buckets=(256,))
    assert rc == 0
    lines = [json.loads(l) for l in outfile.getvalue().strip().splitlines()]
    assert lines[1]["ok"] and lines[2]["ok"]
    assert "mean_plddt" in lines[1]
    assert open(out_pdb).read().count("ATOM") >= 5 * 4


def test_renumber_cli(tmp_path, capsys):
    out = tmp_path / "imgt.pdb"
    rc = main(["renumber", "tests/data/6dc4.pdb", str(out),
               "--heavy", "H", "--light", "L", "--to", "imgt"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out)
    assert rec["chains"] == {"H": {"from": "chothia", "to": "imgt"},
                             "L": {"from": "chothia", "to": "imgt"}}

    from protstruc_tpu.pdbio.parser import parse_pdb

    p = parse_pdb(str(out))
    real = p.atom_mask.any(1)
    h = (p.chain_id_per_res == "H") & real
    bynum = dict(zip(p.residue_number[h].tolist(), p.oneletter[h].tolist()))
    assert bynum[23] == "C" and bynum[104] == "C"


def test_score_self_is_perfect(capsys):
    """score of a structure against itself: all metrics at their ceiling."""
    rc = main(["score", "tests/data/1REX.pdb", "tests/data/1REX.pdb"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["ca_rmsd"] < 1e-3
    assert rep["ca_lddt"] > 0.999
    assert rep["tm_score"] > 0.999
    assert rep["gdt_ts"] > 0.999
    assert "dockq" not in rep  # single chain: no interface metrics


def test_score_complex_dockq_and_perturbation(tmp_path, capsys):
    """Two-chain complex: self-score gives DockQ 1.0/high; rigid-moving the
    ligand chain degrades DockQ but not receptor-frame CA metrics much."""
    import jax.numpy as jnp

    import protstruc_tpu as ps
    from protstruc_tpu.pdbio.writer import structure_batch_to_pdb

    native = "tests/data/1ad0_DC.pdb"
    rc = main(["score", native, native])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["dockq"] > 0.999 and rep["capri_band"] == "high"

    sb = ps.StructureBatch.from_pdb(native)
    lig = (sb.chain_idx == 1)[:, :, None, None]
    moved = sb.replace(xyz=jnp.where(lig, sb.xyz + 8.0, sb.xyz))
    model_path = str(tmp_path / "model.pdb")
    structure_batch_to_pdb(moved, model_path)
    rc = main(["score", model_path, native])
    assert rc == 0
    rep2 = json.loads(capsys.readouterr().out)
    assert rep2["dockq"] < rep["dockq"] - 0.2
    assert rep2["capri_band"] in ("incorrect", "acceptable", "medium")


def test_score_length_mismatch_errors(tmp_path):
    import pytest

    with pytest.raises(SystemExit, match="residue count mismatch"):
        main(["score", "tests/data/1REX.pdb", "tests/data/4EOT.pdb"])
