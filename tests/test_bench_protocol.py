"""bench.py driver-protocol smoke test (tiny shapes, CPU).

The driver runs bench.py on real hardware and parses exactly one JSON line
from stdout; this test executes the same code path at toy sizes so protocol
regressions (renamed keys, broken variants, stray stdout) fail fast in CI.
"""

import json
import subprocess
import sys

import jax
import numpy as np
import pytest


def test_featurize_variants_run_tiny(monkeypatch):
    import bench

    monkeypatch.setattr(bench, "B", 2)
    monkeypatch.setattr(bench, "L", 32)
    args = bench.make_inputs(jax.random.PRNGKey(0))
    assert args[0].shape == (2, 32, 15, 3)

    for fn in [bench.featurize_jnp, bench.featurize_pallas, bench.featurize_pallas_bf16]:
        g, d, m, f = fn(*args)
        assert g["d_cb"].shape == (2, 32, 32)
        assert d.shape == (2, 32, 3)
        assert f.shape == (2, 32, 3, 3)
        assert np.isfinite(np.asarray(g["omega"])).all()


def test_bench_main_emits_single_json_line():
    code = (
        "import sys\n"
        "sys.argv.append('--headline-only')\n"  # configs are TPU-sized; CPU
        "import bench, jax\n"
        "bench.B, bench.L = 2, 32\n"
        "bench.WARMUP, bench.ITERS = 1, 1\n"
        "bench.main()\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env={
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": "/root/repo",
            "HOME": "/root",
        },
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be exactly one JSON line, got: {lines}"
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["unit"] == "structures/s"
    assert rec["value"] > 0


def test_cpu_fallback_lane_isolation(monkeypatch, capsys):
    """One failing degraded-mode lane (parity gates abort via SystemExit,
    not Exception) must not take the remaining certification lanes down."""
    import bench

    ran = []
    monkeypatch.setattr(bench, "parity_check",
                        lambda rtt: (_ for _ in ()).throw(SystemExit("boom")))
    monkeypatch.setattr(bench, "model_parity_check",
                        lambda rtt: ran.append("model-parity"))
    monkeypatch.setattr(bench, "run_ingest", lambda: ran.append("ingest"))
    monkeypatch.setattr(bench, "run_ingest_sustained",
                        lambda: ran.append("ingest-sustained"))
    bench.run_cpu_lanes()
    assert ran == ["model-parity", "ingest", "ingest-sustained"]
    err = capsys.readouterr().err
    assert "[cpu-fallback][parity] FAILED: SystemExit" in err
    assert "[cpu-fallback] lanes done" in err
