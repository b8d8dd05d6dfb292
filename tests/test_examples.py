"""Smoke-run every examples/*.py script at minimal settings.

The examples are user-facing surface with no other coverage (the r4
design_cdr fixture drift was only caught by a manual run); this runner
keeps them from rotting.  Each script runs in a subprocess — they call
``sys.exit``-free ``main()`` under ``__main__`` and configure their own
backend — with absolute data paths, a temp cwd (so relative outputs like
``out/designed.pdb`` never pollute the repo), and the smallest step
counts their argv accepts.  Pass criterion: exit 0 (each script already
asserts its own invariants; tests/ref_oracle-grade numeric checks live
in the unit suites for the underlying ops).
"""

import os
import pathlib
import subprocess
import sys

import pytest

# quality tier: each example is a multi-minute subprocess — see pytest.ini
pytestmark = pytest.mark.quality

REPO = pathlib.Path(__file__).parent.parent
DATA = REPO / "tests" / "data"

# script name -> argv (absolute paths; tiny step counts)
CASES = {
    "reconstruct_pipeline.py": [str(DATA / "1REX.pdb"), "rec.pdb"],
    "design_pipeline.py": [str(DATA / "1REX.pdb"), "2"],
    "framediff_backbones.py": [str(DATA / "1REX.pdb"), "2"],
    "generate_backbones.py": [str(DATA / "1REX.pdb"), "2"],
    "design_cdr.py": [str(DATA / "6dc4.pdb"), "H", "L", "2"],
    "train_trfold.py": ["--data", str(DATA), "--steps", "1",
                        "--batch-size", "1", "--cpu"],
}


@pytest.mark.parametrize("script", sorted(CASES))
def test_example_runs(script, tmp_path):
    path = REPO / "examples" / script
    assert path.exists(), f"missing example {script}"
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",        # skip the TPU relay (CLAUDE.md)
        JAX_PLATFORMS="cpu",
        PYTHONPATH=str(REPO),
    )
    proc = subprocess.run(
        [sys.executable, str(path), *CASES[script]],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"{script} failed:\n--- stdout\n{proc.stdout[-2000:]}"
        f"\n--- stderr\n{proc.stderr[-2000:]}")


def test_examples_list_is_exhaustive():
    """A new example must be added to CASES (or explicitly skipped here)."""
    scripts = {p.name for p in (REPO / "examples").glob("*.py")}
    assert scripts == set(CASES), (
        f"examples/ and CASES diverged: {scripts ^ set(CASES)}")
