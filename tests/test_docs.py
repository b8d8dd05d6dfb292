"""Execute every fenced ```python block in docs/tutorials/*.md.

The reference ships executable .ipynb tutorials; ours are markdown, so this
runner is what keeps them from rotting (VERDICT r1 item 8): each tutorial's
blocks run in order, in one namespace seeded with the standard objects the
tutorial prose assumes (``sb`` — 1REX, ``ab`` — 6dc4 H/L, ``key``, shapes),
with cwd set to a temp dir pre-populated with the tests/data fixtures so
relative PDB paths resolve and written files don't pollute the repo.

Blocks whose info string contains ``no-run`` are skipped (none currently).
"""

import pathlib
import re

import numpy as np
import pytest

# quality tier: executes every tutorial block (minutes) — see pytest.ini
pytestmark = pytest.mark.quality

DOCS = pathlib.Path(__file__).parent.parent / "docs" / "tutorials"
TUTORIALS = sorted(DOCS.glob("*.md"))


def _extract_blocks(md_path):
    txt = md_path.read_text()
    out = []
    for m in re.finditer(r"```python([^\n]*)\n(.*?)```", txt, re.S):
        info, code = m.group(1).strip(), m.group(2)
        if "no-run" not in info:
            out.append(code)
    return out


@pytest.fixture(scope="module")
def prelude_ns():
    """The namespace the tutorial prose assumes; computed once per module."""
    import matplotlib

    matplotlib.use("Agg")

    import jax
    import jax.numpy as jnp

    import protstruc_tpu as ps
    from tests.conftest import pdb_path

    ns = {}
    ns.update(np=np, jnp=jnp, jax=jax, ps=ps)

    key = jax.random.PRNGKey(0)
    sb = ps.StructureBatch.from_pdb(pdb_path("1REX.pdb"))
    ab = ps.AntibodyStructureBatch.from_pdb(
        pdb_path("6dc4.pdb"), heavy_chain_id="H", light_chain_id="L"
    )
    B, L = sb.batch_size, sb.n_residues
    true_ca = sb.get_xyz()[:, :, 1]
    pred_ca = true_ca + 0.1 * jax.random.normal(key, true_ca.shape)
    mask = sb.get_residue_mask()

    # stand-ins for "your trained model" in the diffusion tutorial
    class _ZeroDenoiser:
        @staticmethod
        def apply(variables, x_t, t_emb, seq, mask):
            return jnp.zeros_like(x_t)

    ns.update(
        key=key,
        sb=sb,
        ab=ab,
        B=B,
        L=L,
        true_ca=true_ca,
        pred_ca=pred_ca,
        mask=mask,
        batch_a=sb,
        batch_b=sb,
        paths=[pdb_path("6dc4.pdb"), pdb_path("1a6v_JN.pdb")],
        beta=jnp.full((B,), 0.01),
        t=jnp.zeros((B,), jnp.int32),
        x0=jnp.nan_to_num(sb.standardize().get_xyz(), nan=0.0),
        model=_ZeroDenoiser(),
        params={},
        t_embed=lambda t: t,
        seq="A" * L,
        phi=jnp.full((B, L), -1.0),
        psi=jnp.full((B, L), -0.8),
        omega=jnp.full((B, L), np.pi),
        rotation_matrix=jnp.eye(3),
        target=sb,
    )
    return ns


@pytest.fixture
def docs_cwd(tmp_path, monkeypatch):
    """Temp cwd with the PDB fixtures linked in, so relative paths resolve."""
    from tests.conftest import DATA_DIR

    for f in DATA_DIR.glob("*.pdb"):
        (tmp_path / f.name).symlink_to(f)
    monkeypatch.chdir(tmp_path)
    return tmp_path


@pytest.mark.parametrize(
    "md", TUTORIALS, ids=[p.name for p in TUTORIALS]
)
def test_tutorial_executes(md, prelude_ns, docs_cwd):
    blocks = _extract_blocks(md)
    assert blocks, f"{md.name} has no python blocks"
    ns = dict(prelude_ns)  # fresh copy per tutorial; blocks share it in order
    for i, code in enumerate(blocks):
        try:
            exec(compile(code, f"{md.name}[block {i}]", "exec"), ns)
        except Exception as e:
            pytest.fail(f"{md.name} block {i} failed: {type(e).__name__}: {e}\n{code}")


def test_api_reference_in_sync():
    """docs/reference/*.md must match what docs/gen_reference.py renders
    from the live docstrings (the rebuild's mkdocstrings equivalent)."""
    import importlib.util
    import pathlib

    root = pathlib.Path(__file__).parent.parent
    spec = importlib.util.spec_from_file_location(
        "gen_reference", root / "docs" / "gen_reference.py")
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    pages = gen.generate()
    ref_dir = root / "docs" / "reference"
    for fname, content in pages.items():
        on_disk = (ref_dir / fname).read_text()
        assert on_disk == content, (
            f"{fname} is stale: run python docs/gen_reference.py")


def test_api_reference_in_nav():
    """mkdocs.yml must list every generated reference page (and only
    existing files overall)."""
    import pathlib

    root = pathlib.Path(__file__).parent.parent
    nav = (root / "mkdocs.yml").read_text()
    assert "Reference:" in nav
    for page in sorted((root / "docs" / "reference").glob("*.md")):
        assert f"reference/{page.name}" in nav, page.name
    # every nav .md path exists
    import re as _re
    for m in _re.finditer(r":\s*([\w/.-]+\.md)\s*$", nav, _re.M):
        assert (root / "docs" / m.group(1)).exists(), m.group(1)
