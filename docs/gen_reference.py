"""Generate the API reference pages (docs/reference/*.md) from docstrings.

The upstream library publishes mkdocstrings-rendered API pages
(/root/reference/docs/reference/StructureBatch.md + mkdocs.yml's
`mkdocstrings` plugin).  mkdocstrings is not available in this image, so
the rebuild pre-renders equivalent markdown from the live docstrings with
this script and commits the output; tests/test_docs.py regenerates and
asserts the committed pages are in sync, so the reference can never rot
against the code.

Usage:  python docs/gen_reference.py [--check]
"""

from __future__ import annotations

import inspect
import os
import sys


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT_DIR = os.path.join(REPO, "docs", "reference")


def _sig(obj) -> str:
    import re

    try:
        s = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # default-value reprs can embed process-specific memory addresses
    # (e.g. flax's parent sentinel) — pin them so --check is deterministic
    return re.sub(r"at 0x[0-9a-fA-F]+", "at 0x...", s)


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d.strip() if d else "*(no docstring)*"


def _render_callable(name: str, obj, level: int = 3) -> str:
    head = "#" * level
    kind = "class" if inspect.isclass(obj) else "def"
    out = [f"{head} `{kind} {name}{_sig(obj)}`", "", _doc(obj), ""]
    if inspect.isclass(obj):
        for mname, m in sorted(vars(obj).items()):
            if mname.startswith("_") and mname != "__call__":
                continue
            if isinstance(m, (staticmethod, classmethod)):
                m = m.__func__
            if callable(m) and (m.__doc__ or mname == "__call__"):
                out += [f"{'#' * (level + 1)} `{name}.{mname}{_sig(m)}`",
                        "", _doc(m), ""]
            elif isinstance(m, property) and m.fget is not None:
                out += [f"{'#' * (level + 1)} `{name}.{mname}` *(property)*",
                        "", _doc(m), ""]
    return "\n".join(out)


def _render_module(title: str, intro: str, entries) -> str:
    """entries: list of (import-path, symbol-names or None for __all__)."""
    import importlib

    # intros are single paragraphs written as indented triple-quoted
    # literals: reflow to one line (dedent alone misses the first line)
    parts = [f"# {title}", "", " ".join(intro.split()), ""]
    for mod_path, names in entries:
        mod = importlib.import_module(mod_path)
        if names is None:
            names = getattr(mod, "__all__", None) or sorted(
                n for n in vars(mod) if not n.startswith("_"))
        parts.append(f"## `{mod_path}`")
        parts.append("")
        mdoc = inspect.getdoc(mod)
        if mdoc:
            parts += [mdoc.split("\n\n")[0].strip(), ""]
        for n in names:
            obj = getattr(mod, n)
            if callable(obj):
                parts.append(_render_callable(n, obj))
            else:
                parts += [f"### `{n}`", "",
                          f"`{type(obj).__name__}` constant.", ""]
    return "\n".join(parts).rstrip() + "\n"


PAGES = {
    "StructureBatch.md": (
        "StructureBatch",
        """The batched, functional structure container — the rebuild of the
        reference's `protstruc.StructureBatch` (protstruc.py:121-1024) as an
        immutable flax.struct pytree.""",
        [("protstruc_tpu.batch", ["StructureBatch"])],
    ),
    "AntibodyStructureBatch.md": (
        "AntibodyStructureBatch",
        """Antibody-aware batches: Fv filtering, CDR masks, scheme
        renumbering (reference: protstruc.py:1027-1214, pdb.py:183-340).""",
        [("protstruc_tpu.antibody", ["AntibodyStructureBatch"]),
         ("protstruc_tpu.numbering", None)],
    ),
    "geometry.md": (
        "geometry",
        """Core geometry kernels (reference: geometry.py) — dot/norm/angle/
        dihedral, frame construction, Kabsch, chirality.""",
        [("protstruc_tpu.geometry", None)],
    ),
    "io.md": (
        "io",
        """PDB/mmCIF parsing, writing and fetching (reference: pdb.py,
        io.py).""",
        [("protstruc_tpu.pdbio.parser", ["parse_pdb", "ParsedStructure"]),
         ("protstruc_tpu.pdbio.pdb", None),
         ("protstruc_tpu.pdbio.writer", None),
         ("protstruc_tpu.pdbio.cif", None),
         ("protstruc_tpu.pdbio.fetch", None),
         ("protstruc_tpu.pdbio.dataset", None)],
    ),
    "ops.md": (
        "ops",
        """TPU compute kernels and structure algorithms: fused Pallas
        featurization, flash/ring attention, fused triangle multiplication,
        reconstruction, metrics, diffusion.""",
        [("protstruc_tpu.ops.pairwise", None),
         ("protstruc_tpu.ops.pallas_pairwise", None),
         ("protstruc_tpu.ops.tri_mul", None),
         ("protstruc_tpu.ops.flash_attn", ["flash_pair_bias_attention"]),
         ("protstruc_tpu.ops.ring_attn", ["ring_attention_sharded"]),
         ("protstruc_tpu.ops.reconstruct", None),
         ("protstruc_tpu.ops.metrics", None),
         ("protstruc_tpu.ops.diffusion", None),
         ("protstruc_tpu.ops.nerf", None)],
    ),
    "models.md": (
        "models",
        """The model stack (additive framework surface): TrFold trunk, IPA
        structure module, FrameDiff, InverseFold, checkpointing.""",
        [("protstruc_tpu.models.trfold",
          ["TrFoldConfig", "TrFold", "featurize_for_model",
           "featurize_from_sequence", "loss_fn", "train_step"]),
         ("protstruc_tpu.models.ipa", ["IPAConfig", "FoldModel",
                                       "fold_loss_fn"]),
         ("protstruc_tpu.models.framediff", None),
         ("protstruc_tpu.models.inverse_fold", None),
         ("protstruc_tpu.models.checkpoint", None)],
    ),
    "train.md": (
        "train & CLI",
        """Production training/serving surface: the resumable train loop,
        fold/score entry points and the `protstruc_tpu` CLI.""",
        [("protstruc_tpu.train", None)],
    ),
    "parallel.md": (
        "parallel",
        """Multi-chip primitives: device meshes, pipeline parallelism,
        MoE expert parallelism, ZeRO-1 optimizer sharding.""",
        [("protstruc_tpu.parallel.mesh", None),
         ("protstruc_tpu.parallel.pipeline", None),
         ("protstruc_tpu.models.moe", None),
         ("protstruc_tpu.parallel.zero", None)],
    ),
}


def generate() -> dict:
    return {fname: _render_module(title, intro, entries)
            for fname, (title, intro, entries) in PAGES.items()}


def main():
    check = "--check" in sys.argv
    pages = generate()
    os.makedirs(OUT_DIR, exist_ok=True)
    stale = []
    for fname, content in pages.items():
        path = os.path.join(OUT_DIR, fname)
        if check:
            on_disk = open(path).read() if os.path.exists(path) else None
            if on_disk != content:
                stale.append(fname)
        else:
            with open(path, "w") as fh:
                fh.write(content)
            print(f"wrote {path} ({len(content)} bytes)")
    if stale:
        sys.exit(f"stale API reference pages: {stale} "
                 "(run python docs/gen_reference.py)")
    if check:
        print(f"{len(pages)} reference pages in sync")


if __name__ == "__main__":
    main()
