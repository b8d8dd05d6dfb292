"""Command-line interface: ``python -m protstruc_tpu <command>``.

Production ergonomics the reference library (a pure API) never had:

    python -m protstruc_tpu featurize 1rex.pdb --out feats.npz
    python -m protstruc_tpu analyze 1rex.pdb
    python -m protstruc_tpu convert in.pdb out.cif
    python -m protstruc_tpu info

``featurize``/``analyze`` run on whatever backend JAX resolves (the real
TPU under the default environment; set JAX_PLATFORMS=cpu for host runs).
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(paths):
    import protstruc_tpu as ps

    return ps.StructureBatch.from_pdb(list(paths))


def cmd_featurize(args) -> int:
    import numpy as np

    sb = _load(args.inputs)
    g = sb.inter_residue_geometry(use_pallas=args.pallas)
    dihedrals, dmask = sb.backbone_dihedrals()
    frames = sb.backbone_orientations()

    out = {k: np.asarray(v) for k, v in g.items()}
    out["dihedrals"] = np.asarray(dihedrals)
    out["dihedral_mask"] = np.asarray(dmask)
    out["frames"] = np.asarray(frames)
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}: "
          f"{', '.join(f'{k}{v.shape}' for k, v in sorted(out.items()))}")
    return 0


def cmd_analyze(args) -> int:
    import numpy as np

    sb = _load(args.inputs)
    ss = np.asarray(sb.secondary_structure())
    rmask = np.asarray(sb.residue_mask)
    report = {
        "n_structures": sb.batch_size,
        "n_residues": [int(x) for x in np.asarray(sb.get_total_lengths())],
        "radius_of_gyration_A": [round(float(x), 2)
                                 for x in np.asarray(sb.radius_of_gyration())],
        "relative_contact_order": [round(float(x), 4)
                                   for x in np.asarray(sb.contact_order())],
        "clash_energy": [round(float(x), 3)
                         for x in np.asarray(sb.clash_energy())],
        "helix_frac": [round(float((ss[i] == 1)[rmask[i]].mean()), 3)
                       for i in range(sb.batch_size)],
        "strand_frac": [round(float((ss[i] == 2)[rmask[i]].mean()), 3)
                        for i in range(sb.batch_size)],
    }
    if args.sasa:
        report["total_sasa_A2"] = [
            round(float(x), 1) for x in np.asarray(sb.sasa().sum(axis=1))
        ]
    print(json.dumps(report, indent=2))
    return 0


def cmd_convert(args) -> int:
    from protstruc_tpu.pdbio.writer import (
        structure_batch_to_cif,
        structure_batch_to_pdb,
    )

    sb = _load([args.input])
    writer = (
        structure_batch_to_cif if args.output.endswith(".cif")
        else structure_batch_to_pdb
    )
    writer(sb, args.output)
    print(f"wrote {args.output}")
    return 0


def cmd_info(args) -> int:
    import jax

    import protstruc_tpu

    from protstruc_tpu.pdbio.native import native_available

    print(json.dumps({
        "version": getattr(protstruc_tpu, "__version__", "dev"),
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "native_parser": native_available(),
    }, indent=2))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="protstruc_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("featurize", help="6D maps + dihedrals + frames -> npz")
    f.add_argument("inputs", nargs="+")
    f.add_argument("--out", default="features.npz")
    f.add_argument("--pallas", action="store_true",
                   help="use the fused Pallas kernel (TPU)")
    f.set_defaults(fn=cmd_featurize)

    a = sub.add_parser("analyze", help="structure statistics as JSON")
    a.add_argument("inputs", nargs="+")
    a.add_argument("--sasa", action="store_true",
                   help="include Shrake-Rupley SASA (slower)")
    a.set_defaults(fn=cmd_analyze)

    c = sub.add_parser("convert", help="PDB <-> mmCIF conversion")
    c.add_argument("input")
    c.add_argument("output")
    c.set_defaults(fn=cmd_convert)

    i = sub.add_parser("info", help="backend / native-component status")
    i.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
