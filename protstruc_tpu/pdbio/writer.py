"""PDB writer for backbone coordinate arrays.

Parity: /root/reference/protstruc/io.py:8-43 — writes ``(5, L, 3)``
N/CA/C/O/CB coordinates as fixed-format ATOM lines, skipping CB for glycine.
Extended with ``structure_batch_to_pdb`` which writes any StructureBatch
member (all 15 atom slots, real chain ids and residue numbering).
"""

from __future__ import annotations

from typing import List

import numpy as np

from protstruc_tpu.vocab import RESTYPE_HEAVY_ATOMS, AA, one2three

__all__ = ["to_pdb", "structure_batch_to_pdb", "structure_batch_to_cif"]


def _atom_line(serial, atom, aa3, chain_id, res_num, x, y, z,
               bfactor=0.0) -> str:
    # same fixed layout as the reference writer (io.py:36): atom name
    # left-justified from col 14, resname cols 18-20; the B-factor column
    # carries per-residue confidence (pLDDT) when given, AF2-style
    return (
        f"ATOM  {serial:5d}  {atom:4s}{aa3} {chain_id}{res_num:4d}    "
        f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00{bfactor:6.2f}\n"
    )


def to_pdb(
    filename: str,
    coords: np.ndarray,
    sequences: List[str],
    chain_ids: List[str],
    atoms: List[str] = ("N", "CA", "C", "O", "CB"),
    bfactors: np.ndarray = None,
) -> None:
    """Write ``(n_atoms, L, 3)`` per-atom-type backbone coords to a PDB file.

    ``sequences``: one-letter sequence per chain; ``chain_ids``: chain id per
    chain; CB lines are skipped for glycine (io.py:30-31).  ``bfactors``:
    optional per-residue ``(L,)`` values for the B-factor column (e.g.
    pLDDT confidence, AF2-style).
    """
    coords = np.asarray(coords)
    if bfactors is not None:
        bfactors = np.asarray(bfactors)
    with open(filename, "w") as out:
        coord_idx, serial = 0, 1
        for seq, chain_id in zip(sequences, chain_ids):
            res_num = 1
            for aa1 in seq:
                aa3 = one2three[aa1]
                b = float(bfactors[coord_idx]) if bfactors is not None else 0.0
                for atom_idx, atom in enumerate(atoms):
                    if atom == "CB" and aa1 == "G":
                        continue
                    x, y, z = coords[atom_idx, coord_idx]
                    out.write(
                        _atom_line(serial, atom, aa3, chain_id, res_num,
                                   x, y, z, b)
                    )
                    serial += 1
                coord_idx += 1
                res_num += 1


def structure_batch_to_cif(batch, filename: str, index: int = 0) -> None:
    """Write one member of a StructureBatch as minimal mmCIF (PDBx).

    Emits the ``_atom_site`` loop consumed by pdbio/cif.py (and any other
    PDBx reader); complements the legacy-PDB writers as the modern format.
    """
    xyz = np.asarray(batch.get_xyz()[index])
    mask = np.asarray(batch.get_atom_mask()[index])
    chain_idx = np.asarray(batch.get_chain_idx()[index])
    residue_idx = np.asarray(batch.residue_idx[index])
    chain_ids = batch.get_chain_ids()[index] if batch.get_chain_ids() else ["A"]
    seq_idx = np.asarray(batch.get_seq_idx()[index]) if batch.seq else None

    header = [
        "data_protstruc_tpu",
        "#",
        "loop_",
        "_atom_site.group_PDB",
        "_atom_site.id",
        "_atom_site.label_atom_id",
        "_atom_site.label_alt_id",
        "_atom_site.auth_comp_id",
        "_atom_site.auth_asym_id",
        "_atom_site.auth_seq_id",
        "_atom_site.pdbx_PDB_ins_code",
        "_atom_site.Cartn_x",
        "_atom_site.Cartn_y",
        "_atom_site.Cartn_z",
        "_atom_site.pdbx_PDB_model_num",
    ]
    with open(filename, "w") as out:
        out.write("\n".join(header) + "\n")
        serial = 1
        for i in range(xyz.shape[0]):
            ci = int(chain_idx[i])
            if ci < 0 or not mask[i].any():
                continue
            aa = AA(int(seq_idx[i])) if seq_idx is not None else AA.UNK
            aa3 = aa.name if aa is not AA.UNK else "UNK"
            atom_names = RESTYPE_HEAVY_ATOMS.get(aa, [""] * xyz.shape[1])
            res_num = int(residue_idx[i]) if residue_idx[i] >= 0 else i + 1
            cid = chain_ids[ci] if ci < len(chain_ids) else "A"
            for a in range(xyz.shape[1]):
                if not mask[i, a] or not atom_names[a]:
                    continue
                x, y, z = xyz[i, a]
                out.write(
                    f"ATOM {serial} {atom_names[a]} . {aa3} {cid} {res_num} ? "
                    f"{x:.3f} {y:.3f} {z:.3f} 1\n"
                )
                serial += 1
        out.write("#\n")


def structure_batch_to_pdb(batch, filename: str, index: int = 0) -> None:
    """Write one member of a StructureBatch to a PDB file (all atom slots)."""
    xyz = np.asarray(batch.get_xyz()[index])
    mask = np.asarray(batch.get_atom_mask()[index])
    chain_idx = np.asarray(batch.get_chain_idx()[index])
    residue_idx = np.asarray(batch.residue_idx[index])
    chain_ids = batch.get_chain_ids()[index] if batch.get_chain_ids() else ["A"]
    seq_idx = np.asarray(batch.get_seq_idx()[index]) if batch.seq else None

    with open(filename, "w") as out:
        serial = 1
        for i in range(xyz.shape[0]):
            ci = int(chain_idx[i])
            if ci < 0 or not mask[i].any():
                continue
            aa = AA(int(seq_idx[i])) if seq_idx is not None else AA.UNK
            aa3 = aa.name if aa is not AA.UNK else "UNK"
            atom_names = RESTYPE_HEAVY_ATOMS.get(aa, [""] * xyz.shape[1])
            res_num = int(residue_idx[i]) if residue_idx[i] >= 0 else i + 1
            cid = chain_ids[ci] if ci < len(chain_ids) else "A"
            for a in range(xyz.shape[1]):
                if not mask[i, a] or not atom_names[a]:
                    continue
                x, y, z = xyz[i, a]
                out.write(_atom_line(serial, atom_names[a], aa3, cid, res_num, x, y, z))
                serial += 1
