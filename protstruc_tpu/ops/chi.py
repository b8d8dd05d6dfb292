"""Sidechain chi torsions: extraction, symmetry, and rotation.

Extends the torsion surface beyond the backbone (reference
``backbone_dihedrals``, protstruc.py:486-541) to the sidechain chi angles —
the remaining degrees of freedom of a heavy-atom protein structure.  Chi
definitions follow the IUPAC/Rosetta/AlphaFold convention (chi1 =
N-CA-CB-XG etc., up to chi4; ARG's trivial chi5 omitted as in AF2);
connectivity comes from the standard amino-acid chemical components.

All tables are derived programmatically from the vocab heavy-atom slot
layout at import time; the device-side functions are pure jnp gathers +
``geometry.dihedral`` / Rodrigues rotations — static shapes, vmap/jit-safe.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from protstruc_tpu import geometry as geom

__all__ = [
    "CHI_ATOM_NAMES",
    "chi_tables",
    "chi_angles",
    "rotate_chi",
    "chi_symmetry_mask",
]

# chi_k = dihedral(a1, a2, a3, a4); rotation axis a2-a3, moved = a3 subtree
CHI_ATOM_NAMES: Dict[str, List[Tuple[str, str, str, str]]] = {
    "ARG": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD"),
            ("CB", "CG", "CD", "NE"), ("CG", "CD", "NE", "CZ")],
    "ASN": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "OD1")],
    "ASP": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "OD1")],
    "CYS": [("N", "CA", "CB", "SG")],
    "GLN": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD"),
            ("CB", "CG", "CD", "OE1")],
    "GLU": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD"),
            ("CB", "CG", "CD", "OE1")],
    "HIS": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "ND1")],
    "ILE": [("N", "CA", "CB", "CG1"), ("CA", "CB", "CG1", "CD1")],
    "LEU": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD1")],
    "LYS": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD"),
            ("CB", "CG", "CD", "CE"), ("CG", "CD", "CE", "NZ")],
    "MET": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "SD"),
            ("CB", "CG", "SD", "CE")],
    "PHE": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD1")],
    "PRO": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD")],
    "SER": [("N", "CA", "CB", "OG")],
    "THR": [("N", "CA", "CB", "OG1")],
    "TRP": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD1")],
    "TYR": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD1")],
    "VAL": [("N", "CA", "CB", "CG1")],
    # ALA, GLY, UNK: no chi angles
}

# sidechain connectivity: parent atom of each sidechain atom (CB's parent is
# the backbone CA).  Rings are spanned by a tree — fine for chi rotations,
# which move whole rigid ring groups.
_PARENT: Dict[str, Dict[str, str]] = {
    "ARG": {"CG": "CB", "CD": "CG", "NE": "CD", "CZ": "NE",
            "NH1": "CZ", "NH2": "CZ"},
    "ASN": {"CG": "CB", "OD1": "CG", "ND2": "CG"},
    "ASP": {"CG": "CB", "OD1": "CG", "OD2": "CG"},
    "CYS": {"SG": "CB"},
    "GLN": {"CG": "CB", "CD": "CG", "OE1": "CD", "NE2": "CD"},
    "GLU": {"CG": "CB", "CD": "CG", "OE1": "CD", "OE2": "CD"},
    "HIS": {"CG": "CB", "ND1": "CG", "CD2": "CG", "CE1": "ND1", "NE2": "CD2"},
    "ILE": {"CG1": "CB", "CG2": "CB", "CD1": "CG1"},
    "LEU": {"CG": "CB", "CD1": "CG", "CD2": "CG"},
    "LYS": {"CG": "CB", "CD": "CG", "CE": "CD", "NZ": "CE"},
    "MET": {"CG": "CB", "SD": "CG", "CE": "SD"},
    "PHE": {"CG": "CB", "CD1": "CG", "CD2": "CG", "CE1": "CD1",
            "CE2": "CD2", "CZ": "CE1"},
    "PRO": {"CG": "CB", "CD": "CG"},
    "SER": {"OG": "CB"},
    "THR": {"OG1": "CB", "CG2": "CB"},
    "TRP": {"CG": "CB", "CD1": "CG", "CD2": "CG", "NE1": "CD1", "CE2": "CD2",
            "CE3": "CD2", "CZ2": "CE2", "CZ3": "CE3", "CH2": "CZ2"},
    "TYR": {"CG": "CB", "CD1": "CG", "CD2": "CG", "CE1": "CD1",
            "CE2": "CD2", "CZ": "CE1", "OH": "CZ"},
    "VAL": {"CG1": "CB", "CG2": "CB"},
}

# chis whose terminal group is 2-fold symmetric (angle defined modulo pi):
# ASP chi2 (OD1/OD2), GLU chi3 (OE1/OE2), PHE/TYR chi2 (ring flip)
_SYMMETRIC: Dict[str, int] = {"ASP": 2, "GLU": 3, "PHE": 2, "TYR": 2}


@lru_cache(maxsize=1)
def chi_tables() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Derive the slot-index tables from the vocab heavy-atom layout.

    Returns:
        chi_idx:   ``(21, 4, 4)`` int32 atom-slot indices per chi (-1 pad).
        chi_moved: ``(21, 4, 15)`` bool — slots rotated by each chi.
        chi_mask:  ``(21, 4)`` bool — which chis exist per residue type.
    """
    from protstruc_tpu.vocab import AA, RESTYPE_HEAVY_ATOMS

    chi_idx = np.full((21, 4, 4), -1, np.int32)
    chi_moved = np.zeros((21, 4, 15), bool)
    chi_mask = np.zeros((21, 4), bool)

    for res, chis in CHI_ATOM_NAMES.items():
        aa = int(AA.__members__[res])
        slots = {n: i for i, n in enumerate(RESTYPE_HEAVY_ATOMS[AA(aa)]) if n}
        parent = _PARENT[res]

        def descendants(root: str) -> List[str]:
            out = []
            frontier = [root]
            while frontier:
                cur = frontier.pop()
                kids = [a for a, p in parent.items() if p == cur]
                out.extend(kids)
                frontier.extend(kids)
            return out

        for k, names in enumerate(chis):
            chi_idx[aa, k] = [slots[n] for n in names]
            chi_mask[aa, k] = True
            # moved set: the axis-distal atom (a3)'s subtree = a4 and beyond
            a3 = names[2]
            for moved_name in descendants(a3):
                chi_moved[aa, k, slots[moved_name]] = True
    return chi_idx, chi_moved, chi_mask


@lru_cache(maxsize=1)
def chi_symmetry_mask() -> np.ndarray:
    """``(21, 4)`` bool: chis defined modulo pi (symmetric terminal group)."""
    from protstruc_tpu.vocab import AA

    sym = np.zeros((21, 4), bool)
    for res, k in _SYMMETRIC.items():
        sym[int(AA.__members__[res]), k - 1] = True
    return sym


def chi_angles(
    xyz: jnp.ndarray, seq_idx: jnp.ndarray, atom_mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sidechain chi torsions from all-atom coordinates.

    Args:
        xyz: ``(B, L, 15, 3)`` heavy-atom coordinates (NaN at missing atoms).
        seq_idx: ``(B, L)`` residue-type indices.
        atom_mask: ``(B, L, 15)`` bool.

    Returns ``(chi (B, L, 4) radians, chi_mask (B, L, 4))`` — masked where
    the chi is undefined for the residue type or any of its atoms missing;
    masked entries are zero-filled (matching backbone_dihedrals' zero-fill
    convention, reference protstruc.py:521-534).
    """
    idx_np, _, defined_np = chi_tables()
    idx = jnp.asarray(idx_np)          # (21, 4, 4)
    defined = jnp.asarray(defined_np)  # (21, 4)

    aa = jnp.clip(seq_idx, 0, 20)
    slots = idx[aa]                    # (B, L, 4, 4)
    safe = jnp.maximum(slots, 0)

    # gather the 4 atoms of each chi: (B, L, 4chis, 4atoms, 3)
    gather = jnp.take_along_axis(
        xyz[:, :, None, :, :].repeat(4, axis=2),      # (B, L, 4, 15, 3)
        safe[..., None].astype(jnp.int32).repeat(3, -1),  # (B, L, 4, 4, 3)
        axis=3,
    )
    present = jnp.take_along_axis(
        atom_mask[:, :, None, :].repeat(4, axis=2), safe, axis=3
    )  # (B, L, 4, 4)

    mask = (
        defined[aa]
        & present.all(-1)
        & jnp.isfinite(gather).all((-2, -1))
    )
    # double-where (CLAUDE.md): undefined chis gather four copies of slot
    # 0 (and missing atoms are NaN), making dihedral's 0/0 NaN — a single
    # post-hoc where hides the value but jax.grad still multiplies the
    # NaN atan2 partials by the zero cotangent.  Feed a fixed
    # non-degenerate quadruple instead; it carries no xyz dependence, so
    # the untaken branch contributes exactly zero gradient.
    dummy = jnp.asarray(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [1.0, 1.0, 1.0]]
    )
    g_safe = jnp.where(mask[..., None, None],
                       jnp.nan_to_num(gather, nan=0.0), dummy)
    a, b, c, d = (g_safe[..., i, :] for i in range(4))
    chi = geom.dihedral(a, b, c, d)
    return jnp.where(mask, chi, 0.0), mask


def rotate_chi(
    xyz: jnp.ndarray,
    seq_idx: jnp.ndarray,
    delta: jnp.ndarray,
    atom_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Rotate sidechains: add ``delta`` (radians) to each chi angle.

    Applies the four chi rotations in order (chi1 first — later chis ride
    inside earlier moved groups, so each uses the updated coordinates).
    Atoms outside a chi's moved set — and residues where the chi is
    undefined — are untouched; bond lengths/angles within the moved
    subtree are preserved exactly (rigid Rodrigues rotation about the
    a2-a3 axis through a3).  Caveat: PRO's chis live inside the
    pyrrolidine ring, whose closure bond (CD-N) is NOT preserved by a
    tree rotation — samplers must not perturb proline chis
    (pack.pack_sidechains freezes them).

    Args:
        xyz: ``(B, L, 15, 3)``; seq_idx: ``(B, L)``; delta: ``(B, L, 4)``.

    Returns rotated ``(B, L, 15, 3)`` (NaNs at missing atoms preserved).
    """
    from protstruc_tpu.ops.so3 import rotvec_to_rot

    idx_np, moved_np, defined_np = chi_tables()
    idx = jnp.asarray(idx_np)
    moved = jnp.asarray(moved_np)
    defined = jnp.asarray(defined_np)

    aa = jnp.clip(seq_idx, 0, 20)

    out = xyz
    for k in range(4):
        slots = jnp.maximum(idx[aa][:, :, k], 0)  # (B, L, 4)
        g = jnp.take_along_axis(
            out, slots[..., None].repeat(3, -1), axis=2
        )  # (B, L, 4, 3)
        a2, a3 = g[:, :, 1], g[:, :, 2]
        # double-where normalization: NaN (missing) axis atoms or a
        # zero-length axis would otherwise leak NaN/inf into the backward
        # pass of any gradient-based chi refinement even where the
        # rotation is masked off (0 * inf = NaN through sqrt at 0)
        raw = jnp.nan_to_num(a3 - a2, nan=0.0)
        nsq = jnp.sum(raw * raw, axis=-1, keepdims=True)
        ok = defined[aa][:, :, k] & (nsq[..., 0] > 1e-12)
        ok = ok & jnp.isfinite(a2).all(-1) & jnp.isfinite(a3).all(-1)
        nsq_safe = jnp.where(nsq > 1e-12, nsq, 1.0)
        axis = jnp.where(ok[..., None], raw, jnp.asarray([1.0, 0.0, 0.0]))
        axis = axis / jnp.sqrt(jnp.where(ok[..., None], nsq_safe, 1.0))
        ang = jnp.where(ok, delta[:, :, k], 0.0)

        rot = rotvec_to_rot(axis * ang[..., None])  # (B, L, 3, 3)
        centered = jnp.nan_to_num(out - a3[:, :, None, :], nan=0.0)
        rotated = jnp.einsum("blij,blaj->blai", rot, centered) + a3[:, :, None, :]

        # gate the write on original finiteness: a missing atom inside a
        # moved set must stay NaN (the load-bearing missing-atom convention),
        # not come back as a rotated finite phantom
        sel = (
            moved[aa][:, :, k, :, None]
            & ok[:, :, None, None]
            & jnp.isfinite(out).all(-1, keepdims=True)
        )
        out = jnp.where(sel, rotated, out)
    return out
