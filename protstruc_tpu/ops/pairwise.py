"""Pairwise (inter-residue) feature maps, TPU-first.

The reference materializes a ``(B, L, L, A, A)`` all-atom distance tensor
(protstruc.py:455-484) and an ``(B, L^2, 4, 3)`` atom-gather
(protstruc.py:589-618) to compute trRosetta-style pair features.  At the
north-star scale (B=256, L=512, A=15) that tensor is ~15T elements and
cannot exist on a chip.

Here every pair feature is computed as a fused ``(B, L, L)`` map directly
from the per-atom coordinate columns: select the handful of atom columns
involved (CA/CB/N/O...), broadcast ``(B, L, 1, 3)`` against ``(B, 1, L, 3)``
and reduce — XLA fuses the whole thing into one pass over the output tile,
never touching an ``A x A`` axis.  O(B*L^2) memory per feature instead of
O(B*L^2*A^2).

``full_pairwise_distance_matrix`` keeps the reference's full-tensor
semantics for parity tests and small inputs.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

from protstruc_tpu import geometry as geom
from protstruc_tpu.vocab import ATOM

__all__ = [
    "pairwise_atom_distance",
    "pairwise_dihedral_maps",
    "pairwise_planar_angle_maps",
    "full_pairwise_distance_matrix",
]


def _atom_cols(xyz: jnp.ndarray, names: Sequence[str]) -> List[jnp.ndarray]:
    """Select atom columns by name: ``(B, L, A, 3) -> [(B, L, 3), ...]``.

    🔧 reference bug FIXED (general.py:19 vs protstruc.py:605-607): the
    reference validates with the upper-casing ``is_valid`` but indexes the
    enum directly, so a mixed-case name like "cA" passes validation and
    then raises a raw KeyError; normalize the lookup the same way the
    validator does.
    """
    for a in names:
        if not ATOM.is_valid(a):
            raise ValueError(f"Atom {a} is not valid.")
    return [
        xyz[:, :, int(ATOM[a] if a in ATOM.__members__ else ATOM[a.upper()])]
        for a in names
    ]


def pairwise_atom_distance(
    xyz: jnp.ndarray,
    atom_mask: jnp.ndarray,
    atom_i: str,
    atom_j: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distance map between atom ``atom_i`` of residue i and ``atom_j`` of j.

    Fused equivalent of ``pairwise_distance_matrix()[..., ATOM[i], ATOM[j]]``
    (protstruc.py:477-483) without materializing the A x A axis.

    Returns ``(dist, mask)`` of shape ``(B, L, L)``.
    """
    (ci,) = _atom_cols(xyz, [atom_i])
    (cj,) = _atom_cols(xyz, [atom_j])
    diff = ci[:, :, None, :] - cj[:, None, :, :]
    dist = jnp.linalg.norm(diff, axis=-1)

    mi = atom_mask[:, :, int(ATOM[atom_i])]
    mj = atom_mask[:, :, int(ATOM[atom_j])]
    mask = mi[:, :, None] & mj[:, None, :]
    return dist, mask


def pairwise_dihedral_maps(
    xyz: jnp.ndarray, atoms_i: Sequence[str], atoms_j: Sequence[str]
) -> jnp.ndarray:
    """Pairwise dihedral map over 4 atoms split between residues i and j.

    The four dihedral points are ``atoms_i`` taken from residue i followed by
    ``atoms_j`` from residue j (reference semantics, protstruc.py:620-640).
    Computed by broadcasting residue-i columns ``(B, L, 1, 3)`` against
    residue-j columns ``(B, 1, L, 3)`` — no L^2 gather.

    Returns ``(B, L, L)``; entry ``[b, i, j]``.
    """
    if len(atoms_i) + len(atoms_j) != 4:
        raise ValueError("pairwise dihedral needs exactly 4 atoms total")
    cols_i = [c[:, :, None, :] for c in _atom_cols(xyz, atoms_i)]
    cols_j = [c[:, None, :, :] for c in _atom_cols(xyz, atoms_j)]
    a, b, c, d = cols_i + cols_j
    out = geom.dihedral(a, b, c, d)

    # Degenerate point configurations (coincident atoms) make the dihedral
    # 0/0-undefined.  The reference's eager torch evaluation cancels the
    # cross products exactly and lands on atan2(+0, +0) = 0; XLA's FMA
    # contraction and sign-of-zero simplifications (x + 0.0 -> x) land on
    # backend-dependent +/-pi instead.  Pin every exactly-degenerate case
    # that torch maps to 0: a==c & b==d (self-pair, e.g. omega diagonal),
    # c==d (zero last bond, e.g. theta diagonal), a==b (zero first bond).
    # b==c (zero axis) yields NaN in both implementations via the exact
    # 0/0 division and needs no handling.  NaN coords compare unequal, so
    # missing-atom entries keep their NaN.
    degenerate = (
        (jnp.all(a == c, axis=-1) & jnp.all(b == d, axis=-1))
        | jnp.all(c == d, axis=-1)
        | jnp.all(a == b, axis=-1)
    )
    return jnp.where(degenerate, 0.0, out)


def pairwise_planar_angle_maps(
    xyz: jnp.ndarray, atoms_i: Sequence[str], atoms_j: Sequence[str]
) -> jnp.ndarray:
    """Pairwise planar-angle map over 3 atoms split between residues i and j.

    Reference semantics: protstruc.py:642-660.  Returns ``(B, L, L)``.
    """
    if len(atoms_i) + len(atoms_j) != 3:
        raise ValueError("pairwise planar angle needs exactly 3 atoms total")
    cols_i = [c[:, :, None, :] for c in _atom_cols(xyz, atoms_i)]
    cols_j = [c[:, None, :, :] for c in _atom_cols(xyz, atoms_j)]
    a, b, c = cols_i + cols_j
    return geom.angle(a, b, c)


def full_pairwise_distance_matrix(
    xyz: jnp.ndarray, atom_mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full all-atom pair tensor ``(B, L, L, A, A)`` + validity mask.

    Parity with protstruc.py:455-484.  Only for small inputs — memory is
    O(B * L^2 * A^2); prefer ``pairwise_atom_distance`` slices.
    """
    B, L, A = xyz.shape[:3]
    elements = B * L * L * A * A
    if elements > 2**33:  # ~8G elements = 32 GB f32: cannot fit on a chip
        raise ValueError(
            f"full_pairwise_distance_matrix would materialize {elements:.2e} "
            f"elements (B={B}, L={L}, A={A}). Use pairwise_atom_distance / "
            "inter_residue_geometry (fused (B, L, L) maps) instead."
        )
    diff = xyz[:, :, None, :, None, :] - xyz[:, None, :, None, :, :]
    dist = jnp.linalg.norm(diff, axis=-1)
    mask = atom_mask[:, :, None, :, None] & atom_mask[:, None, :, None, :]
    return dist, mask
