"""NeRF (Natural Extension Reference Frame) backbone folding.

Implements ``StructureBatch.from_dihedrals`` — declared but stubbed in the
reference (protstruc.py:321-339) — as a sequential chain extension under
``jax.lax.scan``: residue i+1's N/CA/C atoms are placed from residue i's
frame using ideal bond geometry and the given (phi, psi, omega) torsions.

Placement uses the same ``place_fourth_atom`` primitive as the reference's
reconstruction path (geometry.py:127-168), so torsion conventions round-trip
exactly with ``StructureBatch.backbone_dihedrals``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from protstruc_tpu import geometry as geom
from protstruc_tpu.constants import ideal

__all__ = ["backbone_from_dihedrals", "extend_backbone_step"]

# Standard peptide bond angles not present in the reference's ideal table
# (values from Engh & Huber):
ACN = math.radians(116.2)  # CA-C-N' angle at the carbonyl carbon
CNA = math.radians(121.7)  # C-N'-CA' angle at the backbone nitrogen


def extend_backbone_step(carry, torsions):
    """Place residue i+1's (N, CA, C) from residue i's and 3 torsions.

    carry: ``(n_i, ca_i, c_i)`` each ``(..., 3)``.
    torsions: ``(psi_i, omega_i, phi_ip1)`` each ``(..., 1)``.
    """
    n_i, ca_i, c_i = carry
    psi, omega, phi = torsions

    n_next = geom.place_fourth_atom(n_i, ca_i, c_i, ideal.C_N, ACN, psi)
    ca_next = geom.place_fourth_atom(ca_i, c_i, n_next, ideal.NA, CNA, omega)
    c_next = geom.place_fourth_atom(c_i, n_next, ca_next, ideal.AC, ideal.NAC, phi)
    new = (n_next, ca_next, c_next)
    return new, new


def backbone_from_dihedrals(dihedrals: jnp.ndarray) -> jnp.ndarray:
    """Fold ``(B, L, 3)`` (phi, psi, omega) torsions into backbone coordinates.

    Returns ``(B, L, 4, 3)`` N/CA/C/O coordinates.  The first residue sits in
    the ideal frame (CA at origin, CA->C along +x); phi[0], psi[L-1] and
    omega[L-1] are unused (undefined, cf. protstruc.py:497-499).  O atoms are
    placed ideally from the next residue's N (same construction as
    geometry.py:376-383).
    """
    dihedrals = jnp.asarray(dihedrals, dtype=jnp.float32)
    B, L = dihedrals.shape[:2]

    ideal0 = geom.ideal_backbone_coordinates((B,))  # (B, 3, 3): N, CA, C
    n0, ca0, c0 = ideal0[:, 0], ideal0[:, 1], ideal0[:, 2]

    phi = dihedrals[..., 0:1]
    psi = dihedrals[..., 1:2]
    omega = dihedrals[..., 2:3]

    # step i consumes psi_i, omega_i (residue i) and phi_{i+1}
    xs = (
        jnp.moveaxis(psi[:, :-1], 1, 0),
        jnp.moveaxis(omega[:, :-1], 1, 0),
        jnp.moveaxis(phi[:, 1:], 1, 0),
    )

    _, placed = jax.lax.scan(extend_backbone_step, (n0, ca0, c0), xs)
    # placed: tuple of (L-1, B, 3)
    n = jnp.concatenate([n0[None], placed[0]], axis=0)
    ca = jnp.concatenate([ca0[None], placed[1]], axis=0)
    c = jnp.concatenate([c0[None], placed[2]], axis=0)
    n, ca, c = (jnp.moveaxis(v, 0, 1) for v in (n, ca, c))  # (B, L, 3)

    # ideal carbonyl O — 🔧 reference bug FIXED (geometry.py:376-383 rolls
    # N so the LAST residue's O is oriented by residue 0's N, an arbitrary
    # direction for any folded chain): ideal_carbonyl_oxygen gives the
    # terminal residue an ideal-psi placement instead
    o = geom.ideal_carbonyl_oxygen(n, ca, c)

    return jnp.stack([n, ca, c, o], axis=2)
