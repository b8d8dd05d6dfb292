"""Ramachandran (phi/psi) validation, fully on device.

Coarse elliptical region classification — favored / allowed / outlier —
in the style of MolProbity's summary statistics but with analytic regions
instead of empirical density tables (no data files, jit-friendly).
Regions are handled per residue class (general / glycine / proline), with
glycine additionally allowed in the mirrored (left-handed) regions.

Calibration (tests/test_rama.py): on the 1.5-A crystal structure 1REX the
favored fraction is ~0.93 and outliers ~0.02; on NeRF-built ideal helices
and strands every interior residue is favored.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = ["ramachandran_classes", "RAMA_FAVORED", "RAMA_ALLOWED",
           "RAMA_OUTLIER"]

RAMA_FAVORED, RAMA_ALLOWED, RAMA_OUTLIER = 0, 1, 2

# (phi0, psi0, r_phi, r_psi) in degrees — favored ellipses
_GENERAL = (
    (-63.0, -43.0, 35.0, 45.0),    # alpha
    (-120.0, 135.0, 65.0, 55.0),   # beta (psi wraps: 135 +/- 55 spans 180)
    (-90.0, 0.0, 30.0, 30.0),      # bridge between alpha and beta
    (57.0, 40.0, 25.0, 35.0),      # left-handed alpha (Asn/Asp/Gly mostly)
)
_PRO = (
    (-63.0, -35.0, 25.0, 40.0),    # proline alpha
    (-65.0, 145.0, 30.0, 40.0),    # proline polyproline-II/beta
)
_ALLOWED_SCALE = 1.7  # allowed = favored ellipses inflated by this factor


def _wrap(x):
    """Wrap degrees into (-180, 180]."""
    return x - 360.0 * jnp.round(x / 360.0)


def _in_ellipses(phi, psi, regions, scale=1.0):
    hit = jnp.zeros(phi.shape, bool)
    for p0, s0, rp, rs in regions:
        dp = _wrap(phi - p0) / (rp * scale)
        ds = _wrap(psi - s0) / (rs * scale)
        hit = hit | (dp * dp + ds * ds <= 1.0)
    return hit


def ramachandran_classes(
    phi: jnp.ndarray,
    psi: jnp.ndarray,
    seq_idx: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Classify each residue's (phi, psi) pair.

    Args:
        phi, psi: ``(B, L)`` backbone dihedrals in **radians** (the
            ``backbone_dihedrals()`` convention; terminal residues should be
            excluded via ``valid``).
        seq_idx: ``(B, L)`` residue types (GLY and PRO get their own rules).
        valid: ``(B, L)`` residues with defined phi AND psi.

    Returns ``(B, L)`` int32: 0 favored, 1 allowed, 2 outlier; invalid
    residues are favored (0) so fraction reducers can mask with ``valid``.
    """
    from protstruc_tpu.vocab import AA

    phi_d = jnp.degrees(phi)
    psi_d = jnp.degrees(psi)

    gen_fav = _in_ellipses(phi_d, psi_d, _GENERAL)
    gen_alw = _in_ellipses(phi_d, psi_d, _GENERAL, _ALLOWED_SCALE)
    # glycine: no CB — mirrored regions are equally accessible
    gly_fav = gen_fav | _in_ellipses(-phi_d, -psi_d, _GENERAL)
    gly_alw = gen_alw | _in_ellipses(-phi_d, -psi_d, _GENERAL, _ALLOWED_SCALE)
    pro_fav = _in_ellipses(phi_d, psi_d, _PRO)
    pro_alw = _in_ellipses(phi_d, psi_d, _PRO, _ALLOWED_SCALE)

    is_gly = seq_idx == int(AA.GLY)
    is_pro = seq_idx == int(AA.PRO)
    fav = jnp.where(is_gly, gly_fav, jnp.where(is_pro, pro_fav, gen_fav))
    alw = jnp.where(is_gly, gly_alw, jnp.where(is_pro, pro_alw, gen_alw))

    cls = jnp.where(fav, RAMA_FAVORED,
                    jnp.where(alw, RAMA_ALLOWED, RAMA_OUTLIER))
    return jnp.where(valid, cls, RAMA_FAVORED).astype(jnp.int32)
