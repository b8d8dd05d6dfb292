"""Gradient-based structure relaxation, fully on device.

An "amber-relax-lite" for predicted/generated structures: minimize a
differentiable energy — harmonic backbone bonded terms (ideal bond lengths
and planar angles, constants/ideal.py) + the steric clash wall
(ops/pack.clash_energy) + an optional harmonic tether to the starting
coordinates — over atom positions with optax.  Everything is jit-compiled
with static shapes (``lax.scan`` over optimizer steps); NaN (missing) atoms
are frozen and never contribute.

The reference has no relaxation at all; model pipelines (FoldModel /
FrameDiff outputs, grafted sidechains) produce near-ideal but unrefined
geometry — this closes the loop (predict -> relax -> write).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from protstruc_tpu.constants import ideal

__all__ = ["backbone_bonded_energy", "intra_residue_restraint_energy",
           "relax_structure"]

# Engh & Huber (1991) peptide-bond planar angles, radians (not in the
# reference's ideal table, which only carries frame-construction angles):
_ACN_NEXT = 2.0281  # Ca-C-N(i+1), 116.2 deg
_CNA_NEXT = 2.1242  # C(i)-N-Ca,   121.7 deg


def _angle_cos(a, b, c):
    """cos of the planar angle at b — smooth everywhere (no arccos)."""
    u = a - b
    v = c - b
    uu = jnp.sum(u * u, -1)
    vv = jnp.sum(v * v, -1)
    uv = jnp.sum(u * v, -1)
    denom = jnp.sqrt(jnp.maximum(uu * vv, 1e-12))
    return uv / denom


def backbone_bonded_energy(
    xyz: jnp.ndarray,
    atom_mask: jnp.ndarray,
    chain_idx: jnp.ndarray,
) -> jnp.ndarray:
    """Harmonic bonded energy of the backbone, ``(B,)``.

    Terms (vs constants/ideal.py): bond lengths N-CA, CA-C, C-O, CA-CB and
    the peptide C(i)-N(i+1); planar angles N-CA-C, CA-C-O (ideal table) and
    the Engh-Huber peptide angles CA-C-N(i+1), C(i)-N-CA.  Angle terms are
    harmonic in cos(angle) (smooth at the ends).  Cross-residue terms are
    masked at chain breaks via ``chain_idx``.
    """
    n, ca, c, o = xyz[:, :, 0], xyz[:, :, 1], xyz[:, :, 2], xyz[:, :, 3]
    cb = xyz[:, :, 4]
    ok = atom_mask & jnp.isfinite(xyz).all(-1)  # (B, L, A)
    okn, okca, okc, oko, okcb = (ok[:, :, i] for i in range(5))

    def nan0(x):
        return jnp.nan_to_num(x, nan=0.0)

    n, ca, c, o, cb = map(nan0, (n, ca, c, o, cb))

    def bond(a, b, m, target):
        d = jnp.sqrt(jnp.sum((a - b) ** 2, -1) + 1e-12)
        return jnp.sum(jnp.where(m, (d - target) ** 2, 0.0), axis=1)

    def angle(a, b, c_, m, target_rad):
        cth = _angle_cos(a, b, c_)
        return jnp.sum(
            jnp.where(m, (cth - jnp.cos(target_rad)) ** 2, 0.0), axis=1)

    e = bond(n, ca, okn & okca, ideal.NA)
    e += bond(ca, c, okca & okc, ideal.AC)
    e += bond(c, o, okc & oko, ideal.CO)
    e += bond(ca, cb, okca & okcb, ideal.AB)
    e += angle(n, ca, c, okn & okca & okc, ideal.NAC)
    e += angle(ca, c, o, okca & okc & oko, ideal.ACO)

    # cross-residue: same chain, both residues present
    same = chain_idx[:, :-1] == chain_idx[:, 1:]
    n_next, ca_next = n[:, 1:], ca[:, 1:]
    okn_next, okca_next = okn[:, 1:], okca[:, 1:]
    link = same & okc[:, :-1] & okn_next
    e += bond(c[:, :-1], n_next, link, ideal.C_N)
    e += angle(ca[:, :-1], c[:, :-1], n_next,
               link & okca[:, :-1], _ACN_NEXT)
    e += angle(c[:, :-1], n_next, ca_next,
               link & okca_next, _CNA_NEXT)
    return e


def intra_residue_restraint_energy(
    xyz: jnp.ndarray,
    x0: jnp.ndarray,
    pair_ok: jnp.ndarray,
) -> jnp.ndarray:
    """Harmonic restraint holding intra-residue covalent geometry, ``(B,)``.

    The clash term deliberately excludes intra-residue pairs (pack.py) and
    the bonded term only covers backbone atoms — without this, a clashing
    sidechain atom (e.g. LYS NZ) feels only the inter-residue push plus
    the weak global tether and drifts off its covalent bond arbitrarily.
    Bonds are identified geometrically from the INITIAL structure (no
    residue-type bond table needed): intra-residue atom pairs closer than
    2.0 A at start are restrained to their initial distance with weight 1
    (covalent bonds, 1.2-1.8 A), pairs in [2.0, 2.8) with weight 0.25
    (1-3 pairs, holds the angles).  Restraining to the initial distances
    preserves — not idealizes — input sidechain geometry; rebuilding
    broken sidechains is the packer's job (ops/pack, ops/graft).
    """
    d0 = jnp.sqrt(jnp.sum(
        (x0[:, :, :, None] - x0[:, :, None, :]) ** 2, -1) + 1e-12)
    w = jnp.where(d0 < 2.0, 1.0, jnp.where(d0 < 2.8, 0.25, 0.0))
    A = xyz.shape[2]
    upper = jnp.triu(jnp.ones((A, A), bool), k=1)
    w = jnp.where(pair_ok & upper[None, None], w, 0.0)
    d = jnp.sqrt(jnp.sum(
        (xyz[:, :, :, None] - xyz[:, :, None, :]) ** 2, -1) + 1e-12)
    return jnp.sum(w * (d - d0) ** 2, axis=(1, 2, 3))


def relax_structure(
    xyz: jnp.ndarray,
    atom_mask: jnp.ndarray,
    seq_idx: jnp.ndarray,
    chain_idx: jnp.ndarray = None,
    n_steps: int = 200,
    learning_rate: float = 2e-3,
    clash_weight: float = 1.0,
    bonded_weight: float = 10.0,
    tether_weight: float = 0.1,
    intra_weight: float = 10.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Minimize bonded + clash (+ tether) energy over atom coordinates.

    Returns ``(relaxed_xyz, energies)`` where ``energies`` holds the
    per-structure ``(B,)`` initial/final totals and components.  Missing
    (NaN) atoms are frozen at NaN; all finite atoms move.  ``lax.scan``
    over ``n_steps`` adam updates — one jit region, TPU-friendly.
    """
    import optax

    from protstruc_tpu.ops.pack import clash_energy

    if chain_idx is None:
        chain_idx = jnp.zeros(xyz.shape[:2], jnp.int32)
    finite = jnp.isfinite(xyz).all(-1, keepdims=True)
    x0 = jnp.nan_to_num(xyz, nan=0.0)
    present = atom_mask & finite[..., 0]
    intra_ok = present[:, :, :, None] & present[:, :, None, :]

    def total(x):
        xb = jnp.where(finite, x, jnp.nan)  # keep missing-atom semantics
        eb = backbone_bonded_energy(xb, atom_mask, chain_idx)
        ec = clash_energy(xb, atom_mask, seq_idx)
        ei = intra_residue_restraint_energy(x, x0, intra_ok)
        et = jnp.sum(
            jnp.where(finite & atom_mask[..., None], (x - x0) ** 2, 0.0),
            axis=(1, 2, 3))
        return (bonded_weight * eb + clash_weight * ec
                + intra_weight * ei + tether_weight * et), (eb, ec)

    tx = optax.adam(learning_rate)

    def e_sum(x):
        t, _ = total(x)
        return jnp.sum(t)

    grad_fn = jax.grad(e_sum)

    def step(carry, _):
        x, opt_state = carry
        g = grad_fn(x)
        g = jnp.where(finite & atom_mask[..., None], g, 0.0)
        updates, opt_state = tx.update(g, opt_state, x)
        x = optax.apply_updates(x, updates)
        return (x, opt_state), None

    e0, (eb0, ec0) = total(x0)
    (x_fin, _), _ = jax.lax.scan(step, (x0, tx.init(x0)), None, length=n_steps)
    e1, (eb1, ec1) = total(x_fin)

    relaxed = jnp.where(finite, x_fin, jnp.nan)
    return relaxed, {
        "initial": e0, "final": e1,
        "bonded_initial": eb0, "bonded_final": eb1,
        "clash_initial": ec0, "clash_final": ec1,
    }
