"""Secondary-structure assignment (DSSP-style), fully on device.

Kabsch-Sander hydrogen-bond energies from backbone coordinates (amide H
inferred from the previous residue's carbonyl), then helix/strand/coil
assignment from n-turn and bridge patterns — a vectorized O(L^2) map, no
host loops.

Classes: 0 = coil (C), 1 = helix (H, 4-turns), 2 = strand (E, bridges).

Chain awareness: the previous-residue constructions (amide H, bend
virtual-bond angle) are guarded by ``chain_idx`` and neighbor validity —
a donor at a chain start or after a gap has no defined amide H and is
excluded, and bends are only evaluated where CA(i-2)/CA(i+2) exist on the
same chain.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

__all__ = ["hbond_energy_map", "assign_secondary_structure",
           "assign_secondary_structure_8", "SS_COIL", "SS_HELIX",
           "SS_STRAND", "SS8_LETTERS", "SS8_TO_3"]

SS_COIL, SS_HELIX, SS_STRAND = 0, 1, 2

_Q1Q2_F = 27.888  # 0.084 e^2 * 332 kcal/mol/A (Kabsch & Sander 1983)
_HBOND_CUTOFF = -0.5  # kcal/mol


def _prev_same_chain(residue_mask, chain_idx):
    """(B, L) bool: residue i-1 exists, is valid, and shares i's chain."""
    prev_valid = jnp.pad(residue_mask[:, :-1], ((0, 0), (1, 0)))
    if chain_idx is None:
        return prev_valid & (jnp.arange(residue_mask.shape[1]) > 0)[None]
    prev_chain = jnp.pad(chain_idx[:, :-1], ((0, 0), (1, 0)),
                         constant_values=-1)
    return prev_valid & (chain_idx == prev_chain)


def hbond_energy_map(
    n: jnp.ndarray, ca: jnp.ndarray, c: jnp.ndarray, o: jnp.ndarray,
    residue_mask: jnp.ndarray,
    chain_idx: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Kabsch-Sander energy E[b, i, j] of the H-bond C=O(i) ... H-N(j).

    Inputs: ``(B, L, 3)`` backbone atom coordinates + ``(B, L)`` mask, and
    optionally ``(B, L)`` chain indices.  The amide H of residue j sits
    1.0 A from N(j) along the previous residue's C->O direction reversed
    (standard DSSP construction); donors whose previous residue is
    missing, invalid, or on another chain have no defined amide H and are
    excluded (without ``chain_idx`` only the global first residue is).
    """
    co_dir = c - o  # (B, L, 3)
    prev_dir = jnp.roll(co_dir, shift=1, axis=1)
    # guard the normalization: a masked/zeroed previous residue gives a
    # zero direction whose 0/0 would inject NaN into every pair energy of
    # that donor row before the validity where() can drop it
    nrm = jnp.linalg.norm(prev_dir, axis=-1, keepdims=True)
    prev_dir = prev_dir / jnp.maximum(nrm, 1e-6)
    h = n + prev_dir  # 1.0 A from N

    def dist(a, b):
        d = jnp.linalg.norm(a[:, :, None, :] - b[:, None, :, :], axis=-1)
        return jnp.maximum(d, 0.5)  # avoid singularities on garbage pairs

    # E(i, j): acceptor C=O on residue i, donor N-H on residue j
    r_on = dist(o, n)
    r_ch = dist(c, h)
    r_oh = dist(o, h)
    r_cn = dist(c, n)
    e = _Q1Q2_F * (1.0 / r_on + 1.0 / r_ch - 1.0 / r_oh - 1.0 / r_cn)

    L = n.shape[1]
    valid = residue_mask[:, :, None] & residue_mask[:, None, :]
    # no bond with self or sequence neighbors
    ij = jnp.abs(
        jnp.arange(L)[None, :, None] - jnp.arange(L)[None, None, :]
    )
    valid = valid & (ij > 1)
    # donor j needs a defined amide H: previous residue present, valid,
    # and on the same chain
    donor_ok = _prev_same_chain(residue_mask, chain_idx)
    valid = valid & donor_ok[:, None, :]
    return jnp.where(valid, e, 0.0)


# --- shared pattern helpers (3-class and 8-class assignment) ----------------


def _shift_diag(m, k):
    """d[b, i] = m[b, i, i+k] (False out of range)."""
    B, L = m.shape[:2]
    idx = jnp.arange(L) + k
    ok = (idx >= 0) & (idx < L)
    idx = jnp.clip(idx, 0, L - 1)
    return jnp.take_along_axis(
        m, jnp.broadcast_to(idx[None, :, None], (B, L, 1)), axis=2
    )[..., 0] & ok[None, :]


def _shifted(m, di, dj):
    """m[i+di, j+dj] as a (B, L, L) map (False out of range)."""
    L = m.shape[1]
    s = jnp.roll(m, shift=(-di, -dj), axis=(1, 2))
    ok_i = (jnp.arange(L) + di >= 0) & (jnp.arange(L) + di < L)
    ok_j = (jnp.arange(L) + dj >= 0) & (jnp.arange(L) + dj < L)
    return s & ok_i[None, :, None] & ok_j[None, None, :]


def _run_from_starts(starts, length):
    """Mark ``length`` residues from every start position."""
    B, L = starts.shape
    out = jnp.zeros((B, L), bool)
    for k in range(length):
        out = out | jnp.pad(
            starts[:, : L - k] if k else starts, ((0, 0), (k, 0))
        )[:, :L]
    return out


def _bridge_map(hb):
    """Kabsch-Sander parallel/antiparallel bridge map (B, L, L).

    parallel:     [hb(i-1, j) and hb(j, i+1)] or [hb(j-1, i) and hb(i, j+1)]
    antiparallel: [hb(i, j) and hb(j, i)] or [hb(i-1, j+1) and hb(j-1, i+1)]
    """
    L = hb.shape[1]
    hbT = jnp.swapaxes(hb, 1, 2)  # hbT[i, j] = hb[j, i]
    parallel = (_shifted(hb, -1, 0) & _shifted(hbT, 1, 0)) | (
        _shifted(hbT, 0, -1) & _shifted(hb, 0, 1)
    )
    antipar = (hb & hbT) | (_shifted(hb, -1, 1) & _shifted(hbT, 1, -1))
    far = jnp.abs(jnp.arange(L)[:, None] - jnp.arange(L)[None, :]) > 2
    return (parallel | antipar) & far[None]


def assign_secondary_structure(
    n: jnp.ndarray, ca: jnp.ndarray, c: jnp.ndarray, o: jnp.ndarray,
    residue_mask: jnp.ndarray,
    chain_idx: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DSSP-style 3-class secondary structure. Returns ``(ss, hbond_map)``.

    ``ss``: ``(B, L)`` int32 in {0 coil, 1 helix, 2 strand}.
    Helix: consecutive (i, i+4) turns (DSSP H). Strand: parallel or
    antiparallel bridge patterns (DSSP E, ladders of length >= 2 implied by
    the bridge definition itself).
    """
    e = hbond_energy_map(n, ca, c, o, residue_mask, chain_idx)
    hb = e < _HBOND_CUTOFF  # hb[b, i, j]: CO(i) ... HN(j)

    B, L = residue_mask.shape

    # 4-turn at i: CO(i) ... HN(i+4); helix when two consecutive 4-turns
    turn4 = _shift_diag(hb, 4)
    prev_turn4 = jnp.pad(turn4[:, :-1], ((0, 0), (1, 0)))
    helix = _run_from_starts(prev_turn4 & turn4, 4)

    bridge = _bridge_map(hb)
    strand = bridge.any(axis=2) | bridge.any(axis=1)

    ss = jnp.where(helix, SS_HELIX, jnp.where(strand, SS_STRAND, SS_COIL))
    ss = jnp.where(residue_mask, ss, SS_COIL).astype(jnp.int32)
    return ss, hb


# --- full 8-class DSSP alphabet --------------------------------------------
# int codes chosen so {0, 1, 2} match the 3-class values above
SS8_COIL, SS8_HELIX, SS8_STRAND = 0, 1, 2
SS8_310, SS8_PI, SS8_BRIDGE, SS8_TURN, SS8_BEND = 3, 4, 5, 6, 7
SS8_LETTERS = "CHEGIBTS"  # index -> DSSP letter ('C' for coil/' ')
#: standard DSSP 8->3 grouping: H/G/I -> helix, E/B -> strand, rest coil
SS8_TO_3 = jnp.asarray([0, 1, 2, 1, 1, 2, 0, 0], jnp.int32)


def assign_secondary_structure_8(
    n: jnp.ndarray, ca: jnp.ndarray, c: jnp.ndarray, o: jnp.ndarray,
    residue_mask: jnp.ndarray,
    chain_idx: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full 8-class DSSP assignment, ``(B, L)`` int32.

    Classes (SS8_* constants / ``SS8_LETTERS``): H alpha-helix (4-turns),
    G 3-10 helix (3-turns), I pi-helix (5-turns), E strand (ladder),
    B isolated beta-bridge, T hydrogen-bonded turn, S bend (kappa > 70 deg),
    C coil.  Priority follows DSSP: H > E > B > G > I > T > S.
    """
    e = hbond_energy_map(n, ca, c, o, residue_mask, chain_idx)
    hb = e < _HBOND_CUTOFF
    B, L = residue_mask.shape

    def turns_and_helix(k):
        tk = _shift_diag(hb, k)
        prev = jnp.pad(tk[:, :-1], ((0, 0), (1, 0)))
        return tk, _run_from_starts(prev & tk, k)

    turn3, helix_g = turns_and_helix(3)
    turn4, helix_h = turns_and_helix(4)
    turn5, helix_i = turns_and_helix(5)

    bridge_map = _bridge_map(hb)
    bridged = bridge_map.any(axis=2) | bridge_map.any(axis=1)
    # ladder (E) when a sequence neighbor also bridges; else isolated B
    nb = (jnp.pad(bridged[:, :-1], ((0, 0), (1, 0)))
          | jnp.pad(bridged[:, 1:], ((0, 0), (0, 1))))
    strand_e = bridged & nb
    bridge_b = bridged & ~nb

    # hydrogen-bonded turn: residues i+1 .. i+k-1 of any k-turn at i
    turn_t = jnp.zeros((B, L), bool)
    for k, tk in ((3, turn3), (4, turn4), (5, turn5)):
        inner = _run_from_starts(jnp.pad(tk[:, : L - 1], ((0, 0), (1, 0))),
                                 k - 1)
        turn_t = turn_t | inner

    # bend: virtual-bond angle kappa(CA(i-2), CA(i), CA(i+2)) > 70 degrees.
    # Only defined where BOTH +-2 neighbors exist, are valid, and share
    # i's chain — a masked neighbor (zeroed coords) or a cross-chain roll
    # would otherwise produce arbitrary kappa at every gap and boundary.
    ca_m2 = jnp.roll(ca, 2, axis=1)
    ca_p2 = jnp.roll(ca, -2, axis=1)
    u = ca_m2 - ca
    v = ca_p2 - ca
    cosang = jnp.sum(u * v, -1) / jnp.sqrt(
        jnp.maximum(jnp.sum(u * u, -1) * jnp.sum(v * v, -1), 1e-12))
    interior = (jnp.arange(L) >= 2) & (jnp.arange(L) < L - 2)
    ok_m2 = jnp.roll(residue_mask, 2, axis=1)
    ok_p2 = jnp.roll(residue_mask, -2, axis=1)
    bend_ok = interior[None] & ok_m2 & ok_p2
    if chain_idx is not None:
        bend_ok = bend_ok & (jnp.roll(chain_idx, 2, axis=1) == chain_idx)
        bend_ok = bend_ok & (jnp.roll(chain_idx, -2, axis=1) == chain_idx)
    # kappa = pi - angle(u, v); kappa > 70 deg <=> angle < 110 deg
    bend_s = (cosang > jnp.cos(jnp.deg2rad(110.0))) & bend_ok

    ss = jnp.full((B, L), SS8_COIL, jnp.int32)
    for cls, m in [(SS8_BEND, bend_s), (SS8_TURN, turn_t),
                   (SS8_PI, helix_i), (SS8_310, helix_g),
                   (SS8_BRIDGE, bridge_b), (SS8_STRAND, strand_e),
                   (SS8_HELIX, helix_h)]:
        ss = jnp.where(m, cls, ss)
    return jnp.where(residue_mask, ss, SS8_COIL).astype(jnp.int32)
