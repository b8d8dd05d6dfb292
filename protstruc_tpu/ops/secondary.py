"""Secondary-structure assignment (DSSP-style), fully on device.

Kabsch-Sander hydrogen-bond energies from backbone coordinates (amide H
inferred from the previous residue's carbonyl), then helix/strand/coil
assignment from n-turn and bridge patterns — a vectorized O(L^2) map, no
host loops.

Classes: 0 = coil (C), 1 = helix (H, 4-turns), 2 = strand (E, bridges).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = ["hbond_energy_map", "assign_secondary_structure",
           "assign_secondary_structure_8", "SS_COIL", "SS_HELIX",
           "SS_STRAND", "SS8_LETTERS", "SS8_TO_3"]

SS_COIL, SS_HELIX, SS_STRAND = 0, 1, 2

_Q1Q2_F = 27.888  # 0.084 e^2 * 332 kcal/mol/A (Kabsch & Sander 1983)
_HBOND_CUTOFF = -0.5  # kcal/mol


def hbond_energy_map(
    n: jnp.ndarray, ca: jnp.ndarray, c: jnp.ndarray, o: jnp.ndarray,
    residue_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Kabsch-Sander energy E[b, i, j] of the H-bond C=O(i) ... H-N(j).

    Inputs: ``(B, L, 3)`` backbone atom coordinates + ``(B, L)`` mask.
    The amide H of residue j sits 1.0 A from N(j) along the previous
    residue's C->O direction reversed (standard DSSP construction); chain
    starts (no previous residue) and prolines are approximated by masking
    j = 0 only — callers can refine with an N-terminal mask.
    """
    co_dir = c - o  # (B, L, 3)
    prev_dir = jnp.roll(co_dir, shift=1, axis=1)
    prev_dir = prev_dir / jnp.linalg.norm(prev_dir, axis=-1, keepdims=True)
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
    # no bond with self or sequence neighbors; donor j=0 has no amide H
    ij = jnp.abs(
        jnp.arange(L)[None, :, None] - jnp.arange(L)[None, None, :]
    )
    valid = valid & (ij > 1)
    valid = valid & (jnp.arange(L)[None, None, :] > 0)
    return jnp.where(valid, e, 0.0)


def assign_secondary_structure(
    n: jnp.ndarray, ca: jnp.ndarray, c: jnp.ndarray, o: jnp.ndarray,
    residue_mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DSSP-style 3-class secondary structure. Returns ``(ss, hbond_map)``.

    ``ss``: ``(B, L)`` int32 in {0 coil, 1 helix, 2 strand}.
    Helix: consecutive (i, i+4) turns (DSSP H). Strand: parallel or
    antiparallel bridge patterns (DSSP E, ladders of length >= 2 implied by
    the bridge definition itself).
    """
    e = hbond_energy_map(n, ca, c, o, residue_mask)
    hb = e < _HBOND_CUTOFF  # hb[b, i, j]: CO(i) ... HN(j)

    B, L = residue_mask.shape

    def shift_diag(m, k):
        """d[b, i] = m[b, i, i+k] (False out of range)."""
        idx = jnp.arange(L) + k
        ok = (idx >= 0) & (idx < L)
        idx = jnp.clip(idx, 0, L - 1)
        return jnp.take_along_axis(
            m, jnp.broadcast_to(idx[None, :, None], (B, L, 1)), axis=2
        )[..., 0] & ok[None, :]

    # 4-turn at i: CO(i) ... HN(i+4); helix when two consecutive 4-turns
    turn4 = shift_diag(hb, 4)
    prev_turn4 = jnp.pad(turn4[:, :-1], ((0, 0), (1, 0)))
    helix_start = prev_turn4 & turn4
    # residues i .. i+3 of a started helix are helical
    helix = jnp.zeros((B, L), bool)
    for k in range(4):
        helix = helix | jnp.pad(
            helix_start[:, : L - k] if k else helix_start, ((0, 0), (k, 0))
        )[:, :L]

    # bridges (exact Kabsch-Sander definitions), vectorized over (i, j):
    #   parallel:     [hb(i-1, j) and hb(j, i+1)] or [hb(j-1, i) and hb(i, j+1)]
    #   antiparallel: [hb(i, j) and hb(j, i)] or [hb(i-1, j+1) and hb(j-1, i+1)]
    hbT = jnp.swapaxes(hb, 1, 2)  # hbT[i, j] = hb[j, i]

    def shifted(m, di, dj):
        """m[i+di, j+dj] as a (B, L, L) map (False out of range)."""
        s = jnp.roll(m, shift=(-di, -dj), axis=(1, 2))
        ok_i = (jnp.arange(L) + di >= 0) & (jnp.arange(L) + di < L)
        ok_j = (jnp.arange(L) + dj >= 0) & (jnp.arange(L) + dj < L)
        return s & ok_i[None, :, None] & ok_j[None, None, :]

    parallel = (shifted(hb, -1, 0) & shifted(hbT, 1, 0)) | (
        shifted(hbT, 0, -1) & shifted(hb, 0, 1)
    )
    antipar = (hb & hbT) | (shifted(hb, -1, 1) & shifted(hbT, 1, -1))
    far = jnp.abs(jnp.arange(L)[:, None] - jnp.arange(L)[None, :]) > 2
    bridge = (parallel | antipar) & far[None]
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
) -> jnp.ndarray:
    """Full 8-class DSSP assignment, ``(B, L)`` int32.

    Classes (SS8_* constants / ``SS8_LETTERS``): H alpha-helix (4-turns),
    G 3-10 helix (3-turns), I pi-helix (5-turns), E strand (ladder),
    B isolated beta-bridge, T hydrogen-bonded turn, S bend (kappa > 70 deg),
    C coil.  Priority follows DSSP: H > E > B > G > I > T > S.
    """
    e = hbond_energy_map(n, ca, c, o, residue_mask)
    hb = e < _HBOND_CUTOFF
    B, L = residue_mask.shape

    def shift_diag(m, k):
        idx = jnp.arange(L) + k
        ok = (idx >= 0) & (idx < L)
        idx = jnp.clip(idx, 0, L - 1)
        return jnp.take_along_axis(
            m, jnp.broadcast_to(idx[None, :, None], (B, L, 1)), axis=2
        )[..., 0] & ok[None, :]

    def run_from_starts(starts, length):
        out = jnp.zeros((B, L), bool)
        for k in range(length):
            out = out | jnp.pad(
                starts[:, : L - k] if k else starts, ((0, 0), (k, 0))
            )[:, :L]
        return out

    def turns_and_helix(k):
        tk = shift_diag(hb, k)
        prev = jnp.pad(tk[:, :-1], ((0, 0), (1, 0)))
        return tk, run_from_starts(prev & tk, k)

    turn3, helix_g = turns_and_helix(3)
    turn4, helix_h = turns_and_helix(4)
    turn5, helix_i = turns_and_helix(5)

    hbT = jnp.swapaxes(hb, 1, 2)

    def shifted(m, di, dj):
        s = jnp.roll(m, shift=(-di, -dj), axis=(1, 2))
        ok_i = (jnp.arange(L) + di >= 0) & (jnp.arange(L) + di < L)
        ok_j = (jnp.arange(L) + dj >= 0) & (jnp.arange(L) + dj < L)
        return s & ok_i[None, :, None] & ok_j[None, None, :]

    parallel = (shifted(hb, -1, 0) & shifted(hbT, 1, 0)) | (
        shifted(hbT, 0, -1) & shifted(hb, 0, 1)
    )
    antipar = (hb & hbT) | (shifted(hb, -1, 1) & shifted(hbT, 1, -1))
    far = jnp.abs(jnp.arange(L)[:, None] - jnp.arange(L)[None, :]) > 2
    bridge_map = (parallel | antipar) & far[None]
    bridged = bridge_map.any(axis=2) | bridge_map.any(axis=1)
    # ladder (E) when a sequence neighbor also bridges; else isolated B
    nb = (jnp.pad(bridged[:, :-1], ((0, 0), (1, 0)))
          | jnp.pad(bridged[:, 1:], ((0, 0), (0, 1))))
    strand_e = bridged & nb
    bridge_b = bridged & ~nb

    # hydrogen-bonded turn: residues i+1 .. i+k-1 of any k-turn at i
    turn_t = jnp.zeros((B, L), bool)
    for k, tk in ((3, turn3), (4, turn4), (5, turn5)):
        inner = run_from_starts(jnp.pad(tk[:, : L - 1], ((0, 0), (1, 0))),
                                k - 1)
        turn_t = turn_t | inner

    # bend: virtual-bond angle kappa(CA(i-2), CA(i), CA(i+2)) > 70 degrees
    ca_m2 = jnp.roll(ca, 2, axis=1)
    ca_p2 = jnp.roll(ca, -2, axis=1)
    u = ca_m2 - ca
    v = ca_p2 - ca
    cosang = jnp.sum(u * v, -1) / jnp.sqrt(
        jnp.maximum(jnp.sum(u * u, -1) * jnp.sum(v * v, -1), 1e-12))
    # kappa = pi - angle(u, v); kappa > 70 deg <=> angle < 110 deg
    interior = (jnp.arange(L) >= 2) & (jnp.arange(L) < L - 2)
    bend_s = (cosang > jnp.cos(jnp.deg2rad(110.0))) & interior[None]

    ss = jnp.full((B, L), SS8_COIL, jnp.int32)
    for cls, m in [(SS8_BEND, bend_s), (SS8_TURN, turn_t),
                   (SS8_PI, helix_i), (SS8_310, helix_g),
                   (SS8_BRIDGE, bridge_b), (SS8_STRAND, strand_e),
                   (SS8_HELIX, helix_h)]:
        ss = jnp.where(m, cls, ss)
    return jnp.where(residue_mask, ss, SS8_COIL).astype(jnp.int32)
