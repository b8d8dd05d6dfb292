"""Surface and compactness analysis: SASA, radius of gyration, contact order.

Device-side Shrake-Rupley solvent-accessible surface area — an analysis the
reference leaves to biotite/external tools entirely.  TPU formulation: test
points for *all* atoms at once (golden-spiral sphere), occlusion accumulated
by scanning over fixed-size occluder chunks (static shapes, O(N^2 P / C)
chunked broadcasts — no neighbor lists, no ragged gathers).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "atom_radii_table",
    "sasa",
    "radius_of_gyration",
    "contact_order",
]

# Van der Waals radii (angstrom) by element, NACCESS/Chothia values.
_VDW = {"C": 1.70, "N": 1.55, "O": 1.52, "S": 1.80}


@lru_cache(maxsize=1)
def atom_radii_table() -> np.ndarray:
    """``(21, 15)`` float32: vdW radius of each heavy-atom slot per residue
    type (0.0 for empty slots), from the vocab heavy-atom layout."""
    from protstruc_tpu.vocab import RESTYPE_HEAVY_ATOMS

    table = np.zeros((21, 15), np.float32)
    for aa, names in RESTYPE_HEAVY_ATOMS.items():
        for slot, name in enumerate(names):
            if name:
                table[int(aa), slot] = _VDW[name[0]]
    return table


@lru_cache(maxsize=8)
def _sphere_points(n: int) -> np.ndarray:
    """``(n, 3)`` roughly uniform unit-sphere points (golden spiral)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5.0**0.5) * i
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
        axis=-1,
    ).astype(np.float32)


def sasa(
    xyz: jnp.ndarray,
    atom_mask: jnp.ndarray,
    seq_idx: jnp.ndarray,
    probe: float = 1.4,
    n_points: int = 92,
    chunk: int = 128,
    per_atom: bool = False,
) -> jnp.ndarray:
    """Shrake-Rupley SASA in A^2.

    Args:
        xyz: ``(B, L, A, 3)`` heavy-atom coordinates (NaN at missing atoms).
        atom_mask: ``(B, L, A)`` bool.
        seq_idx: ``(B, L)`` residue-type indices (UNK=20 gets zero radius ->
            zero area).
        probe: solvent probe radius (water = 1.4 A).
        n_points: test points per atom (92 ~ 2-3% relative error).
        chunk: occluder chunk size for the scan (memory/speed knob).

    Returns per-residue areas ``(B, L)`` (or per-atom ``(B, L, A)``).
    """
    B, L, A, _ = xyz.shape
    N = L * A

    radii_tab = jnp.asarray(atom_radii_table())
    r = radii_tab[jnp.clip(seq_idx, 0, 20)]  # (B, L, A)
    valid = atom_mask & (r > 0.0) & jnp.isfinite(xyz).all(-1)

    x = jnp.nan_to_num(xyz, nan=0.0).reshape(B, N, 3)
    r = r.reshape(B, N)
    valid_f = valid.reshape(B, N)
    # invalid atoms: parked far away so they never occlude, zero radius
    x = jnp.where(valid_f[..., None], x, 1e6)
    r = jnp.where(valid_f, r, 0.0)
    r_ext = r + probe  # expanded radius

    sphere = jnp.asarray(_sphere_points(n_points))  # (P, 3)
    pts = x[:, :, None, :] + r_ext[:, :, None, None] * sphere  # (B, N, P, 3)

    # pad occluders to a chunk multiple
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    xo = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), constant_values=1e6)
    ro = jnp.pad(r_ext, ((0, 0), (0, pad)), constant_values=0.0)
    xo = xo.reshape(B, n_chunks, chunk, 3)
    ro = ro.reshape(B, n_chunks, chunk)
    own = jnp.arange(N)
    occ_idx = jnp.pad(own, (0, pad), constant_values=-1).reshape(n_chunks, chunk)

    def body(buried, c):
        xc, rc, ic = xo[:, c], ro[:, c], occ_idx[c]
        # (B, N, P, C) squared distances from every test point to this chunk
        d2 = jnp.sum(
            (pts[:, :, :, None, :] - xc[:, None, None, :, :]) ** 2, axis=-1
        )
        inside = d2 < (rc[:, None, None, :] ** 2 - 1e-6)
        # an atom never buries its own test points (they lie ON its surface)
        not_self = ic[None, :] != own[:, None]  # (N, C)
        inside &= not_self[None, :, None, :]
        return buried | inside.any(-1), None

    buried = jnp.zeros((B, N, n_points), bool)
    buried, _ = jax.lax.scan(body, buried, jnp.arange(n_chunks))

    frac = 1.0 - jnp.mean(buried.astype(jnp.float32), axis=-1)  # (B, N)
    area = 4.0 * jnp.pi * r_ext**2 * frac * valid_f
    area = area.reshape(B, L, A)
    if per_atom:
        return area
    return jnp.sum(area, axis=-1)


def radius_of_gyration(
    xyz: jnp.ndarray, atom_mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Mass-uniform radius of gyration over valid atoms, ``(B,)``.

    ``xyz``: ``(B, L, A, 3)`` (NaN-safe); ``atom_mask``: ``(B, L, A)``.
    """
    B = xyz.shape[0]
    x = xyz.reshape(B, -1, 3)
    if atom_mask is None:
        m = jnp.isfinite(x).all(-1)
    else:
        m = atom_mask.reshape(B, -1) & jnp.isfinite(x).all(-1)
    x = jnp.nan_to_num(x, nan=0.0)
    w = m.astype(x.dtype)
    denom = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    com = jnp.sum(x * w[..., None], axis=1) / denom[:, None]
    d2 = jnp.sum((x - com[:, None]) ** 2, axis=-1)
    return jnp.sqrt(jnp.sum(d2 * w, axis=1) / denom)


def contact_order(
    ca: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    cutoff: float = 8.0,
    relative: bool = True,
    chain_idx: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(Relative) contact order from CA coordinates ``(B, L, 3)``.

    Mean sequence separation of residue pairs in contact (CA-CA < cutoff,
    |i-j| >= 2), divided by the chain length when ``relative``.  Contact
    order is a single-chain notion (Plaxco et al. 1998): when
    ``chain_idx`` is given, only same-chain pairs count — cross-chain
    |i - j| in a concatenated complex is a flattened-index artifact, not
    a sequence separation — and ``relative`` normalizes each contact by
    its own chain's length (the Plaxco L), so the result is the
    contact-weighted mean of the per-chain relative contact orders rather
    than an understated division by the total complex length.
    """
    B, L, _ = ca.shape
    if mask is None:
        mask = jnp.isfinite(ca).all(-1)
    else:
        mask = mask & jnp.isfinite(ca).all(-1)
    x = jnp.nan_to_num(ca, nan=1e6)

    d = jnp.sqrt(
        jnp.maximum(
            jnp.sum((x[:, :, None] - x[:, None, :]) ** 2, axis=-1), 1e-12
        )
    )
    sep = jnp.abs(jnp.arange(L)[:, None] - jnp.arange(L)[None, :])
    contact = (
        (d < cutoff)
        & (sep[None] >= 2)
        & mask[:, :, None]
        & mask[:, None, :]
    )
    same = None
    if chain_idx is not None:
        same = chain_idx[:, :, None] == chain_idx[:, None, :]
        contact = contact & same
    contact = contact.astype(ca.dtype)

    n_contacts = jnp.maximum(jnp.sum(contact, axis=(1, 2)), 1.0)
    if relative and chain_idx is not None:
        # per-chain Plaxco L: length of the chain residue i belongs to
        chain_len = jnp.maximum(
            jnp.sum(same & mask[:, None, :], axis=-1).astype(ca.dtype), 1.0)
        co = jnp.sum(contact * (sep[None] / chain_len[:, :, None]),
                     axis=(1, 2)) / n_contacts
    else:
        co = jnp.sum(contact * sep[None], axis=(1, 2)) / n_contacts
        if relative:
            n = jnp.maximum(jnp.sum(mask, axis=1).astype(ca.dtype), 1.0)
            co = co / n
    return co
