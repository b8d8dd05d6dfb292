"""Structure reconstruction from inter-residue geometry (trRosetta decode).

A *correct*, jit-compatible rebuild of the reference's reconstruction path —
which is broken as written (numpy-isms on torch tensors at
geometry.py:325,330; its tests are skipped, test_geometry.py:193-232):

1. ``reconstruct_backbone_distmat_from_interresidue_geometry`` places every
   residue j's N/CA/C/CB in residue i's ideal local frame from the
   (d_cb, omega, theta, phi) maps, assembles a ``(3, 3, L, L)`` backbone
   distance tensor, pins intra-residue/adjacent bond distances to ideal
   values, and fills masked entries by min-plus (tropical) Floyd-Warshall
   relaxation over the ``(3L, 3L)`` matrix under ``lax.scan``
   (cf. geometry.py:229-347).
2. ``initialize_backbone_with_mds`` embeds the distance matrix into 3D.  The
   reference shells out to sklearn SMACOF (host-only, geometry.py:364-365);
   here classical MDS runs on device (double-centered Gram matrix + eigh)
   followed by optional SMACOF refinement iterations in pure jnp, then
   chirality fixing and ideal O/CB placement.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from protstruc_tpu import geometry as geom
from protstruc_tpu.constants import ideal

__all__ = [
    "MASK_DIST",
    "reconstruct_backbone_distmat_from_interresidue_geometry",
    "classical_mds",
    "smacof_refine",
    "initialize_backbone_with_mds",
]

#: Sentinel distance for unknown entries, replaced by shortest-path
#: relaxation (reference value, geometry.py:21).
MASK_DIST = 12345679.0

_N, _CA, _C, _CB = 0, 1, 2, 3


def _floyd_warshall_minplus(d: jnp.ndarray) -> jnp.ndarray:
    """All-pairs shortest paths by node relaxation under lax.scan. d: (n, n)."""

    def relax(dist, k):
        row = jax.lax.dynamic_slice_in_dim(dist, k, 1, axis=0)  # (1, n)
        col = jax.lax.dynamic_slice_in_dim(dist, k, 1, axis=1)  # (n, 1)
        return jnp.minimum(dist, col + row), None

    n = d.shape[0]
    out, _ = jax.lax.scan(relax, d, jnp.arange(n))
    return out


def reconstruct_backbone_distmat_from_interresidue_geometry(
    d_cb: jnp.ndarray,
    omega: jnp.ndarray,
    theta: jnp.ndarray,
    phi: jnp.ndarray,
    mask: jnp.ndarray = None,
    chain_breaks=None,
    chain_break_mask: jnp.ndarray = None,
    n_relax_sweeps: int = 1,
) -> jnp.ndarray:
    """See :func:`_reconstruct_distmat`; accepts the reference's
    ``chain_breaks`` index list (geometry.py:249-251) or the static-shape
    ``chain_break_mask`` boolean form."""
    if chain_breaks is not None:
        if chain_break_mask is not None:
            raise ValueError("pass chain_breaks or chain_break_mask, not both")
        L = d_cb.shape[-1]
        import numpy as np

        cbm = np.zeros(L - 1, dtype=bool)
        cbm[np.asarray(list(chain_breaks), dtype=int)] = True
        chain_break_mask = jnp.asarray(cbm)
    return _reconstruct_distmat(
        d_cb, omega, theta, phi, mask, chain_break_mask, n_relax_sweeps
    )


@partial(jax.jit, static_argnames=("n_relax_sweeps",))
def _reconstruct_distmat(
    d_cb: jnp.ndarray,
    omega: jnp.ndarray,
    theta: jnp.ndarray,
    phi: jnp.ndarray,
    mask: jnp.ndarray = None,
    chain_break_mask: jnp.ndarray = None,
    n_relax_sweeps: int = 1,
) -> jnp.ndarray:
    """Backbone N/CA/C distance tensor from trRosetta 6D maps.

    Args:
        d_cb: ``(L, L)`` CB-CB distances.
        omega: ``(L, L)`` CA-CB-CB'-CA' dihedrals.
        theta: ``(L, L)`` N-CA-CB-CB' dihedrals.
        phi: ``(L, L)`` CA-CB-CB' planar angles.
        mask: optional ``(L, L)`` bool of reconstructable pairs; invalid
            entries are filled via shortest-path relaxation.
        chain_break_mask: optional ``(L-1,)`` bool, True where residue i and
            i+1 are NOT peptide-bonded (static-shape replacement for the
            reference's ``chain_breaks`` index list, geometry.py:312-315).
        n_relax_sweeps: number of full Floyd-Warshall sweeps (1 is exact).

    Returns: ``(3, 3, L, L)`` where ``out[ai, aj, i, j]`` is the distance
    between atom ``ai`` of residue i and atom ``aj`` of residue j
    (atom order N, CA, C).
    """
    L = d_cb.shape[-1]
    x = geom.ideal_local_frame()[:, None, None, :]  # (4, 1, 1, 3) N/CA/C/CB

    d_cb_ = d_cb[..., None]
    angle_abb = phi[..., None]
    angle_bba = jnp.swapaxes(phi, -1, -2)[..., None]
    dih_nabb = theta[..., None]
    dih_bban = jnp.swapaxes(theta, -1, -2)[..., None]
    dih_abba = omega[..., None]

    # place residue j's atoms in residue i's local frame (geometry.py:273-284)
    y_cb = geom.place_fourth_atom(x[_N], x[_CA], x[_CB], d_cb_, angle_abb, dih_nabb)
    y_ca = geom.place_fourth_atom(x[_CA], x[_CB], y_cb, ideal.BA, angle_bba, dih_abba)
    y_n = geom.place_fourth_atom(x[_CB], y_cb, y_ca, ideal.AN, ideal.BAN, dih_bban)
    y_c = geom.place_fourth_atom(y_cb, y_ca, y_n, ideal.NC, ideal.ANC, ideal.BANC)

    y = jnp.stack([y_n, y_ca, y_c])  # (3, L, L, 3)
    dist = jnp.linalg.norm(x[:3][:, None] - y[None], axis=-1)  # (3, 3, L, L)

    # Mask unknown pairs FIRST, then pin ideal intra-residue and peptide-bond
    # distances.  (The reference masks after pinning, geometry.py:303-321,
    # which disconnects residues without CB — e.g. glycines — from the atom
    # graph entirely, leaving sentinel distances that Floyd-Warshall can
    # never fill.  Pinning after masking keeps the chain connected so every
    # masked entry is reachable; documented divergence/fix.)
    if mask is not None:
        dist = jnp.where(mask[None, None], dist, MASK_DIST)
    dist = jnp.nan_to_num(dist, nan=MASK_DIST)

    # pin the diagonal to ideal intra-residue distances (geometry.py:294-310)
    eye = jnp.eye(L, dtype=bool)
    atoms = ["N", "A", "C"]
    for ai in range(3):
        for aj in range(3):
            val = 0.0 if ai == aj else ideal.as_dict[f"{atoms[ai]}{atoms[aj]}"]
            dist = dist.at[ai, aj].set(jnp.where(eye, val, dist[ai, aj]))
    dist = dist.at[_N, _CA].set(jnp.where(eye, ideal.NA, dist[_N, _CA]))
    dist = dist.at[_CA, _N].set(jnp.where(eye, ideal.NA, dist[_CA, _N]))
    dist = dist.at[_CA, _C].set(jnp.where(eye, ideal.AC, dist[_CA, _C]))
    dist = dist.at[_C, _CA].set(jnp.where(eye, ideal.AC, dist[_C, _CA]))

    # peptide bonds C_i - N_{i+1} (geometry.py:309-315)
    off = jnp.eye(L, k=1, dtype=bool)
    bond = jnp.full((L, L), ideal.C_N)
    if chain_break_mask is not None:
        brk = jnp.zeros((L, L)).at[jnp.arange(L - 1), jnp.arange(1, L)].set(
            jnp.asarray(chain_break_mask, dtype=jnp.float32)
        )
        bond = jnp.where(brk > 0, MASK_DIST, bond)
    dist = dist.at[_C, _N].set(jnp.where(off, bond, dist[_C, _N]))
    dist = dist.at[_N, _C].set(jnp.where(off.T, bond.T, dist[_N, _C]))

    # min-plus relaxation over the (3L, 3L) atom graph (geometry.py:323-330)
    flat = jnp.transpose(dist, (0, 2, 1, 3)).reshape(3 * L, 3 * L)
    for _ in range(n_relax_sweeps):
        flat = _floyd_warshall_minplus(flat)
    flat = (flat + flat.T) / 2.0  # symmetrize (geometry.py:333)

    dist = jnp.transpose(flat.reshape(3, L, 3, L), (0, 2, 1, 3))

    # re-pin ideal bonds after relaxation (geometry.py:337-345).  Note this
    # re-pins C-N at chain breaks too — matching the reference, whose final
    # re-pin also overrides its own break sentinel; the break still matters
    # because the relaxation above could not tunnel through it.
    dist = dist.at[_N, _CA].set(jnp.where(eye, ideal.NA, dist[_N, _CA]))
    dist = dist.at[_CA, _N].set(jnp.where(eye, ideal.NA, dist[_CA, _N]))
    dist = dist.at[_CA, _C].set(jnp.where(eye, ideal.AC, dist[_CA, _C]))
    dist = dist.at[_C, _CA].set(jnp.where(eye, ideal.AC, dist[_C, _CA]))
    dist = dist.at[_C, _N].set(jnp.where(off, ideal.C_N, dist[_C, _N]))
    dist = dist.at[_N, _C].set(jnp.where(off.T, ideal.C_N, dist[_N, _C]))
    return dist


def classical_mds(dist: jnp.ndarray, out_dim: int = 3) -> jnp.ndarray:
    """Classical (Torgerson) MDS embedding via eigh — TPU-friendly.

    ``dist``: ``(n, n)`` dissimilarities.  Returns ``(n, out_dim)``.
    """
    n = dist.shape[0]
    d2 = dist**2
    j = jnp.eye(n) - jnp.full((n, n), 1.0 / n)
    b = -0.5 * jnp.matmul(jnp.matmul(j, d2, precision="highest"), j,
                          precision="highest")
    w, v = jnp.linalg.eigh(b)  # ascending
    top = jnp.arange(n - out_dim, n)
    scales = jnp.sqrt(jnp.clip(w[top], 0.0))
    coords = v[:, top] * scales[None, :]
    return coords[:, ::-1]  # largest eigenvalue first


def smacof_refine(
    dist: jnp.ndarray, coords: jnp.ndarray, n_iter: int = 50
) -> jnp.ndarray:
    """SMACOF stress-majorization refinement under lax.scan.

    Matches the spirit of sklearn's MDS used by the reference
    (geometry.py:364-365) but runs on device with static shapes.
    """
    n = dist.shape[0]

    def step(x, _):
        diff = x[:, None, :] - x[None, :, :]
        cur = jnp.linalg.norm(diff, axis=-1)
        cur = jnp.where(cur < 1e-8, 1e-8, cur)
        ratio = dist / cur
        b = -ratio
        b = b + jnp.diag(-jnp.sum(b, axis=1))
        x_new = jnp.matmul(b, x, precision="highest") / n
        return x_new, None

    out, _ = jax.lax.scan(step, coords, None, length=n_iter)
    return out


@partial(jax.jit, static_argnames=("max_iter",))
def initialize_backbone_with_mds(dist_mat: jnp.ndarray, max_iter: int = 500) -> jnp.ndarray:
    """Embed a ``(3, 3, L, L)`` backbone distance tensor into 3D coordinates.

    Classical MDS + SMACOF refinement, chirality fix, then ideal O and CB
    placement.  Returns ``(5, L, 3)`` in atom order N, CA, C, O, CB
    (parity with geometry.py:350-386).
    """
    L = dist_mat.shape[-1]
    pdist = jnp.transpose(dist_mat, (0, 2, 1, 3)).reshape(3 * L, 3 * L)

    coords = classical_mds(pdist, 3)
    if max_iter > 0:
        coords = smacof_refine(pdist, coords, n_iter=max_iter)
    coords = coords.reshape(3, L, 3)
    coords = geom.fix_chirality(coords)

    cb = geom.place_fourth_atom(
        coords[_C], coords[_N], coords[_CA], ideal.AB, ideal.NAB, ideal.BANC
    )[None]
    # 🔧 reference bug FIXED (geometry.py:376 rolls N so the LAST residue's
    # carbonyl dihedral references residue 0's N — an arbitrary atom across
    # the structure): ideal_carbonyl_oxygen gives the terminal residue an
    # ideal-psi placement instead
    o = geom.ideal_carbonyl_oxygen(coords[_N], coords[_CA], coords[_C])[None]

    return jnp.concatenate([coords, o, cb], axis=0)
