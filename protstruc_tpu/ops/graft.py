"""Sidechain grafting: build all-atom structures from backbones + sequence.

The missing stage between backbone generation / sequence design and
packing: given only N/CA/C (+O/CB) coordinates and a target sequence,
place full sidechains by grafting template conformations expressed in each
residue's local backbone frame — a minimal on-the-fly rotamer library.
Combined with :func:`~protstruc_tpu.ops.pack.pack_sidechains` (chi-space
clash relief) this yields a complete, TPU-resident design pipeline:
frames -> sequence -> all-atom -> repack (examples/design_pipeline.py).

The default library is extracted from any reference StructureBatch (one
complete instance per residue type, local-frame coordinates); ships with
no hardcoded rotamer tables.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from protstruc_tpu import geometry as geom

__all__ = ["sidechain_library", "build_sidechains"]


def sidechain_library(batch) -> Tuple[np.ndarray, np.ndarray]:
    """Extract per-residue-type template sidechains from a StructureBatch.

    For each of the 20 standard residue types, takes the first instance
    with a complete heavy-atom set and stores its atoms in the residue's
    local backbone frame (``R^T (x - CA)`` with ``R = gram_schmidt(N, CA,
    C)``).  Returns ``(library (21, 15, 3) float32, lib_mask (21, 15)
    bool)`` — NumPy, host-side, computed once.
    """
    from protstruc_tpu.vocab import AA, RESTYPE_HEAVY_ATOMS

    xyz = np.asarray(batch.xyz)
    am = np.asarray(batch.atom_mask)
    seq = np.asarray(batch.get_seq_idx())

    lib = np.zeros((21, 15, 3), np.float32)
    lib_mask = np.zeros((21, 15), bool)

    for aa in range(20):
        names = RESTYPE_HEAVY_ATOMS[AA(aa)]
        want = np.array([bool(n) and n != "OXT" for n in names])
        rows = np.argwhere(seq == aa)
        for b, l in rows:
            have = am[b, l] & np.isfinite(xyz[b, l]).all(-1)
            if not (have >= want).all() or not have[:3].all():
                continue
            r = np.asarray(
                geom.gram_schmidt(xyz[b, l, 0], xyz[b, l, 1], xyz[b, l, 2])
            )
            local = (xyz[b, l] - xyz[b, l, 1]) @ r  # R^T (x - CA), row form
            lib[aa] = np.nan_to_num(local)
            lib_mask[aa] = want
            break
    return lib, lib_mask


def build_sidechains(
    backbone_xyz: jnp.ndarray,
    seq_idx: jnp.ndarray,
    library: Tuple[np.ndarray, np.ndarray],
    residue_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Place template sidechains onto backbone frames.

    Args:
        backbone_xyz: ``(B, L, >=3, 3)`` with slots 0/1/2 = N/CA/C (extra
            given slots — O, CB — are kept as provided when finite).
        seq_idx: ``(B, L)`` target residue types.
        library: output of :func:`sidechain_library`.
        residue_mask: ``(B, L)`` valid residues.

    Returns ``(xyz (B, L, 15, 3), atom_mask (B, L, 15))`` — given backbone
    atoms preserved, remaining slots grafted from the library in each
    residue's ``gram_schmidt(N, CA, C)`` frame (NaN where the library has
    no template or the residue is invalid).
    """
    lib, lib_mask = library
    lib = jnp.asarray(lib)
    lib_mask_j = jnp.asarray(lib_mask)

    B, L = seq_idx.shape
    aa = jnp.clip(seq_idx, 0, 20)

    r = geom.gram_schmidt(
        backbone_xyz[:, :, 0], backbone_xyz[:, :, 1], backbone_xyz[:, :, 2]
    )  # (B, L, 3, 3)
    ca = backbone_xyz[:, :, 1]

    local = lib[aa]          # (B, L, 15, 3)
    placed = jnp.einsum("blij,blaj->blai", r, local,
                        precision="highest") + ca[:, :, None]
    mask = lib_mask_j[aa]    # (B, L, 15)

    if residue_mask is not None:
        mask = mask & residue_mask[..., None]

    out = jnp.where(mask[..., None], placed, jnp.nan)
    # keep any provided backbone slots verbatim (N/CA/C and O/CB if given)
    n_given = backbone_xyz.shape[2]
    given = jnp.isfinite(backbone_xyz).all(-1)  # (B, L, n_given)
    out = out.at[:, :, :n_given].set(
        jnp.where(given[..., None], backbone_xyz, out[:, :, :n_given])
    )
    mask = mask.at[:, :, :n_given].set(mask[:, :, :n_given] | given)
    if residue_mask is not None:
        mask = mask & residue_mask[..., None]
    # invariant: mask True => atom exists (finite).  An incomplete
    # backbone frame (missing N/CA/C) makes gram_schmidt NaN and every
    # placed atom NaN — those slots must drop out of the mask, or the
    # writer emits 'nan' coordinate fields into the PDB
    mask = mask & jnp.isfinite(out).all(-1)
    out = jnp.where(mask[..., None], out, jnp.nan)
    return out, mask
