"""Structure comparison metrics: RMSD, superposition, TM-score, GDT.

Standard evaluation utilities the reference leaves to downstream code.
All batched, masked and jit-compatible (static shapes; masks as weights).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from protstruc_tpu import geometry as geom

__all__ = ["rmsd", "superimpose", "tm_score", "gdt_ts", "lddt",
           "fnat", "interface_rmsd", "dockq", "capri_band"]


def _masked_mean(x, w, axis):
    # double-where, not x*w: NaN residuals at masked positions (the
    # library's NaN-for-missing-atoms convention, CLAUDE.md) would poison
    # the sum via NaN * 0 = NaN even though every NaN entry is masked out
    w = w.astype(x.dtype)
    x = jnp.where(w > 0, x, 0.0)
    return jnp.sum(x * w, axis=axis) / jnp.maximum(jnp.sum(w, axis=axis), 1.0)


def rmsd(a, b, mask=None, align: bool = True) -> jnp.ndarray:
    """Root-mean-square deviation between point sets ``(..., n, 3)``.

    With ``align=True`` (default) an optimal mask-weighted Kabsch
    superposition of ``a`` onto ``b`` is applied first.

    Returns ``(...,)``.
    """
    a, b = jnp.asarray(a), jnp.asarray(b)
    if mask is None:
        mask = jnp.ones(a.shape[:-1], dtype=bool)
    mask = jnp.asarray(mask)

    if align:
        r, t = geom.masked_kabsch(a, b, mask)
        a = jnp.einsum("...ij,...nj->...ni", r, a,
                       precision="highest") + t[..., None, :]

    sq = jnp.sum((a - b) ** 2, axis=-1)
    return jnp.sqrt(_masked_mean(sq, mask, axis=-1))


def superimpose(a, b, mask=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Optimally superimpose ``a`` onto ``b``; returns (a_aligned, rmsd)."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    if mask is None:
        mask = jnp.ones(a.shape[:-1], dtype=bool)
    mask = jnp.asarray(mask)
    r, t = geom.masked_kabsch(a, b, mask)
    aligned = jnp.einsum("...ij,...nj->...ni", r, a,
                         precision="highest") + t[..., None, :]
    sq = jnp.sum((aligned - b) ** 2, axis=-1)
    return aligned, jnp.sqrt(_masked_mean(sq, mask, axis=-1))


def tm_score(a, b, mask=None, align: bool = True,
             l_target: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """TM-score of ``a`` vs ``b`` over CA point sets ``(..., n, 3)``.

    ``TM = mean_i 1 / (1 + (d_i / d0)^2)`` with
    ``d0 = 1.24 (L - 15)^(1/3) - 1.8`` (Zhang & Skolnick 2004), over valid
    residues.  ``l_target`` overrides the normalization length (defaults to
    the masked count).
    """
    a, b = jnp.asarray(a), jnp.asarray(b)
    if mask is None:
        mask = jnp.ones(a.shape[:-1], dtype=bool)
    mask = jnp.asarray(mask)

    if align:
        r, t = geom.masked_kabsch(a, b, mask)
        a = jnp.einsum("...ij,...nj->...ni", r, a,
                       precision="highest") + t[..., None, :]

    n = jnp.sum(mask, axis=-1).astype(a.dtype) if l_target is None else l_target
    d0 = 1.24 * jnp.cbrt(jnp.maximum(n - 15.0, 1.0)) - 1.8
    d0 = jnp.maximum(d0, 0.5)

    d2 = jnp.sum((a - b) ** 2, axis=-1)
    score = 1.0 / (1.0 + d2 / (d0[..., None] ** 2))
    return _masked_mean(score, mask, axis=-1)


def gdt_ts(a, b, mask=None, align: bool = True) -> jnp.ndarray:
    """GDT-TS: mean fraction of residues within 1/2/4/8 A after superposition."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    if mask is None:
        mask = jnp.ones(a.shape[:-1], dtype=bool)
    mask = jnp.asarray(mask)

    if align:
        r, t = geom.masked_kabsch(a, b, mask)
        a = jnp.einsum("...ij,...nj->...ni", r, a,
                       precision="highest") + t[..., None, :]

    d = jnp.sqrt(jnp.sum((a - b) ** 2, axis=-1))
    fracs = [
        _masked_mean((d < c).astype(a.dtype), mask, axis=-1)
        for c in (1.0, 2.0, 4.0, 8.0)
    ]
    return sum(fracs) / 4.0


def lddt(
    pred,
    ref,
    mask=None,
    cutoff: float = 15.0,
    thresholds=(0.5, 1.0, 2.0, 4.0),
    per_residue: bool = False,
) -> jnp.ndarray:
    """lDDT over CA point sets ``(..., n, 3)`` — superposition-free.

    Local Distance Difference Test (Mariani et al. 2013): over all residue
    pairs whose *reference* distance is below ``cutoff`` (excluding self),
    the mean fraction of pairwise distances preserved within each threshold.
    All-pairs broadcast, no alignment step — vmaps/shards over leading dims.

    Returns ``(...,)``, or ``(..., n)`` with ``per_residue=True``.
    """
    pred, ref = jnp.asarray(pred), jnp.asarray(ref)
    if mask is None:
        mask = jnp.ones(pred.shape[:-1], dtype=bool)
    mask = jnp.asarray(mask)

    def pdist(x):
        d2 = jnp.sum(
            (x[..., :, None, :] - x[..., None, :, :]) ** 2, axis=-1
        )
        return jnp.sqrt(jnp.maximum(d2, 1e-12))

    d_ref = pdist(ref)
    d_pred = pdist(pred)

    n = pred.shape[-2]
    eye = jnp.eye(n, dtype=bool)
    incl = (
        (d_ref < cutoff)
        & ~eye
        & mask[..., :, None]
        & mask[..., None, :]
    ).astype(pred.dtype)

    diff = jnp.abs(d_ref - d_pred)
    preserved = sum((diff < t).astype(pred.dtype) for t in thresholds) / len(
        thresholds
    )

    if per_residue:
        return jnp.sum(preserved * incl, axis=-1) / jnp.maximum(
            jnp.sum(incl, axis=-1), 1.0
        )
    return jnp.sum(preserved * incl, axis=(-2, -1)) / jnp.maximum(
        jnp.sum(incl, axis=(-2, -1)), 1.0
    )


# ---------------------------------------------------------------------------
# complex (docking) evaluation: DockQ components
# ---------------------------------------------------------------------------


def _min_interchain_dist(xyz, atom_mask, rec_mask, lig_mask,
                         row_block: int = 32):
    """Per residue-pair minimum heavy-atom distance between the two groups.

    ``xyz (B, L, A, 3)`` -> ``(B, L, L)`` with +inf where either residue is
    outside its group or atoms are missing.

    Never materializes the ``(B, L, L, A, A)`` tensor (the library-wide
    design rule, batch.py): rows are processed in blocks of ``row_block``
    with an ``lax.fori_loop`` over the i-side atom slot, so peak memory is
    O(B * row_block * L * A) — 225x below the naive form at A=15.
    """
    from jax import lax

    ok = atom_mask & jnp.isfinite(xyz).all(-1)
    x = jnp.nan_to_num(xyz, nan=0.0)
    B, L, A = x.shape[:3]
    nb = -(-L // row_block)
    pad = nb * row_block - L
    # padded rows carry ok=False -> +inf rows, sliced off at the end
    x_p = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
    ok_p = jnp.pad(ok, ((0, 0), (0, pad), (0, 0)))
    x_r = x_p.reshape(B, nb, row_block, A, 3).transpose(1, 0, 2, 3, 4)
    ok_r = ok_p.reshape(B, nb, row_block, A).transpose(1, 0, 2, 3)

    def one_block(args):
        xi, oki = args  # (B, blk, A, 3), (B, blk, A)

        def body(a, acc):
            xa = xi[:, :, a]  # (B, blk, 3)
            d2 = jnp.sum(
                (xa[:, :, None, None, :] - x[:, None, :, :, :]) ** 2,
                axis=-1)  # (B, blk, L, A)
            # pairs where either atom is missing are no contact (masking
            # the pair, not parking coordinates — two parked atoms would
            # sit 0 A apart)
            pair_ok = oki[:, :, a][:, :, None, None] & ok[:, None, :, :]
            d2 = jnp.where(pair_ok, d2, jnp.inf)
            return jnp.minimum(acc, jnp.min(d2, axis=-1))

        acc0 = jnp.full((B, xi.shape[1], L), jnp.inf, x.dtype)
        return lax.fori_loop(0, A, body, acc0)

    d2_min = lax.map(one_block, (x_r, ok_r))  # (nb, B, blk, L)
    d2_min = d2_min.transpose(1, 0, 2, 3).reshape(B, nb * row_block, L)[:, :L]
    d = jnp.sqrt(d2_min)
    pair_ok = rec_mask[:, :, None] & lig_mask[:, None, :]
    return jnp.where(pair_ok, d, jnp.inf)


def fnat(model_xyz, native_xyz, atom_mask, rec_mask, lig_mask,
         cutoff: float = 5.0, d_nat=None, d_mod=None) -> jnp.ndarray:
    """Fraction of native inter-chain contacts preserved in the model.

    A contact is a receptor-ligand residue pair with any heavy-atom pair
    within ``cutoff`` A (the DockQ definition).  Returns ``(B,)``.
    ``d_nat``/``d_mod``: optional precomputed min-interchain distance maps
    (dockq() shares one computation across its components).
    """
    if d_nat is None:
        d_nat = _min_interchain_dist(native_xyz, atom_mask, rec_mask,
                                     lig_mask)
    if d_mod is None:
        d_mod = _min_interchain_dist(model_xyz, atom_mask, rec_mask,
                                     lig_mask)
    native_contacts = d_nat < cutoff
    kept = native_contacts & (d_mod < cutoff)
    n = jnp.maximum(jnp.sum(native_contacts, axis=(1, 2)), 1)
    return jnp.sum(kept, axis=(1, 2)) / n


def interface_rmsd(model_xyz, native_xyz, atom_mask, rec_mask, lig_mask,
                   cutoff: float = 10.0, d_nat=None) -> jnp.ndarray:
    """Backbone RMSD over native-interface residues after superposition.

    Interface = residues of either group with any heavy atom within
    ``cutoff`` A of the other group in the *native* structure (DockQ
    definition); RMSD over their N/CA/C/O atoms after mask-weighted Kabsch
    on the same set.  Returns ``(B,)``.
    """
    if d_nat is None:
        d_nat = _min_interchain_dist(native_xyz, atom_mask, rec_mask,
                                     lig_mask)
    contact = d_nat < cutoff
    iface = (
        (contact.any(axis=2) & rec_mask)
        | (contact.any(axis=1) & lig_mask)
    )  # (B, L)

    bb_ok = (
        atom_mask[:, :, :4]
        & jnp.isfinite(native_xyz[:, :, :4]).all(-1)
        & jnp.isfinite(model_xyz[:, :, :4]).all(-1)
    )
    w = (iface[:, :, None] & bb_ok)  # (B, L, 4)
    B, L = iface.shape
    a = jnp.nan_to_num(model_xyz[:, :, :4], nan=0.0).reshape(B, L * 4, 3)
    b = jnp.nan_to_num(native_xyz[:, :, :4], nan=0.0).reshape(B, L * 4, 3)
    return rmsd(a, b, mask=w.reshape(B, L * 4), align=True)


def dockq(model_xyz, native_xyz, atom_mask, rec_mask, lig_mask) -> jnp.ndarray:
    """DockQ score (Basu & Wallner 2016), ``(B,)`` in [0, 1].

    ``DockQ = (fnat + 1/(1+(iRMS/1.5)^2) + 1/(1+(LRMS/8.5)^2)) / 3`` with
    LRMS the ligand backbone RMSD after superposition on the receptor
    backbone.  Quality bands: >0.23 acceptable, >0.49 medium, >0.80 high.
    """
    # one min-interchain distance map per structure, shared by fnat and
    # the interface definition (was recomputed 3x)
    d_nat = _min_interchain_dist(native_xyz, atom_mask, rec_mask, lig_mask)
    d_mod = _min_interchain_dist(model_xyz, atom_mask, rec_mask, lig_mask)
    f = fnat(model_xyz, native_xyz, atom_mask, rec_mask, lig_mask,
             d_nat=d_nat, d_mod=d_mod)
    irms = interface_rmsd(model_xyz, native_xyz, atom_mask, rec_mask,
                          lig_mask, d_nat=d_nat)

    # LRMS: superpose on receptor backbone, measure ligand backbone
    B, L = rec_mask.shape
    bb_ok = (
        atom_mask[:, :, :4]
        & jnp.isfinite(native_xyz[:, :, :4]).all(-1)
        & jnp.isfinite(model_xyz[:, :, :4]).all(-1)
    )
    a = jnp.nan_to_num(model_xyz[:, :, :4], nan=0.0).reshape(B, L * 4, 3)
    b = jnp.nan_to_num(native_xyz[:, :, :4], nan=0.0).reshape(B, L * 4, 3)
    w_rec = (rec_mask[:, :, None] & bb_ok).reshape(B, L * 4)
    w_lig = (lig_mask[:, :, None] & bb_ok).reshape(B, L * 4)

    r, t = geom.masked_kabsch(a, b, w_rec)
    a_sup = jnp.einsum("...ij,...nj->...ni", r, a,
                       precision="highest") + t[..., None, :]
    sq = jnp.sum((a_sup - b) ** 2, axis=-1)
    lrms = jnp.sqrt(_masked_mean(sq, w_lig, axis=-1))

    return (
        f
        + 1.0 / (1.0 + (irms / 1.5) ** 2)
        + 1.0 / (1.0 + (lrms / 8.5) ** 2)
    ) / 3.0


def capri_band(q: float) -> str:
    """CAPRI quality band for a DockQ score (Basu & Wallner 2016, Table 1).

    Boundary values land in the UPPER band:
    incorrect < 0.23 <= acceptable < 0.49 <= medium < 0.80 <= high.
    """
    return ("high" if q >= 0.80 else
            "medium" if q >= 0.49 else
            "acceptable" if q >= 0.23 else "incorrect")
