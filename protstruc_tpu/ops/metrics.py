"""Structure comparison metrics: RMSD, superposition, TM-score, GDT.

Standard evaluation utilities the reference leaves to downstream code.
All batched, masked and jit-compatible (static shapes; masks as weights).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from protstruc_tpu import geometry as geom

__all__ = ["rmsd", "superimpose", "tm_score", "gdt_ts", "lddt"]


def _masked_mean(x, w, axis):
    w = w.astype(x.dtype)
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
        a = jnp.einsum("...ij,...nj->...ni", r, a) + t[..., None, :]

    sq = jnp.sum((a - b) ** 2, axis=-1)
    return jnp.sqrt(_masked_mean(sq, mask, axis=-1))


def superimpose(a, b, mask=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Optimally superimpose ``a`` onto ``b``; returns (a_aligned, rmsd)."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    if mask is None:
        mask = jnp.ones(a.shape[:-1], dtype=bool)
    mask = jnp.asarray(mask)
    r, t = geom.masked_kabsch(a, b, mask)
    aligned = jnp.einsum("...ij,...nj->...ni", r, a) + t[..., None, :]
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
        a = jnp.einsum("...ij,...nj->...ni", r, a) + t[..., None, :]

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
        a = jnp.einsum("...ij,...nj->...ni", r, a) + t[..., None, :]

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
