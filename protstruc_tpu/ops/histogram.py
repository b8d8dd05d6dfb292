"""Distance binning, contact maps and pair-distance histograms.

Distogram utilities shared by models (classification targets/embeddings)
plus CADISHI-style particle-pair distance histograms computed with
bin-sweep reductions: no (B, L, L, n_bins) one-hot tensor is ever
materialized, so the op runs at pair-map scale on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["distogram_bins", "contact_map", "distance_histogram"]


@partial(jax.jit, static_argnames=("n_bins",))
def distogram_bins(
    d: jnp.ndarray, n_bins: int = 36, max_dist: float = 20.0
) -> jnp.ndarray:
    """Uniform distance binning ``[0, max_dist) -> {0..n_bins-1}``.

    NaN distances (missing atoms) land in the last bin, matching the
    convention used by TrFold's distogram head.
    """
    d = jnp.nan_to_num(d, nan=max_dist)
    return jnp.clip((d / max_dist * n_bins).astype(jnp.int32), 0, n_bins - 1)


def contact_map(
    d: jnp.ndarray, mask: Optional[jnp.ndarray] = None, cutoff: float = 8.0
) -> jnp.ndarray:
    """Boolean contact map ``d < cutoff`` (NaN-safe), optionally masked."""
    c = jnp.nan_to_num(d, nan=jnp.inf) < cutoff
    if mask is not None:
        c = c & mask
    return c


@partial(jax.jit, static_argnames=("n_bins",))
def distance_histogram(
    d: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    n_bins: int = 64,
    max_dist: float = 32.0,
) -> jnp.ndarray:
    """Per-structure histogram of pair distances. ``(B, L, L) -> (B, n_bins)``.

    Bin b counts pairs with ``d in [b*w, (b+1)*w)``, ``w = max_dist/n_bins``;
    out-of-range and NaN pairs are dropped.  Computed as a static sweep of
    masked reductions (one pass per bin) — O(n_bins * L^2) VPU work, O(L^2)
    memory.
    """
    d = jnp.asarray(d)
    valid = jnp.isfinite(d) & (d >= 0) & (d < max_dist)
    if mask is not None:
        valid = valid & mask

    idx = jnp.where(valid, (d / max_dist * n_bins).astype(jnp.int32), -1)

    def count(b):
        return jnp.sum((idx == b).astype(jnp.int32), axis=(1, 2))

    return jnp.stack([count(b) for b in range(n_bins)], axis=-1)
