"""Backbone idealization: gradient-based geometry regularization.

Post-processes approximate backbones (e.g. the MDS initialization from
ops/reconstruct.py) by minimizing deviation from ideal bond lengths and
angles while restraining coordinates to their input positions — an
optax/jit refinement loop, the TPU-native take on quick structure cleanup.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from protstruc_tpu import geometry as geom
from protstruc_tpu.constants import ideal

__all__ = ["ideality_loss", "idealize_backbone"]


def _sanitize(coords, mask):
    """Swap masked/NaN residues for a fixed non-degenerate dummy backbone.

    Double-where rule (CLAUDE.md): masking loss TERMS by multiplication is
    not enough — NaN-padded or all-zero coordinates make norm/arccos NaN
    (or their backward inf) and 0 * NaN poisons every gradient.  The dummy
    residues (non-collinear atoms, 10 A apart along x) keep every bond and
    angle term well-defined; they carry no dependence on the input, so the
    untaken branch contributes exactly zero gradient.
    """
    L = coords.shape[-3]
    A = coords.shape[-2]
    offs = jnp.asarray(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [1.0, 1.0, 1.0]]
    )[:A]
    dummy = offs[None] + jnp.stack(
        [jnp.arange(L, dtype=coords.dtype) * 10.0,
         jnp.zeros(L, coords.dtype), jnp.zeros(L, coords.dtype)], axis=-1
    )[:, None]
    return jnp.where(mask[..., None, None],
                     jnp.nan_to_num(coords, nan=0.0), dummy)


def ideality_loss(
    coords: jnp.ndarray, mask: jnp.ndarray = None, restraint: jnp.ndarray = None,
    restraint_weight: float = 0.1,
    chain_idx: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Squared deviation from ideal backbone geometry.

    ``coords``: ``(..., L, 4, 3)`` N/CA/C/O (O optional — pass 3 atoms to
    skip the carbonyl term).  Terms: N-CA, CA-C, C-N' bond lengths; N-CA-C,
    CA-C-N', C-N'-CA' angles; optional coordinate restraint.  NaN-padded /
    masked residues are excluded gradient-safely (see ``_sanitize``), and
    ``chain_idx`` drops the cross-residue terms at chain boundaries — the
    peptide-bond restraint must not pull one chain's C-terminus toward the
    next chain's N-terminus.
    """
    finite = jnp.isfinite(coords).all((-1, -2))
    if mask is None:
        mask = finite
    else:
        mask = mask & finite
    coords_s = _sanitize(coords, mask)
    n, ca, c = coords_s[..., 0, :], coords_s[..., 1, :], coords_s[..., 2, :]
    m = mask.astype(coords.dtype)
    pair_m = m[..., :-1] * m[..., 1:]
    if chain_idx is not None:
        same = (chain_idx[..., :-1] == chain_idx[..., 1:])
        pair_m = pair_m * same.astype(coords.dtype)

    def sq(x):
        return x * x

    loss = jnp.sum(m * sq(jnp.linalg.norm(ca - n, axis=-1) - ideal.NA))
    loss += jnp.sum(m * sq(jnp.linalg.norm(c - ca, axis=-1) - ideal.AC))
    loss += jnp.sum(
        pair_m * sq(jnp.linalg.norm(n[..., 1:, :] - c[..., :-1, :], axis=-1) - ideal.C_N)
    )

    loss += jnp.sum(m * sq(geom.angle(n, ca, c) - ideal.NAC))
    # CA-C-N' ~ 116.2 deg, C-N'-CA' ~ 121.7 deg (Engh & Huber)
    loss += jnp.sum(
        pair_m * sq(geom.angle(ca[..., :-1, :], c[..., :-1, :], n[..., 1:, :]) - 2.0281)
    )
    loss += jnp.sum(
        pair_m * sq(geom.angle(c[..., :-1, :], n[..., 1:, :], ca[..., 1:, :]) - 2.1242)
    )

    if coords.shape[-2] >= 4:
        o = coords_s[..., 3, :]
        loss += jnp.sum(m * sq(jnp.linalg.norm(o - c, axis=-1) - ideal.CO))

    if restraint is not None:
        loss += restraint_weight * jnp.sum(
            m[..., None, None]
            * (coords_s - jnp.nan_to_num(restraint, nan=0.0)) ** 2
        )
    return loss


@partial(jax.jit, static_argnames=("n_steps",))
def idealize_backbone(
    coords: jnp.ndarray,
    mask: jnp.ndarray = None,
    n_steps: int = 200,
    lr: float = 1e-2,
    restraint_weight: float = 0.1,
    chain_idx: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Adam-minimize :func:`ideality_loss` with a restraint to the input.

    Returns ``(refined_coords, final_loss)``.  Runs as one ``lax.scan`` —
    the whole refinement is a single compiled program.  Masked / NaN
    residues receive zero gradient and keep their input values (NaN stays
    NaN — the missing-atom convention).
    """
    coords = jnp.asarray(coords, jnp.float32)
    restraint = coords
    tx = optax.adam(lr)

    grad_fn = jax.grad(
        lambda x: ideality_loss(x, mask, restraint, restraint_weight,
                                chain_idx=chain_idx)
    )

    def step(carry, _):
        x, opt_state = carry
        g = tx.update(grad_fn(x), opt_state)
        updates, opt_state = g
        x = optax.apply_updates(x, updates)
        return (x, opt_state), None

    (out, _), _ = jax.lax.scan(step, (coords, tx.init(coords)), None, length=n_steps)
    return out, ideality_loss(out, mask, restraint, restraint_weight,
                              chain_idx=chain_idx)
