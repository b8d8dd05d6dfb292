"""Backbone idealization: gradient-based geometry regularization.

Post-processes approximate backbones (e.g. the MDS initialization from
ops/reconstruct.py) by minimizing deviation from ideal bond lengths and
angles while restraining coordinates to their input positions — an
optax/jit refinement loop, the TPU-native take on quick structure cleanup.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from protstruc_tpu import geometry as geom
from protstruc_tpu.constants import ideal

__all__ = ["ideality_loss", "idealize_backbone"]


def ideality_loss(
    coords: jnp.ndarray, mask: jnp.ndarray = None, restraint: jnp.ndarray = None,
    restraint_weight: float = 0.1,
) -> jnp.ndarray:
    """Squared deviation from ideal backbone geometry.

    ``coords``: ``(..., L, 4, 3)`` N/CA/C/O (O optional — pass 3 atoms to
    skip the carbonyl term).  Terms: N-CA, CA-C, C-N' bond lengths; N-CA-C,
    CA-C-N', C-N'-CA' angles; optional coordinate restraint.
    """
    n, ca, c = coords[..., 0, :], coords[..., 1, :], coords[..., 2, :]
    if mask is None:
        mask = jnp.ones(coords.shape[:-2], bool)
    m = mask.astype(coords.dtype)
    pair_m = (m[..., :-1] * m[..., 1:])

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
        o = coords[..., 3, :]
        loss += jnp.sum(m * sq(jnp.linalg.norm(o - c, axis=-1) - ideal.CO))

    if restraint is not None:
        loss += restraint_weight * jnp.sum(
            m[..., None, None] * (coords - restraint) ** 2
        )
    return loss


@partial(jax.jit, static_argnames=("n_steps",))
def idealize_backbone(
    coords: jnp.ndarray,
    mask: jnp.ndarray = None,
    n_steps: int = 200,
    lr: float = 1e-2,
    restraint_weight: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Adam-minimize :func:`ideality_loss` with a restraint to the input.

    Returns ``(refined_coords, final_loss)``.  Runs as one ``lax.scan`` —
    the whole refinement is a single compiled program.
    """
    coords = jnp.asarray(coords, jnp.float32)
    restraint = coords
    tx = optax.adam(lr)

    grad_fn = jax.grad(
        lambda x: ideality_loss(x, mask, restraint, restraint_weight)
    )

    def step(carry, _):
        x, opt_state = carry
        g = tx.update(grad_fn(x), opt_state)
        updates, opt_state = g
        x = optax.apply_updates(x, updates)
        return (x, opt_state), None

    (out, _), _ = jax.lax.scan(step, (coords, tx.init(coords)), None, length=n_steps)
    return out, ideality_loss(out, mask, restraint, restraint_weight)
