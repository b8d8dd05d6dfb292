"""Rigid-transform utilities: quaternions, rotations, frame algebra.

Building blocks for frame-based models (AlphaFold-style rigids, FrameDiff
diffusion over SE(3)).  All functions are vmap-first over leading dims and
jit-safe; rotations are (..., 3, 3) column-basis matrices consistent with
geometry.gram_schmidt.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "quat_to_rot",
    "rot_to_quat",
    "random_rotations",
    "frame_compose",
    "frame_invert",
    "frame_apply",
    "rotation_angle",
]


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) ``(..., 4)`` -> rotation matrix ``(..., 3, 3)``."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rot_to_quat(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix ``(..., 3, 3)`` -> unit quaternion (w, x, y, z).

    Branch-free Shepperd-style extraction: all four candidate quaternions
    are computed and the best-conditioned (largest denominator) selected —
    plays nicely with vmap/jit.
    """
    m = r
    t = jnp.trace(m, axis1=-2, axis2=-1)

    def q_from(w2, xw, yw, zw):
        return jnp.stack([w2, xw, yw, zw], axis=-1)

    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    q0 = q_from(
        1 + t,
        m[..., 2, 1] - m[..., 1, 2],
        m[..., 0, 2] - m[..., 2, 0],
        m[..., 1, 0] - m[..., 0, 1],
    )
    q1 = q_from(
        m[..., 2, 1] - m[..., 1, 2],
        1 + m00 - m11 - m22,
        m[..., 0, 1] + m[..., 1, 0],
        m[..., 0, 2] + m[..., 2, 0],
    )
    q2 = q_from(
        m[..., 0, 2] - m[..., 2, 0],
        m[..., 0, 1] + m[..., 1, 0],
        1 - m00 + m11 - m22,
        m[..., 1, 2] + m[..., 2, 1],
    )
    q3 = q_from(
        m[..., 1, 0] - m[..., 0, 1],
        m[..., 0, 2] + m[..., 2, 0],
        m[..., 1, 2] + m[..., 2, 1],
        1 - m00 - m11 + m22,
    )
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    norms = jnp.stack(
        [1 + t, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22, 1 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(norms, axis=-1)
    q = jnp.take_along_axis(qs, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def random_rotations(key: jax.Array, shape: Tuple[int, ...] = ()) -> jnp.ndarray:
    """Uniform (Haar) random rotation matrices of shape ``(*shape, 3, 3)``."""
    q = jax.random.normal(key, tuple(shape) + (4,))
    return quat_to_rot(q)


def frame_compose(r1, t1, r2, t2):
    """Compose rigid transforms: (r1, t1) after (r2, t2) = ``x -> r1 (r2 x + t2) + t1``."""
    r = jnp.einsum("...ij,...jk->...ik", r1, r2, precision="highest")
    t = jnp.einsum("...ij,...j->...i", r1, t2, precision="highest") + t1
    return r, t


def frame_invert(r, t):
    """Inverse rigid transform: ``x -> r^T (x - t)``."""
    r_inv = jnp.swapaxes(r, -2, -1)
    t_inv = -jnp.einsum("...ij,...j->...i", r_inv, t, precision="highest")
    return r_inv, t_inv


def frame_apply(r, t, x):
    """Apply a rigid transform to points ``(..., n, 3)`` (frames broadcast)."""
    return jnp.einsum("...ij,...nj->...ni", r, x, precision="highest") + t[..., None, :]


def rotation_angle(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle in [0, pi] of ``(..., 3, 3)`` rotation matrices.

    Gradient-safe at the arccos saturation points: near identity (trace
    rounds to >= 3 in f32, routine as a rotation loss converges) and at
    antipodal rotations, d/dx arccos is -inf and the naive form NaNs the
    whole backward pass (the CLAUDE.md double-where rule).  The cosine is
    squeezed just inside (-1, 1) before arccos; values at/beyond the
    boundary pin to arccos(+-(1-eps)) with a finite gradient.
    """
    t = jnp.trace(r, axis1=-2, axis2=-1)
    c = jnp.clip((t - 1.0) / 2.0, -1.0, 1.0)
    eps = 1e-6
    near = jnp.abs(c) < 1.0 - eps
    # double-where: arccos only ever sees the safe interior (finite
    # gradient); the saturated branch returns the EXACT boundary angle
    # (0 or pi) as a constant with zero gradient
    safe = jnp.where(near, c, 0.0)
    boundary = jnp.where(c > 0.0, 0.0, jnp.pi)
    return jnp.where(near, jnp.arccos(safe), boundary)
