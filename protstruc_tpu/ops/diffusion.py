"""Euclidean diffusion over atom coordinates, fused on device.

The reference exposes a single in-place DDPM forward step
(``diffuse_xyz``, protstruc.py:864-878) and leaves the T-step loop and the
cosine variance schedule to tutorial code
(docs/tutorials/diffusing_xyz_coordinates.ipynb).  Here the whole loop runs
as one ``lax.scan`` with explicit PRNG keys — coordinates stay
device-resident across all T steps (BASELINE.md config 4).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "cosine_variance_schedule",
    "diffuse_step",
    "diffusion_trajectory",
    "forward_marginal",
]


def cosine_variance_schedule(
    T: int, s: float = 8e-3, beta_max: float = 0.999
) -> jnp.ndarray:
    """Nichol & Dhariwal cosine beta schedule, ``(T,)``.

    Matches the tutorial-level ``cosine_variance_schedule`` of the reference
    (diffusing_xyz_coordinates.ipynb).
    """
    t = jnp.arange(T + 1, dtype=jnp.float32)
    f = jnp.cos((t / T + s) / (1.0 + s) * jnp.pi / 2.0) ** 2
    alpha_bar = f / f[0]
    betas = 1.0 - alpha_bar[1:] / alpha_bar[:-1]
    return jnp.clip(betas, 0.0, beta_max)


def diffuse_step(xyz: jnp.ndarray, key: jax.Array, beta: jnp.ndarray) -> jnp.ndarray:
    """One DDPM forward step: ``sqrt(1-b) x + sqrt(b) eps``.

    ``beta``: scalar or ``(B,)`` broadcast over per-structure coordinates.
    Parity: protstruc.py:875-878.
    """
    beta = jnp.asarray(beta, dtype=xyz.dtype)
    b = beta.reshape(beta.shape + (1,) * (xyz.ndim - beta.ndim))
    eps = jax.random.normal(key, xyz.shape, dtype=xyz.dtype)
    return jnp.sqrt(1.0 - b) * xyz + jnp.sqrt(b) * eps


@partial(jax.jit, static_argnames=("keep_trajectory",))
def diffusion_trajectory(
    xyz: jnp.ndarray,
    key: jax.Array,
    betas: jnp.ndarray,
    keep_trajectory: bool = False,
):
    """Run the full T-step forward process under ``lax.scan``.

    Args:
        xyz: ``(B, ...)`` coordinates (any trailing shape).
        key: PRNG key; split per step inside the scan.
        betas: ``(T,)`` or ``(T, B)`` variance schedule.
        keep_trajectory: also return all intermediate states ``(T, B, ...)``.

    Returns ``xyz_T`` or ``(xyz_T, trajectory)``.
    """
    T = betas.shape[0]
    keys = jax.random.split(key, T)

    def step(x, inp):
        k, b = inp
        x = diffuse_step(x, k, b)
        return x, (x if keep_trajectory else None)

    final, traj = jax.lax.scan(step, xyz, (keys, betas))
    if keep_trajectory:
        return final, traj
    return final


def forward_marginal(
    xyz: jnp.ndarray, key: jax.Array, betas: jnp.ndarray, t: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form q(x_t | x_0) sample — the O(1) alternative to scanning.

    ``x_t = sqrt(alpha_bar_t) x_0 + sqrt(1 - alpha_bar_t) eps``.  Returns
    ``(x_t, eps)`` for denoiser training targets.  ``t``: ``(B,)`` int step
    indices into ``betas``.
    """
    alpha_bar = jnp.cumprod(1.0 - betas)
    ab_t = alpha_bar[t].reshape((-1,) + (1,) * (xyz.ndim - 1))
    eps = jax.random.normal(key, xyz.shape, dtype=xyz.dtype)
    x_t = jnp.sqrt(ab_t) * xyz + jnp.sqrt(1.0 - ab_t) * eps
    return x_t, eps
