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
    "ddpm_reverse_step",
    "ddpm_sample",
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


def ddpm_reverse_step(
    x_t: jnp.ndarray,
    eps_hat: jnp.ndarray,
    key: jax.Array,
    betas: jnp.ndarray,
    t: jnp.ndarray,
    clip_x0: float = None,
    alpha_bar: jnp.ndarray = None,
) -> jnp.ndarray:
    """One ancestral DDPM reverse step ``x_t -> x_{t-1}``.

    Uses the x0-parameterized posterior: the implied
    ``x0_hat = (x_t - sqrt(1-abar_t) eps_hat) / sqrt(abar_t)`` feeds the
    posterior mean ``q(x_{t-1} | x_t, x0_hat)``.  ``clip_x0`` bounds
    ``x0_hat`` (the standard stabilizer — imperfect denoisers otherwise
    blow up through the ~1/sqrt(alpha_t) amplification at high-noise
    steps).  No noise is added at t = 0.  ``t``: scalar int step index.
    ``alpha_bar``: optional precomputed ``cumprod(1 - betas)`` — pass it
    from a sampling loop so the scan body doesn't redo O(T) work per step.
    """
    alphas = 1.0 - betas
    if alpha_bar is None:
        alpha_bar = jnp.cumprod(alphas)
    ab_t = alpha_bar[t]
    ab_prev = jnp.where(t > 0, alpha_bar[jnp.maximum(t - 1, 0)], 1.0)
    a_t = alphas[t]
    b_t = betas[t]

    x0_hat = (x_t - jnp.sqrt(1.0 - ab_t) * eps_hat) / jnp.sqrt(ab_t)
    if clip_x0 is not None:
        x0_hat = jnp.clip(x0_hat, -clip_x0, clip_x0)

    mean = (
        jnp.sqrt(ab_prev) * b_t * x0_hat
        + jnp.sqrt(a_t) * (1.0 - ab_prev) * x_t
    ) / (1.0 - ab_t)
    var = b_t * (1.0 - ab_prev) / (1.0 - ab_t)

    z = jax.random.normal(key, x_t.shape, dtype=x_t.dtype)
    return jnp.where(t > 0, mean + jnp.sqrt(var) * z, mean)


def ddpm_sample(
    denoise_fn,
    key: jax.Array,
    shape: Tuple[int, ...],
    betas: jnp.ndarray,
    keep_trajectory: bool = False,
    clip_x0: float = None,
):
    """Full reverse diffusion under ``lax.scan``: noise -> sample.

    Args:
        denoise_fn: ``(x_t, t) -> eps_hat`` (e.g. a trained
            models.DiffusionDenoiser closure); ``t`` is a scalar int32.
        key: PRNG key.
        shape: sample shape (e.g. ``(B, L, 3)`` CA coordinates in
            standardized space).
        betas: ``(T,)`` schedule (same one used for the forward process).
        clip_x0: bound on the implied x0 (e.g. ~4 for standardized
            coordinates); strongly recommended for imperfect denoisers.

    Returns ``x_0`` (or ``(x_0, trajectory)``).
    """
    T = betas.shape[0]
    k0, kloop = jax.random.split(key)
    x_T = jax.random.normal(k0, shape, dtype=jnp.float32)
    keys = jax.random.split(kloop, T)
    # hoist the O(T) schedule cumprod out of the scan body (it would
    # otherwise be recomputed at every one of the T steps)
    alpha_bar = jnp.cumprod(1.0 - betas)

    def step(x, inp):
        k, t = inp
        eps_hat = denoise_fn(x, t)
        x = ddpm_reverse_step(x, eps_hat, k, betas, t, clip_x0=clip_x0,
                              alpha_bar=alpha_bar)
        return x, (x if keep_trajectory else None)

    ts = jnp.arange(T - 1, -1, -1)
    x0, traj = jax.lax.scan(step, x_T, (keys, ts))
    if keep_trajectory:
        return x0, traj
    return x0


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
