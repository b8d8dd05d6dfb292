"""SO(3) utilities and isotropic-Gaussian rotation diffusion (IGSO3).

Building blocks for SE(3) diffusion over backbone rigid frames (FrameDiff /
RFdiffusion family): axis-angle <-> matrix maps with guarded numerics,
IGSO(3) sampling via a precomputed inverse-CDF table (TPU-friendly — the
heavy series evaluation happens once on the host in NumPy; on-device
sampling is two table interpolations), and the rotation score used for
denoiser targets.

All angle maps use double-where guards at the 0 and pi singularities (see
CLAUDE.md numerics conventions) so gradients are finite everywhere.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rotvec_to_rot",
    "rot_to_rotvec",
    "igso3_table",
    "sample_igso3",
    "igso3_score_norm",
    "geodesic_interp",
]

_EPS = 1e-8


def rotvec_to_rot(v: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle rotation vector ``(..., 3)`` -> matrix via Rodrigues.

    Small-angle safe: the sin(w)/w and (1-cos w)/w^2 factors use their
    Taylor limits below ~1e-4 rad through a double-where guard.
    """
    w2 = jnp.sum(v * v, axis=-1)
    small = w2 < 1e-8
    w2_safe = jnp.where(small, 1.0, w2)
    w = jnp.sqrt(w2_safe)
    # sin(w)/w and (1 - cos(w))/w^2 with Taylor fallbacks
    a = jnp.where(small, 1.0 - w2 / 6.0, jnp.sin(w) / w)
    b = jnp.where(small, 0.5 - w2 / 24.0, (1.0 - jnp.cos(w)) / w2_safe)

    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    ).reshape(v.shape[:-1] + (3, 3))
    K2 = jnp.einsum("...ij,...jk->...ik", K, K, precision="highest")
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def rot_to_rotvec(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix ``(..., 3, 3)`` -> axis-angle vector (angle in [0, pi]).

    Uses the quaternion route (branch-free, well-conditioned near both 0 and
    pi — the direct skew-symmetric extraction degenerates at pi).
    """
    from protstruc_tpu.ops.rigid import rot_to_quat

    q = rot_to_quat(r)  # (w, x, y, z), w >= 0
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    n2 = jnp.sum(xyz * xyz, axis=-1)
    small = n2 < 1e-12
    n = jnp.sqrt(jnp.where(small, 1.0, n2))
    angle = 2.0 * jnp.arctan2(n, w)
    # v = angle * axis; for tiny rotations q ~ (1, v/2) so v ~ 2 * xyz
    scale = jnp.where(small, 2.0, angle / n)
    return xyz * scale[..., None]


@lru_cache(maxsize=4)
def igso3_table(
    n_sigma: int = 256,
    n_omega: int = 1024,
    sigma_min: float = 0.01,
    sigma_max: float = 3.0,
    l_max: int = 1000,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Precompute IGSO(3) inverse-CDF and score tables on the host.

    The isotropic Gaussian on SO(3) with concentration ``sigma`` has angle
    density ``p(w) ∝ f(w) (1 - cos w) / pi`` where the heat-kernel series
    ``f(w) = sum_l (2l+1) exp(-l(l+1) sigma^2/2) sin((l+1/2)w) / sin(w/2)``.

    Returns ``(sigmas (S,), omegas (W,), cdf (S, W), score_norm (S, W))``
    as float32 NumPy arrays: ``cdf`` for inverse-transform sampling of the
    rotation angle, ``score_norm[s, w] = d/dw log f(w; sigma_s)`` for
    denoising-score targets.  NumPy/host on purpose — called once, cached.
    """
    sigmas = np.exp(
        np.linspace(np.log(sigma_min), np.log(sigma_max), n_sigma)
    ).astype(np.float64)
    omegas = np.linspace(1e-5, np.pi - 1e-5, n_omega).astype(np.float64)

    ls = np.arange(l_max + 1, dtype=np.float64)[:, None]  # (L, 1)
    w = omegas[None, :]  # (1, W)
    # series terms: (S, L, W) would be large; loop over sigma in chunks
    f = np.empty((n_sigma, n_omega), dtype=np.float64)
    dlogf = np.empty_like(f)
    sin_half = np.sin(w / 2.0)
    sin_l = np.sin((ls + 0.5) * w)  # (L, W)
    cos_l = np.cos((ls + 0.5) * w)
    for i, s in enumerate(sigmas):
        coef = (2.0 * ls[:, 0] + 1.0) * np.exp(-ls[:, 0] * (ls[:, 0] + 1.0) * s * s / 2.0)
        fi = (coef[:, None] * sin_l / sin_half).sum(0)
        # d f / d w: quotient rule on sin((l+1/2)w)/sin(w/2)
        dfi = (
            coef[:, None]
            * (
                (ls + 0.5) * cos_l / sin_half
                - 0.5 * sin_l * np.cos(w / 2.0) / sin_half**2
            )
        ).sum(0)
        f[i] = np.maximum(fi, 1e-30)
        # where the series underflows (angle far out in the tail at small
        # sigma) the quotient dfi/fi is numerically meaningless; use the
        # wrapped-Gaussian tail approximation d/dw log p ~ -w / sigma^2
        safe = fi > 1e-8
        dlogf[i] = np.where(safe, dfi / np.maximum(fi, 1e-30), -omegas / (s * s))

    pdf = f * (1.0 - np.cos(omegas)[None, :]) / np.pi
    cdf = np.cumsum(pdf, axis=1)
    cdf /= cdf[:, -1:]

    return (
        sigmas.astype(np.float32),
        omegas.astype(np.float32),
        cdf.astype(np.float32),
        dlogf.astype(np.float32),
    )


def _interp_sigma_row(table: jnp.ndarray, sigmas: jnp.ndarray, sigma):
    """Linearly interpolate table rows at the requested sigma (clamped)."""
    sigma = jnp.clip(sigma, sigmas[0], sigmas[-1])
    idx = jnp.searchsorted(sigmas, sigma, side="right") - 1
    idx = jnp.clip(idx, 0, sigmas.shape[0] - 2)
    w = (sigma - sigmas[idx]) / (sigmas[idx + 1] - sigmas[idx])
    return (1.0 - w)[..., None] * table[idx] + w[..., None] * table[idx + 1]


def sample_igso3(key: jax.Array, sigma, shape=()) -> jnp.ndarray:
    """Sample rotation matrices from IGSO3(sigma), shape ``(*shape, 3, 3)``.

    ``sigma``: scalar or broadcastable to ``shape``.  Inverse-CDF sampling
    of the angle + uniform axis; the table lookup is two gathers and a
    couple of FMAs — cheap inside jit/scan.
    """
    sigmas_np, omegas_np, cdf_np, _ = igso3_table()
    sigmas, omegas, cdf = (
        jnp.asarray(sigmas_np), jnp.asarray(omegas_np), jnp.asarray(cdf_np)
    )

    ku, ka = jax.random.split(key)
    sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), shape)
    rows = _interp_sigma_row(cdf, sigmas, sigma.reshape(-1))  # (N, W)
    u = jax.random.uniform(ku, (rows.shape[0],))
    pos = jax.vmap(lambda row, uu: jnp.searchsorted(row, uu))(rows, u)
    pos = jnp.clip(pos, 1, omegas.shape[0] - 1)
    # linear interp between grid points of the inverse CDF
    c1 = jnp.take_along_axis(rows, pos[:, None], 1)[:, 0]
    c0 = jnp.take_along_axis(rows, pos[:, None] - 1, 1)[:, 0]
    t = (u - c0) / jnp.maximum(c1 - c0, 1e-12)
    omega = omegas[pos - 1] + t * (omegas[pos] - omegas[pos - 1])
    omega = omega.reshape(shape)

    axis = jax.random.normal(ka, tuple(shape) + (3,))
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS
    )
    return rotvec_to_rot(axis * omega[..., None])


def igso3_score_norm(sigma, omega) -> jnp.ndarray:
    """``d/dw log f(w; sigma)`` — the scalar part of the IGSO3 score.

    The full rotation score at ``R = exp(w * axis)`` is
    ``score_norm * axis`` in the tangent space (FrameDiff eq. 5); used as
    the denoiser regression target for rotations.
    """
    sigmas_np, omegas_np, _, dlogf_np = igso3_table()
    sigmas, omegas, dlogf = (
        jnp.asarray(sigmas_np), jnp.asarray(omegas_np), jnp.asarray(dlogf_np)
    )
    shape = jnp.broadcast_shapes(jnp.shape(sigma), jnp.shape(omega))
    sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), shape).reshape(-1)
    omega = jnp.broadcast_to(jnp.asarray(omega, jnp.float32), shape).reshape(-1)
    rows = _interp_sigma_row(dlogf, sigmas, sigma)  # (N, W)
    vals = jax.vmap(lambda row, w: jnp.interp(w, omegas, row))(rows, omega)
    return vals.reshape(shape)


def geodesic_interp(r0: jnp.ndarray, r1: jnp.ndarray, alpha) -> jnp.ndarray:
    """Geodesic interpolation on SO(3): ``r0 @ exp(alpha * log(r0^T r1))``.

    ``alpha = 0`` gives ``r0``, ``alpha = 1`` gives ``r1``.
    """
    # pin precision: late in sampling r0 ~ r1, so rel = I + delta with
    # |delta| below bf16 resolution — the default-TPU bf16 product would
    # swamp the geodesic direction with matmul noise
    rel = jnp.einsum("...ji,...jk->...ik", r0, r1,
                     precision="highest")  # r0^T r1
    v = rot_to_rotvec(rel)
    alpha = jnp.asarray(alpha)[..., None]
    return jnp.einsum("...ij,...jk->...ik", r0, rotvec_to_rot(v * alpha),
                      precision="highest")
