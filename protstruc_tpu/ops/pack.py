"""Steric clash scoring and sidechain repacking.

Completes the design loop around the chi machinery (ops/chi.py): a
vdW-overlap clash energy (validation op — the reference has no steric
checks at all) and an annealed parallel random-search repacker that
optimizes all sidechain chi angles jointly on device.

TPU formulation: the energy is one dense (N x N) pairwise computation
(VPU-friendly broadcasts, no neighbor lists); the packer evaluates K full
proposals per sweep with ``vmap`` and keeps the argmin — strictly monotone
in energy, all under ``lax.scan`` with static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["clash_energy", "pack_sidechains"]


def clash_energy(
    xyz: jnp.ndarray,
    atom_mask: jnp.ndarray,
    seq_idx: jnp.ndarray,
    tolerance: float = 0.4,
) -> jnp.ndarray:
    """Inter-residue steric clash energy, ``(B,)``.

    ``sum over atom pairs of max(0, r_i + r_j - tolerance - d)^2`` across
    *different* residues, excluding bonded neighbors (the peptide C(i)-N(i+1)
    link and its 1-3 partners are handled by exempting backbone-backbone
    pairs of sequence-adjacent residues).  Intra-residue geometry is fixed
    under chi rotations, so it is excluded — the packer's energy only sees
    what it can change.

    ``tolerance`` softens the vdW wall (0.4 A is the usual Rosetta-style
    allowance for crystal contacts).
    """
    from protstruc_tpu.ops.surface import atom_radii_table

    B, L, A, _ = xyz.shape
    N = L * A

    radii = jnp.asarray(atom_radii_table())[jnp.clip(seq_idx, 0, 20)]  # (B,L,A)
    valid = atom_mask & (radii > 0) & jnp.isfinite(xyz).all(-1)

    # park invalid atoms far away AND far apart (index-spread) so they never
    # register as pairs — with each other or with real atoms
    spread = jnp.arange(N).reshape(1, L, A, 1) * 1e3
    x = jnp.where(
        valid[..., None], jnp.nan_to_num(xyz, nan=0.0), 1e4 + spread
    ).reshape(B, N, 3)
    r = jnp.where(valid, radii, 0.0).reshape(B, N)

    d2 = jnp.sum((x[:, :, None] - x[:, None, :]) ** 2, axis=-1)
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))

    res_i = jnp.repeat(jnp.arange(L), A)
    same_res = res_i[:, None] == res_i[None, :]
    adjacent = jnp.abs(res_i[:, None] - res_i[None, :]) == 1
    is_bb = (jnp.arange(N) % A) < 5  # N/CA/C/O/CB slots
    adj_bb = adjacent & is_bb[:, None] & is_bb[None, :]
    excluded = same_res | adj_bb

    overlap = jnp.maximum(r[:, :, None] + r[:, None, :] - d - tolerance, 0.0)
    overlap = jnp.where(excluded[None], 0.0, overlap)
    # each pair counted twice; halve
    return 0.5 * jnp.sum(overlap**2, axis=(1, 2))


def pack_sidechains(
    xyz: jnp.ndarray,
    seq_idx: jnp.ndarray,
    atom_mask: jnp.ndarray,
    key: jax.Array,
    n_sweeps: int = 30,
    n_proposals: int = 8,
    sigma0: float = 1.5,
    sigma1: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Repack sidechains by annealed parallel random search over chi space.

    Each sweep draws ``n_proposals`` full chi-perturbation candidates
    (Gaussian, annealed scale sigma0 -> sigma1), applies them with
    :func:`~protstruc_tpu.ops.chi.rotate_chi` (vmapped), scores them with
    :func:`clash_energy`, and keeps the best of {current, candidates} —
    monotone descent, no host round-trips (one ``lax.scan``).

    Returns ``(packed_xyz (B, L, A, 3), energy_trajectory (n_sweeps+1, B))``.
    """
    from protstruc_tpu.ops.chi import rotate_chi

    B, L = seq_idx.shape

    def energy(x):
        return clash_energy(x, atom_mask, seq_idx)

    sigmas = jnp.exp(
        jnp.linspace(jnp.log(sigma0), jnp.log(sigma1), n_sweeps)
    )

    # PRO chis live inside the pyrrolidine ring: rotate_chi moves the
    # CG/CD subtree but the ring-closure CD-N bond stays put, so sampling
    # them would tear the ring — and clash_energy excludes intra-residue
    # pairs, so the damage would never be scored.  Freeze proline deltas.
    from protstruc_tpu.vocab import AA

    not_pro = (seq_idx != int(AA.PRO))[None, :, :, None]

    def sweep(carry, inp):
        x, e = carry
        k, sigma = inp
        deltas = (
            jax.random.normal(k, (n_proposals, B, L, 4)) * sigma * not_pro
        )
        cands = jax.vmap(lambda d: rotate_chi(x, seq_idx, d, atom_mask))(deltas)
        es = jax.vmap(energy)(cands)  # (K, B)

        all_e = jnp.concatenate([e[None], es], axis=0)       # (K+1, B)
        all_x = jnp.concatenate([x[None], cands], axis=0)    # (K+1, B, L, A, 3)
        best = jnp.argmin(all_e, axis=0)                     # (B,)
        x_next = jnp.take_along_axis(
            all_x, best[None, :, None, None, None], axis=0
        )[0]
        e_next = jnp.take_along_axis(all_e, best[None], axis=0)[0]
        return (x_next, e_next), e_next

    e0 = energy(xyz)
    keys = jax.random.split(key, n_sweeps)
    (x_final, _), traj = jax.lax.scan(sweep, (xyz, e0), (keys, sigmas))
    return x_final, jnp.concatenate([e0[None], traj], axis=0)
