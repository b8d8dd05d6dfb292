"""Mesh construction and StructureBatch sharding.

Axes:
    dp — data parallel over the structure batch dimension B.
    sp — sequence parallel over the residue axis L (pair tensors shard their
         *first* L axis; the second stays local, so pair features compute
         with a single small all-gather of the j-side atom columns).
    tp — tensor parallel over model hidden/head dimensions (used by
         models/, not by raw featurization).

With ``B`` sharded over dp and ``L`` over sp, the O(B*L^2) pair maps are
evenly split dp*sp ways; XLA generates the all-gather for the j-side
coordinate columns (O(L * 12) floats — negligible vs the L^2/sp output).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_pspecs", "shard_batch", "featurize_sharded"]


def _factor3(n: int):
    """Factor n devices into (dp, sp, tp) with dp >= sp >= tp.

    For powers of two the exponent is split ~evenly with the surplus going
    to dp (8 -> 2x2x2, 4 -> 2x2x1, 16 -> 4x2x2); other counts fall back to
    pure data parallelism.
    """
    if n & (n - 1):  # not a power of two
        return (n, 1, 1)
    k = n.bit_length() - 1
    k_tp = k // 3
    k_sp = (k - k_tp) // 2
    k_dp = k - k_tp - k_sp
    return (1 << k_dp, 1 << k_sp, 1 << k_tp)


def make_mesh(
    n_devices: Optional[int] = None,
    axis_shapes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("dp", "sp", "tp"),
) -> Mesh:
    """Build a named device mesh.

    ``axis_shapes`` fixes the factorization explicitly, e.g. ``(2, 2, 2)``;
    otherwise devices are factored as dp-heavy powers of two.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]

    if axis_shapes is None:
        dp, sp, tp = _factor3(n)
    else:
        dp, sp, tp = axis_shapes
        if dp * sp * tp != n:
            raise ValueError(f"axis shapes {axis_shapes} != {n} devices")

    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, axis_names)


def batch_pspecs():
    """PartitionSpecs for StructureBatch array fields: B over dp, L over sp."""
    return {
        "xyz": P("dp", "sp", None, None),
        "atom_mask": P("dp", "sp", None),
        "chain_idx": P("dp", "sp"),
        "residue_idx": P("dp", "sp"),
        "mu": P("dp", None),
        "std": P("dp", None),
    }


def shard_batch(batch, mesh: Mesh):
    """device_put a StructureBatch onto the mesh with dp/sp shardings.

    B must divide the dp axis size and L the sp axis size (bucket-pad first
    — see utils/buckets.py).
    """
    specs = batch_pspecs()

    def put(name, x):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, specs[name]))

    return batch.replace(
        xyz=put("xyz", batch.xyz),
        atom_mask=put("atom_mask", batch.atom_mask),
        chain_idx=put("chain_idx", batch.chain_idx),
        residue_idx=put("residue_idx", batch.residue_idx),
        mu=put("mu", batch.mu),
        std=put("std", batch.std),
    )


def featurize_sharded(batch, mesh: Mesh, use_pallas: bool = True):
    """Full featurization compiled over the mesh.

    Outputs: the 6D geometry dict with pair maps sharded ``P(dp, sp, None)``
    (first residue axis sequence-parallel), backbone dihedrals + mask
    ``P(dp, sp, None)`` and frames ``P(dp, sp, None, None)``.

    ``use_pallas=True`` (default): explicit shard_map — each device
    all-gathers the j-side atom columns over 'sp' (O(L*A*3) floats) and runs
    the fused Pallas kernel on its rectangular (L/sp x L) block.  This is
    the sequence-parallel form of the pair-feature kernel: compute and
    output memory split sp-ways, one small ICI collective.  7.7x faster than
    the jnp path on-chip (BENCH_r01: 5.1 vs 39.5 ms/batch at B=256, L=512).

    ``use_pallas=False``: pjit'd jnp path — XLA inserts the j-side
    all-gather from the sharding annotations.  Kept as the correctness
    oracle and for backends without Mosaic.
    """
    if use_pallas:
        g = _pair_maps_shardmap(mesh)(batch.xyz, batch.atom_mask)
        d, m, frames = _small_feats_fn(mesh)(
            batch.xyz, batch.atom_mask, batch.chain_idx
        )
        return g, d, m, frames

    return _featurize_fn(mesh)(batch.xyz, batch.atom_mask, batch.chain_idx)


# jitted-function constructors are cached per mesh so repeated
# featurize_sharded calls hit the jit cache instead of retracing


@functools.lru_cache(maxsize=8)
def _small_feats_fn(mesh: Mesh):
    from protstruc_tpu.batch import _backbone_dihedrals
    from protstruc_tpu import geometry as geom

    node3 = NamedSharding(mesh, P("dp", "sp", None))
    node4 = NamedSharding(mesh, P("dp", "sp", None, None))

    def small(xyz, atom_mask, chain_idx):
        d, m = _backbone_dihedrals(xyz, chain_idx, atom_mask)
        frames = geom.gram_schmidt(xyz[:, :, 0], xyz[:, :, 1], xyz[:, :, 2])
        return d, m, frames

    return jax.jit(small, out_shardings=(node3, node3, node4))


@functools.lru_cache(maxsize=8)
def _featurize_fn(mesh: Mesh):
    from protstruc_tpu.batch import _backbone_dihedrals, _inter_residue_geometry
    from protstruc_tpu import geometry as geom

    pair = NamedSharding(mesh, P("dp", "sp", None))
    node3 = NamedSharding(mesh, P("dp", "sp", None))
    node4 = NamedSharding(mesh, P("dp", "sp", None, None))

    def fn(xyz, atom_mask, chain_idx):
        g = _inter_residue_geometry(xyz, atom_mask)
        d, m = _backbone_dihedrals(xyz, chain_idx, atom_mask)
        frames = geom.gram_schmidt(xyz[:, :, 0], xyz[:, :, 1], xyz[:, :, 2])
        return g, d, m, frames

    out_shardings = (
        {
            k: pair
            for k in [
                "d_ca", "d_ca_mask", "d_cb", "d_cb_mask",
                "d_no", "d_no_mask", "omega", "theta", "phi",
            ]
        },
        node3,
        node3,
        node4,
    )
    return jax.jit(fn, out_shardings=out_shardings)


@functools.lru_cache(maxsize=8)
def _pair_maps_shardmap(mesh: Mesh, interpret: bool = None):
    """Sequence-parallel fused pair maps: shard_map + rectangular kernel.

    Returns a cached jitted callable ``(xyz, atom_mask) -> maps dict``.
    """
    from jax.experimental.shard_map import shard_map

    from protstruc_tpu.ops.pallas_pairwise import pairwise_maps_pallas
    from protstruc_tpu.vocab import ATOM

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def local(xyz_l, am_l):
        # gather the full residue axis for the j side (small: L * A * 3 f32)
        xyz_full = jax.lax.all_gather(xyz_l, "sp", axis=1, tiled=True)
        am_full = jax.lax.all_gather(am_l, "sp", axis=1, tiled=True)

        maps = dict(
            pairwise_maps_pallas(xyz_l, interpret=interpret, xyz_j=xyz_full)
        )
        for key, (ai, aj) in {
            "d_ca_mask": ("CA", "CA"),
            "d_cb_mask": ("CB", "CB"),
            "d_no_mask": ("N", "O"),
        }.items():
            mi = am_l[:, :, int(ATOM[ai])]
            mj = am_full[:, :, int(ATOM[aj])]
            maps[key] = mi[:, :, None] & mj[:, None, :]
        return maps

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("dp", "sp", None, None), P("dp", "sp", None)),
        out_specs={
            k: P("dp", "sp", None)
            for k in [
                "d_ca", "d_cb", "d_no", "omega", "theta", "phi",
                "d_ca_mask", "d_cb_mask", "d_no_mask",
            ]
        },
        check_rep=False,
    )
    return jax.jit(fn)
