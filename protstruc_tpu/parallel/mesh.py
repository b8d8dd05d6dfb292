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

__all__ = [
    "make_mesh",
    "make_multislice_mesh",
    "batch_pspecs",
    "shard_batch",
    "featurize_sharded",
]


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


def make_multislice_mesh(
    n_slices: int,
    axis_shapes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("dcn", "dp", "sp", "tp"),
) -> Mesh:
    """Mesh for multi-slice TPU pods: a leading 'dcn' data axis over slices.

    Cross-slice traffic rides the data-center network, which is orders of
    magnitude slower than ICI — so only *batch-dimension* data parallelism
    crosses it (the 'dcn' axis carries one collective per step: the gradient
    all-reduce); sp/tp collectives stay inside each slice's ICI domain.

    Devices are grouped by their hardware ``slice_index`` when the backend
    reports one (real multi-slice pods); otherwise the device list is split
    evenly — which makes the same code testable on a virtual CPU mesh.
    ``axis_shapes`` fixes the per-slice (dp, sp, tp) factorization.
    """
    devices = jax.devices()
    by_slice: dict = {}
    for d in devices:
        by_slice.setdefault(getattr(d, "slice_index", 0), []).append(d)

    if len(by_slice) >= n_slices > 1:
        groups = [by_slice[k] for k in sorted(by_slice)[:n_slices]]
        per = min(len(g) for g in groups)
        groups = [g[:per] for g in groups]
    else:  # single-slice backend (or virtual CPU): split evenly
        if len(devices) % n_slices:
            raise ValueError(
                f"{len(devices)} devices not divisible into {n_slices} slices"
            )
        per = len(devices) // n_slices
        groups = [devices[i * per : (i + 1) * per] for i in range(n_slices)]

    if axis_shapes is None:
        dp, sp, tp = _factor3(per)
    else:
        dp, sp, tp = axis_shapes
        if dp * sp * tp != per:
            raise ValueError(f"axis shapes {axis_shapes} != {per} devices/slice")

    arr = np.asarray(groups).reshape(n_slices, dp, sp, tp)
    return Mesh(arr, axis_names)


def batch_pspecs(data_axes: Sequence[str] = ("dp",)):
    """PartitionSpecs for StructureBatch array fields: B over the data
    axes (merged, e.g. ``("dcn", "dp")`` on a multi-slice mesh), L over sp."""
    b = tuple(data_axes) if len(data_axes) > 1 else data_axes[0]
    return {
        "xyz": P(b, "sp", None, None),
        "atom_mask": P(b, "sp", None),
        "chain_idx": P(b, "sp"),
        "residue_idx": P(b, "sp"),
        "mu": P(b, None),
        "std": P(b, None),
    }


def _data_axes(mesh: Mesh):
    return ("dcn", "dp") if "dcn" in mesh.axis_names else ("dp",)


def _bspec(mesh: Mesh):
    """The batch-axis PartitionSpec entry for this mesh (merged on dcn)."""
    axes = _data_axes(mesh)
    return tuple(axes) if len(axes) > 1 else axes[0]


def shard_batch(batch, mesh: Mesh):
    """device_put a StructureBatch onto the mesh with dp/sp shardings.

    B must divide the (product of the) data axis sizes and L the sp axis
    size (bucket-pad first — see utils/buckets.py).  On a multi-slice mesh
    (make_multislice_mesh) the batch axis shards over ('dcn', 'dp') merged.
    """
    specs = batch_pspecs(_data_axes(mesh))

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

    b = _bspec(mesh)
    node3 = NamedSharding(mesh, P(b, "sp", None))
    node4 = NamedSharding(mesh, P(b, "sp", None, None))

    def small(xyz, atom_mask, chain_idx):
        d, m = _backbone_dihedrals(xyz, chain_idx, atom_mask)
        frames = geom.gram_schmidt(xyz[:, :, 0], xyz[:, :, 1], xyz[:, :, 2])
        return d, m, frames

    return jax.jit(small, out_shardings=(node3, node3, node4))


@functools.lru_cache(maxsize=8)
def _featurize_fn(mesh: Mesh):
    from protstruc_tpu.batch import _backbone_dihedrals, _inter_residue_geometry
    from protstruc_tpu import geometry as geom

    b = _bspec(mesh)
    pair = NamedSharding(mesh, P(b, "sp", None))
    node3 = NamedSharding(mesh, P(b, "sp", None))
    node4 = NamedSharding(mesh, P(b, "sp", None, None))

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
    from jax import shard_map

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

    b = _bspec(mesh)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(b, "sp", None, None), P(b, "sp", None)),
        out_specs={
            k: P(b, "sp", None)
            for k in [
                "d_ca", "d_cb", "d_no", "omega", "theta", "phi",
                "d_ca_mask", "d_cb_mask", "d_no_mask",
            ]
        },
        check_vma=False,
    )
    return jax.jit(fn)
