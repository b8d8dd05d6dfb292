"""Fused Pallas TPU kernel for trRosetta pair-feature maps.

One pass over (i-block, j-block) tiles computes all six trRosetta maps —
d_ca, d_cb, d_no, omega, theta, phi — reading the backbone atom coordinates
once per tile.  This is the TPU-native replacement for the reference's
``(B, L, L, A, A)`` tensor materialization + three separate L^2 atom gathers
(protstruc.py:455-484, 589-660):

* Coordinates are laid out as component *planes*: the i-side as
  ``(B, L, 12)`` (sublane = residue) and the j-side as ``(B, 12, L)``
  (lane = residue), so every arithmetic op in the kernel is a fully-tiled
  ``(TILE_I, TILE_J)`` VPU elementwise op — no in-kernel transposes, no
  gathers, no A x A axis.
* HBM traffic is ~6 f32 maps written once; inputs are O(L) per tile pair.
* Validity masks are cheap outer products computed outside the kernel by XLA.

Numerical conventions match ops/pairwise.py exactly (same formulas, same
degenerate-diagonal pinning), which the test suite cross-checks.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from protstruc_tpu.vocab import ATOM

__all__ = ["trrosetta_features", "pairwise_maps_pallas", "model_features_pallas"]

# atom plane order inside the packed 12-row coordinate block
_ATOMS = ("N", "CA", "CB", "O")
_AIDX = {a: i for i, a in enumerate(_ATOMS)}


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _norm(a):
    return jnp.sqrt(_dot(a, a))


_PI = 3.141592653589793
_PI_2 = 1.5707963267948966


def _atan2_planes(y, x):
    """Branch-light atan2: rsqrt-based range reduction + degree-11 odd
    minimax polynomial.

    Mosaic has no atan2/atan lowering (NotImplementedError on TC kernels).
    ``t = min(|x|,|y|)/max(|x|,|y|)`` is in [0, 1], where the polynomial has
    1.7e-6 max error — well inside the 1e-5 parity budget.  The divide is
    ``min * rsqrt(max^2)`` (hardware rsqrt beats the exact f32 divide on the
    VPU) and the polynomial is deg-11 instead of deg-15: together ~4% off
    the six-map kernel's runtime (experiments/kernel_probe.py grid,
    min-of-2: 5.07 -> 4.90 ms/batch; the kernel is VPU-compute-bound).
    Zero handling matches the canonicalized-+0 convention:
    atan2(+0, +0) = 0.  NaN inputs propagate: t -> NaN -> p(NaN) = NaN and
    every comparison in the select chain is False on NaN, keeping it.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    maxv = jnp.maximum(ax, ay)
    # rsqrt range reduction squares maxv, which flushes to 0 for
    # 0 < maxv < ~3.9e-23 and would turn the exact ratio into inf/NaN.
    # Rescale tiny pairs by an exact power of two first: 2^87 lifts even
    # the smallest f32 denormal (1.4e-45 -> 2.2e-19) above the underflow
    # line while keeping (1e-7 * 2^87)^2 ~ 2.4e38 below overflow.  The
    # ratio min/max is scale-invariant, so the angle is unchanged.
    s = jnp.where(maxv < 1e-7, 2.0**87, 1.0)
    ax = ax * s
    ay = ay * s
    maxv = jnp.maximum(ax, ay)
    safe = jnp.where(maxv == 0.0, 1.0, maxv)
    t = jnp.minimum(ax, ay) * jax.lax.rsqrt(safe * safe)
    zz = t * t
    # degree-11 odd minimax polynomial on [0, 1]; max err 1.7e-6
    p = t * (
        9.999772197e-01
        + zz * (-3.326228327e-01
        + zz * (1.935403833e-01
        + zz * (-1.164264699e-01
        + zz * (5.264731915e-02
        + zz * -1.171911837e-02))))
    )
    r = jnp.where(ay > ax, _PI_2 - p, p)
    r = jnp.where(x < 0.0, _PI - r, r)
    r = jnp.where(y < 0.0, -r, r)
    nan = jnp.isnan(x) | jnp.isnan(y)
    return jnp.where(nan, jnp.nan, r)


def _dihedral_from_bonds(b0, b1, b2):
    """Signed dihedral from bond vectors (component planes).

    Same value as geometry.dihedral but with the sin term reduced via the
    scalar-triple-product identity ``((b0xb1) x (b2xb1)) . b1
    = -(b1.b1) ((b0xb1) . b2)`` (using ``(b0xb1) . b1 = 0``), which removes
    one full cross product per pair.
    """
    n0 = _cross(b0, b1)
    n1 = _cross(b2, b1)
    x = _dot(n0, n1) + 0.0          # +0.0 canonicalizes -0 (parity with jnp path)
    y = -jnp.sqrt(_dot(b1, b1)) * _dot(n0, b2) + 0.0
    return _atan2_planes(y, x)


def _dihedral_planes(a, b, c, d):
    return _dihedral_from_bonds(_sub(a, b), _sub(c, b), _sub(d, c))


def _angle_planes(a, b, c):
    # angle = atan2(|ba x bc|, ba . bc) — same value as the arccos form but
    # without the cancellation-prone divide; preserves the reference's NaN
    # on zero-length bc (phi-map diagonal) explicitly.
    ba = _sub(a, b)
    bc = _sub(c, b)
    cr = _cross(ba, bc)
    s = jnp.sqrt(_dot(cr, cr))
    ang = _atan2_planes(s, _dot(ba, bc))
    zero = (_dot(bc, bc) == 0.0) | (_dot(ba, ba) == 0.0)
    return jnp.where(zero, jnp.nan, ang)


def _eq3(u, v):
    """Exact equality of two component-plane 3-vectors, broadcast (TI, TJ)."""
    return (u[0] == v[0]) & (u[1] == v[1]) & (u[2] == v[2])


def _make_trrosetta_kernel(maps):
    """Build the tile kernel emitting only the requested maps (in order).

    The full six-map kernel is ``maps=_MAP_NAMES``; subsets (e.g. a lone
    ``d_cb`` for distogram pipelines) skip the unneeded arithmetic entirely
    — at B=1024, L=1024 the six f32 maps would exceed a v5e's HBM, so
    emitting only what downstream consumers read is the memory/bandwidth
    lever (BASELINE.md config 5).
    """

    def kernel(fi_ref, fj_ref, *out_refs):
        fi = fi_ref[0]  # (TILE_I, 12): residue-i atom components in sublanes
        fj = fj_ref[0]  # (12, TILE_J): residue-j atom components in lanes
        refs = dict(zip(maps, out_refs))
        odt = out_refs[0].dtype

        def iv(atom, comp):  # i-side component -> (TILE_I, 1)
            k = _AIDX[atom] * 3 + comp
            return fi[:, k : k + 1]

        def jv(atom, comp):  # j-side component -> (1, TILE_J)
            k = _AIDX[atom] * 3 + comp
            return fj[k : k + 1, :]

        def ivec(atom):
            return (iv(atom, 0), iv(atom, 1), iv(atom, 2))

        def jvec(atom):
            return (jv(atom, 0), jv(atom, 1), jv(atom, 2))

        n_i, ca_i, cb_i = ivec("N"), ivec("CA"), ivec("CB")
        ca_j, cb_j, o_j = jvec("CA"), jvec("CB"), jvec("O")

        # distance maps
        if "d_ca" in refs:
            refs["d_ca"][0] = _norm(_sub(ca_i, ca_j)).astype(odt)
        if "d_cb" in refs:
            refs["d_cb"][0] = _norm(_sub(cb_i, cb_j)).astype(odt)
        if "d_no" in refs:
            refs["d_no"][0] = _norm(_sub(n_i, o_j)).astype(odt)

        # Degenerate (coincident-atom) pairs are detected by exact coordinate
        # equality, identical to ops/pairwise.py — index-free, so the kernel
        # works on rectangular (local-i x global-j) blocks under shard_map.
        # NaN coords compare unequal, so missing-atom entries keep their NaN.

        if "omega" in refs:
            # omega = dihedral(CA_i, CB_i, CA_j, CB_j)
            deg_o = (
                (_eq3(ca_i, ca_j) & _eq3(cb_i, cb_j))
                | _eq3(ca_j, cb_j)
                | _eq3(ca_i, cb_i)
            )
            omega = _dihedral_planes(ca_i, cb_i, ca_j, cb_j)
            refs["omega"][0] = jnp.where(deg_o, 0.0, omega).astype(odt)

        if "theta" in refs:
            # theta = dihedral(N_i, CA_i, CB_i, CB_j)
            deg_t = (
                (_eq3(n_i, cb_i) & _eq3(ca_i, cb_j))
                | _eq3(cb_i, cb_j)
                | _eq3(n_i, ca_i)
            )
            theta = _dihedral_planes(n_i, ca_i, cb_i, cb_j)
            refs["theta"][0] = jnp.where(deg_t, 0.0, theta).astype(odt)

        if "phi" in refs:
            # phi = angle(CA_i, CB_i, CB_j); NaN on the diagonal in the
            # reference (zero-length bc) — keep NaN by not masking
            refs["phi"][0] = _angle_planes(ca_i, cb_i, cb_j).astype(odt)

    return kernel


def _pack_planes(xyz: jnp.ndarray):
    """(B, L, A, 3) -> i-side (B, L, 12) and j-side (B, 12, L) planes."""
    cols = [xyz[:, :, int(ATOM[a]), :] for a in _ATOMS]  # 4 x (B, L, 3)
    packed = jnp.concatenate(cols, axis=-1)  # (B, L, 12)
    return packed, jnp.swapaxes(packed, 1, 2)


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


_MAP_NAMES = ("d_ca", "d_cb", "d_no", "omega", "theta", "phi")


def _maps_jnp(xyz: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Gradient-safe jnp formulation of the six maps (backward surrogate).

    Uses the double-where pattern throughout: every op with an unbounded
    derivative at degenerate inputs (sqrt at 0, atan2/arccos at 0-vectors)
    computes on substituted safe inputs at degenerate positions, so zero
    cotangents there stay zero instead of becoming 0 * inf = NaN.  Forward
    values at *non*-degenerate positions match the kernel/parity path; only
    this function's gradients are consumed (custom VJP backward).
    """
    from protstruc_tpu import geometry as geom

    def col(a):
        return xyz[:, :, int(ATOM[a]), :]

    def safe_dist(ci, cj):
        diff = ci[:, :, None, :] - cj[:, None, :, :]
        q = jnp.sum(diff * diff, axis=-1)
        pos = q > 0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, q, 1.0)), 0.0)

    # canonical well-conditioned quadruple for degenerate substitution
    _a0 = jnp.array([1.0, 0.0, 0.0])
    _b0 = jnp.zeros(3)
    _c0 = jnp.array([0.0, 1.0, 0.0])
    _d0 = jnp.array([0.0, 1.0, 1.0])

    def safe_dihedral(a, b, c, d):
        deg = (
            (jnp.all(a == c, -1) & jnp.all(b == d, -1))
            | jnp.all(c == d, -1)
            | jnp.all(a == b, -1)
            | jnp.all(b == c, -1)
        )[..., None]
        a = jnp.where(deg, _a0, a)
        b = jnp.where(deg, _b0, b)
        c = jnp.where(deg, _c0, c)
        d = jnp.where(deg, _d0, d)
        return jnp.where(deg[..., 0], 0.0, geom.dihedral(a, b, c, d))

    def safe_angle(a, b, c):
        deg = (jnp.all(a == b, -1) | jnp.all(c == b, -1))[..., None]
        a = jnp.where(deg, _a0, a)
        b = jnp.where(deg, _b0, b)
        c = jnp.where(deg, _c0, c)
        return jnp.where(deg[..., 0], 0.0, geom.angle(a, b, c))

    def bi(a):  # residue-i broadcast
        return col(a)[:, :, None, :]

    def bj(a):  # residue-j broadcast
        return col(a)[:, None, :, :]

    return {
        "d_ca": safe_dist(col("CA"), col("CA")),
        "d_cb": safe_dist(col("CB"), col("CB")),
        "d_no": safe_dist(col("N"), col("O")),
        "omega": safe_dihedral(bi("CA"), bi("CB"), bj("CA"), bj("CB")),
        "theta": safe_dihedral(bi("N"), bi("CA"), bi("CB"), bj("CB")),
        "phi": safe_angle(bi("CA"), bi("CB"), bj("CB")),
    }


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def pairwise_maps(
    xyz: jnp.ndarray,
    tile_i: int = 128,
    tile_j: int = 512,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Differentiable fused pair maps: Pallas forward, jnp-path backward.

    The Mosaic kernel has no VJP; the backward pass replays the (equivalent)
    jnp formulation under ``jax.vjp`` — standard fast-forward/exact-backward
    pairing.  Gradients at masked/NaN entries are NaN, as with the jnp path;
    mask the cotangents upstream (e.g. via a masked loss).
    """
    return pairwise_maps_pallas(xyz, tile_i, tile_j, interpret)


def _pairwise_maps_fwd(xyz, tile_i, tile_j, interpret):
    return pairwise_maps_pallas(xyz, tile_i, tile_j, interpret), xyz


def _pairwise_maps_bwd(tile_i, tile_j, interpret, xyz, g):
    _, vjp = jax.vjp(_maps_jnp, xyz)
    (dxyz,) = vjp(g)
    return (dxyz,)


pairwise_maps.defvjp(_pairwise_maps_fwd, _pairwise_maps_bwd)


@functools.partial(
    jax.jit, static_argnames=("tile_i", "tile_j", "interpret", "out_dtype", "maps")
)
def pairwise_maps_pallas(
    xyz: jnp.ndarray,
    tile_i: int = 128,
    tile_j: int = 512,
    interpret: bool = False,
    out_dtype=jnp.float32,
    xyz_j: jnp.ndarray = None,
    maps: tuple = _MAP_NAMES,
) -> Dict[str, jnp.ndarray]:
    """Run the fused pair-feature kernel. xyz: ``(B, L, A, 3)`` float32.

    Returns the requested trRosetta value maps (default all six), each
    ``(B, Li, Lj)`` of ``out_dtype`` (compute stays f32 in-kernel;
    ``jnp.bfloat16`` halves HBM write traffic for deep-learning consumers at
    ~3e-3 output precision).  ``maps``: subset of ``("d_ca", "d_cb", "d_no",
    "omega", "theta", "phi")`` — unrequested maps cost neither compute nor
    HBM.

    ``xyz_j`` makes the block rectangular: rows come from ``xyz`` (e.g. a
    device's local residue shard) and columns from ``xyz_j`` (e.g. the
    all-gathered full residue axis) — the building block for
    sequence-parallel featurization under shard_map.
    """
    maps = tuple(maps)
    unknown = set(maps) - set(_MAP_NAMES)
    if unknown:
        raise ValueError(f"unknown maps {sorted(unknown)}; valid: {_MAP_NAMES}")
    if xyz_j is None:
        xyz_j = xyz
    B, Li = xyz.shape[:2]
    Lj = xyz_j.shape[1]

    tile_i = min(tile_i, _ceil_to(max(Li, 8), 8))
    tile_j = min(tile_j, _ceil_to(max(Lj, 128), 128))
    Lpi = _ceil_to(max(Li, 8), tile_i)
    Lpj = _ceil_to(max(Lj, 128), tile_j)

    xi = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, Lpi - Li), (0, 0), (0, 0)))
    xj = jnp.pad(xyz_j.astype(jnp.float32), ((0, 0), (0, Lpj - Lj), (0, 0), (0, 0)))
    fi, _ = _pack_planes(xi)
    _, fj = _pack_planes(xj)

    grid = (B, Lpi // tile_i, Lpj // tile_j)
    out_shape = [jax.ShapeDtypeStruct((B, Lpi, Lpj), out_dtype)] * len(maps)
    out_spec = pl.BlockSpec(
        (1, tile_i, tile_j),
        lambda b, i, j: (b, i, j),
        memory_space=pltpu.VMEM,
    )

    outs = pl.pallas_call(
        _make_trrosetta_kernel(maps),
        name="trrosetta_pair_features",  # XProf-visible kernel name
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_i, 12), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12, tile_j), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * len(maps),
        out_shape=out_shape,
        interpret=interpret,
    )(fi, fj)

    return {k: v[:, :Li, :Lj] for k, v in zip(maps, outs)}


def _make_model_kernel(n_bins: int, max_dist: float):
    """Kernel emitting exactly what the TrFold embed/loss consume:

    * ``bins``: int32 ``distogram_bins(d_cb)`` (NaN -> last bin), and
    * ``ang``: one ``(6, TI, TJ)`` bf16 plane stack of
      [sin w, cos w, sin t, cos t, sin phi, cos phi], degenerate pairs
      pinned to the raw-map conventions (w/t = 0 -> (0, 1)) and NaN/missing
      entries emitted as (0, 0) — the model's ``nan_to_num`` convention.

    No atan2 at all: sin/cos of atan2(y, x) are just y*rsqrt(y^2+x^2) and
    x*rsqrt(y^2+x^2), so this kernel drops the most expensive VPU work of
    the raw-map kernel *and* the model's downstream sin/cos pass over
    1.6 GB of raw maps (see guides/performance.md roofline).
    """

    def kernel(fi_ref, fj_ref, bins_ref, ang_ref):
        fi = fi_ref[0]
        fj = fj_ref[0]

        def iv(atom, comp):
            k = _AIDX[atom] * 3 + comp
            return fi[:, k : k + 1]

        def jv(atom, comp):
            k = _AIDX[atom] * 3 + comp
            return fj[k : k + 1, :]

        def ivec(atom):
            return (iv(atom, 0), iv(atom, 1), iv(atom, 2))

        def jvec(atom):
            return (jv(atom, 0), jv(atom, 1), jv(atom, 2))

        n_i, ca_i, cb_i = ivec("N"), ivec("CA"), ivec("CB")
        ca_j, cb_j = jvec("CA"), jvec("CB")

        # d_cb -> distogram bins (ops/histogram.distogram_bins semantics)
        d = _norm(_sub(cb_i, cb_j))
        d = jnp.where(jnp.isnan(d), max_dist, d)
        b = jnp.clip((d * (n_bins / max_dist)).astype(jnp.int32), 0, n_bins - 1)
        bins_ref[0] = b

        adt = ang_ref.dtype

        def sincos_dihedral(a, bb, c, dd, deg):
            b0, b1, b2 = _sub(a, bb), _sub(c, bb), _sub(dd, c)
            n0 = _cross(b0, b1)
            n1 = _cross(b2, b1)
            x = _dot(n0, n1)
            y = -jnp.sqrt(_dot(b1, b1)) * _dot(n0, b2)
            r2 = x * x + y * y
            inv = jax.lax.rsqrt(jnp.where(r2 > 0.0, r2, 1.0))
            ok = (r2 > 0.0) & ~deg  # NaN r2 -> False -> (0, 0)
            s = jnp.where(ok, y * inv, 0.0)
            c_ = jnp.where(ok, x * inv, jnp.where(deg, 1.0, 0.0))
            return s, c_

        deg_o = (
            (_eq3(ca_i, ca_j) & _eq3(cb_i, cb_j))
            | _eq3(ca_j, cb_j)
            | _eq3(ca_i, cb_i)
        )
        os_, oc_ = sincos_dihedral(ca_i, cb_i, ca_j, cb_j, deg_o)

        deg_t = (
            (_eq3(n_i, cb_i) & _eq3(ca_i, cb_j))
            | _eq3(cb_i, cb_j)
            | _eq3(n_i, ca_i)
        )
        ts_, tc_ = sincos_dihedral(n_i, ca_i, cb_i, cb_j, deg_t)

        # planar angle phi in [0, pi]: sin = |ba x bc| / (|ba||bc|), cos = ...
        ba = _sub(ca_i, cb_i)
        bc = _sub(cb_j, cb_i)
        cr = _cross(ba, bc)
        s2 = _dot(cr, cr)
        dt = _dot(ba, bc)
        r2p = s2 + dt * dt
        okp = r2p > 0.0  # NaN or zero-length -> (0, 0), the nan_to_num value
        invp = jax.lax.rsqrt(jnp.where(okp, r2p, 1.0))
        ps_ = jnp.where(okp, jnp.sqrt(jnp.where(s2 > 0.0, s2, 0.0)) * invp, 0.0)
        pc_ = jnp.where(okp, dt * invp, 0.0)

        for k, v in enumerate((os_, oc_, ts_, tc_, ps_, pc_)):
            ang_ref[0, k] = v.astype(adt)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_bins", "max_dist", "tile_i", "tile_j", "interpret",
                     "ang_dtype"),
)
def model_features_pallas(
    xyz: jnp.ndarray,
    n_bins: int = 36,
    max_dist: float = 20.0,
    tile_i: int = 128,
    tile_j: int = 512,
    interpret: bool = False,
    ang_dtype=jnp.bfloat16,
):
    """Fused model-input featurization: ``(d_cb_bins, ang_sincos)``.

    Returns ``d_cb_bins (B, L, L) int32`` and ``ang_sincos (B, 6, L, L)``
    of ``ang_dtype`` in [sin w, cos w, sin t, cos t, sin phi, cos phi]
    order.  Writes 16 B/pair instead of the raw path's 24 B/pair and skips
    the model's separate sin/cos pass — the training-ingest fast path
    consumed by ``models.trfold.featurize_for_model(fused=True)``.
    """
    B, Li = xyz.shape[:2]
    Lj = Li

    tile_i = min(tile_i, _ceil_to(max(Li, 8), 8))
    tile_j = min(tile_j, _ceil_to(max(Lj, 128), 128))
    Lpi = _ceil_to(max(Li, 8), tile_i)
    Lpj = _ceil_to(max(Lj, 128), tile_j)

    xi = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, Lpi - Li), (0, 0), (0, 0)))
    xj = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, Lpj - Lj), (0, 0), (0, 0)))
    fi, _ = _pack_planes(xi)
    _, fj = _pack_planes(xj)

    outs = pl.pallas_call(
        _make_model_kernel(n_bins, float(max_dist)),
        name="trrosetta_model_features",
        grid=(B, Lpi // tile_i, Lpj // tile_j),
        in_specs=[
            pl.BlockSpec((1, tile_i, 12), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12, tile_j), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_i, tile_j), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, tile_i, tile_j), lambda b, i, j: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lpi, Lpj), jnp.int32),
            jax.ShapeDtypeStruct((B, 6, Lpi, Lpj), ang_dtype),
        ],
        interpret=interpret,
    )(fi, fj)

    return outs[0][:, :Li, :Lj], outs[1][:, :, :Li, :Lj]


def trrosetta_features(
    xyz: jnp.ndarray,
    atom_mask: jnp.ndarray,
    tile_i: int = 128,
    tile_j: int = 512,
    interpret: bool = None,
) -> Dict[str, jnp.ndarray]:
    """Full inter_residue_geometry dict via the Pallas kernel (+ XLA masks).

    Differentiable: value maps route through ``pairwise_maps`` (custom VJP
    with the gradient-safe jnp backward).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    ret = dict(pairwise_maps(xyz, tile_i, tile_j, interpret))
    for key, (ai, aj) in {
        "d_ca_mask": ("CA", "CA"),
        "d_cb_mask": ("CB", "CB"),
        "d_no_mask": ("N", "O"),
    }.items():
        mi = atom_mask[:, :, int(ATOM[ai])]
        mj = atom_mask[:, :, int(ATOM[aj])]
        ret[key] = mi[:, :, None] & mj[:, None, :]
    return ret
