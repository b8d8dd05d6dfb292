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


def _bwd_primal(fi, fj):
    """Polynomial-only tile primal for the backward kernel.

    Emits the pre-transcendental intermediates of all six maps — squared
    distances ``q``, dihedral triples ``(x, y', h)`` with the true atan2
    arguments being ``(-sqrt(h) * y', x)``, and the planar-angle pair
    ``(s2, t)`` with arguments ``(sqrt(s2), t)``.  Everything here is
    cross/dot/sub algebra (no sqrt, no atan2), so ``jax.vjp`` of this
    function is NaN/inf-free at every degenerate input; the guarded
    transcendental chain rules live in :func:`_bwd_cotangents`.
    """

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
    ca_j, cb_j, o_j = jvec("CA"), jvec("CB"), jvec("O")

    def q(u, v):
        d = _sub(u, v)
        return _dot(d, d)

    def dih(a, b, c, d):
        # UNREDUCED y: w = (n0 x n1) . b1, true y = w / sqrt(h).  The
        # forward kernel's reduced y = -|b1| (n0 . b2) saves a cross
        # product but carries the declared 2e-4 conditioning waiver
        # (BASELINE.md); the backward matches the jnp path's conditioning
        # instead (measured: reduced-form adjoints err ~5e-4 vs f64 truth
        # where this form and the jnp VJP both sit at ~3e-6).
        b0, b1, b2 = _sub(a, b), _sub(c, b), _sub(d, c)
        n0 = _cross(b0, b1)
        n1 = _cross(b2, b1)
        return _dot(n0, n1), _dot(_cross(n0, n1), b1), _dot(b1, b1)

    x_o, w_o, h_o = dih(ca_i, cb_i, ca_j, cb_j)
    x_t, w_t, h_t = dih(n_i, ca_i, cb_i, cb_j)

    ba = _sub(ca_i, cb_i)
    bc = _sub(cb_j, cb_i)
    cr = _cross(ba, bc)

    # emit full (TI, TJ) tiles: some intermediates are i-only/(TI, 1)
    # (e.g. theta's |b1|^2) and broadcast_to's adjoint is the sum-reduce
    # the accumulation needs (NaN-safe, unlike adding a 0 * x plane)
    full = (fi.shape[0], fj.shape[1])
    return tuple(jnp.broadcast_to(v, full) for v in (
        q(ca_i, ca_j), q(cb_i, cb_j), q(n_i, o_j),
        x_o, w_o, h_o, x_t, w_t, h_t,
        _dot(cr, cr), _dot(ba, bc)))


def _deg_masks(fi, fj):
    """Exact input-equality degeneracy masks, one per transcendental map.

    Mirrors ``_maps_jnp``'s substitution predicates (safe_dihedral /
    safe_angle): a pair is degenerate iff two of the defining atoms
    coincide *bitwise*.  This predicate — NOT ``denom > 0`` on derived
    quantities — is the only FMA-safe guard: inside a compiled kernel
    ``cross(v, v)`` contracts to fused multiply-adds and returns ~1e-12
    noise instead of exact 0, so a derived-value test lets ``1/denom``
    explode to ~1e24 on the diagonal (omega(i,i) has b0 == b1).  NaN
    coordinates compare False, keeping the jnp path's NaN-gradient
    contract.
    """

    def vec(side, atom):
        k = _AIDX[atom] * 3
        if side == "i":
            return tuple(fi[:, k + c : k + c + 1] for c in range(3))
        return tuple(fj[k + c : k + c + 1, :] for c in range(3))

    def eq3(u, v):
        return (u[0] == v[0]) & (u[1] == v[1]) & (u[2] == v[2])

    n_i, ca_i, cb_i = vec("i", "N"), vec("i", "CA"), vec("i", "CB")
    ca_j, cb_j = vec("j", "CA"), vec("j", "CB")

    # dihedral(a, b, c, d) degenerate iff (a==c & b==d) | c==d | a==b | b==c
    deg_o = ((eq3(ca_i, ca_j) & eq3(cb_i, cb_j)) | eq3(ca_j, cb_j)
             | eq3(ca_i, cb_i) | eq3(cb_i, ca_j))
    deg_t = ((eq3(n_i, cb_i) & eq3(ca_i, cb_j)) | eq3(cb_i, cb_j)
             | eq3(n_i, ca_i) | eq3(ca_i, cb_i))
    # angle(a, b, c) degenerate iff a==b | c==b
    deg_p = eq3(ca_i, cb_i) | eq3(cb_j, cb_i)
    return deg_o, deg_t, deg_p


def _bwd_cotangents(g, prim, degs):
    """Guarded adjoints of the transcendental heads over the primal outputs.

    Every division/rsqrt is double-where'd so degenerate pairs (coincident
    atoms -> zero vectors -> x = y = 0 / q = 0 / s2 + t^2 = 0) contribute an
    exact 0 cotangent, matching the jnp backward's substituted-input pattern
    (``_maps_jnp``).  Degeneracy comes from the input-equality masks
    (:func:`_deg_masks`) — see there for why derived-value tests are not
    FMA-safe.  NaN inputs keep all guards False, and the polynomial
    pullback then multiplies NaN coordinates by the zero cotangent — NaN
    gradients at missing-atom pairs, same as the jnp path.
    """
    g_ca, g_cb, g_no, g_om, g_th, g_ph = (v.astype(jnp.float32) for v in g)
    (q_ca, q_cb, q_no, x_o, w_o, h_o, x_t, w_t, h_t, s2_p, t_p) = prim
    deg_o, deg_t, deg_p = degs

    def d_dist(gd, qv):
        # exact 1/sqrt, not lax.rsqrt: Mosaic lowers rsqrt to the VPU's
        # approximate reciprocal-sqrt, which alone pushes on-chip gradient
        # parity vs the jnp VJP past 1e-5 (measured 1.6e-5 -> <1e-5)
        pos = qv > 0.0
        return jnp.where(pos, gd * 0.5 / jnp.sqrt(
            jnp.where(pos, qv, 1.0)), 0.0)

    def d_dihedral(gphi, x, w, h, deg):
        # phi = atan2(w / sqrt(h), x) with h = |b1|^2 >= 0 (NaN propagates)
        hpos = h > 0.0
        s = 1.0 / jnp.sqrt(jnp.where(hpos, h, 1.0))  # guarded h^(-1/2)
        y = w * s
        denom = x * x + y * y
        ok = hpos & (denom > 0.0) & ~deg
        inv = 1.0 / jnp.where(ok, denom, 1.0)
        gx = jnp.where(ok, -gphi * y * inv, 0.0)
        gy = jnp.where(ok, gphi * x * inv, 0.0)
        gw = gy * s
        # d y / d h = -w / (2 h^(3/2)) = -0.5 * w * s^3
        gh = -0.5 * gy * w * s * s * s
        return gx, gw, gh

    def d_angle(gang, s2, t, deg):
        s = jnp.sqrt(jnp.where(s2 > 0.0, s2, 0.0))
        r2 = s2 + t * t
        ok = (r2 > 0.0) & ~deg
        inv = 1.0 / jnp.where(ok, r2, 1.0)
        gt = jnp.where(ok, -gang * s * inv, 0.0)
        gs = jnp.where(ok, gang * t * inv, 0.0)
        pos = (s2 > 0.0) & ~deg
        gs2 = jnp.where(pos, gs * 0.5 / jnp.sqrt(
            jnp.where(pos, s2, 1.0)), 0.0)
        return gs2, gt

    gx_o, gw_o, gh_o = d_dihedral(g_om, x_o, w_o, h_o, deg_o)
    gx_t, gw_t, gh_t = d_dihedral(g_th, x_t, w_t, h_t, deg_t)
    gs2_p, gt_p = d_angle(g_ph, s2_p, t_p, deg_p)
    return (d_dist(g_ca, q_ca), d_dist(g_cb, q_cb), d_dist(g_no, q_no),
            gx_o, gw_o, gh_o, gx_t, gw_t, gh_t, gs2_p, gt_p)


def _bwd_kernel(fi_ref, fj_ref, *refs):
    g_refs, (dfi_ref, dfj_ref) = refs[:6], refs[6:]
    i = pl.program_id(1)
    j = pl.program_id(2)
    tj = g_refs[0].shape[2]

    @pl.when((i == 0) & (j == 0))
    def _():
        dfj_ref[...] = jnp.zeros_like(dfj_ref)

    fi = fi_ref[0].astype(jnp.float32)
    fj = fj_ref[0].astype(jnp.float32)
    prim, pullback = jax.vjp(_bwd_primal, fi, fj)
    ct = _bwd_cotangents([r[0] for r in g_refs], prim, _deg_masks(fi, fj))
    dfi_t, dfj_t = pullback(ct)

    @pl.when(j == 0)
    def _():
        dfi_ref[0] = dfi_t.astype(dfi_ref.dtype)

    @pl.when(j != 0)
    def _():
        dfi_ref[0] += dfi_t.astype(dfi_ref.dtype)

    col = pl.dslice(j * tj, tj)
    dfj_ref[0, :, col] += dfj_t.astype(dfj_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def _maps_bwd_pallas(xyz, g: Dict[str, jnp.ndarray], tile_i=128, tile_j=256,
                     interpret=False):
    """Fused Pallas backward for the six pair maps: cotangents -> dxyz.

    One pass over (i-block, j-block) tiles reads the six cotangent maps
    once (the dominant HBM traffic, 24 B/pair — same order as the
    forward's writes) and accumulates both gradient planes in VMEM:
    the i-side (B, L, 12) via consecutively revisited row blocks, the
    j-side (B, 12, L) via a full-extent plane block revisited across the
    whole batch sweep (dynamic lane-slice accumulation).  The per-tile
    adjoint algebra is ``jax.vjp`` of the polynomial primal
    (:func:`_bwd_primal`) under the guarded transcendental chain
    (:func:`_bwd_cotangents`) — no atan2 evaluation at all: its adjoint
    is rational.

    Measured (v5e, north star B=256 L=512): 12.9 ms/batch vs 148.2 ms for
    the jnp-VJP replay — 11.5x, at 2.7x the forward's 5 ms.  On-chip
    gradient parity vs the jnp VJP is <= 2e-5: both f32 legs sit ~1e-5
    from f64 ground truth and the Mosaic kernel (5.4e-6 rel) is *closer*
    to truth than the on-chip jnp VJP (1.04e-5); the 1.6e-5 leg-to-leg
    gap is two valid f32 roundings diverging, not kernel error.  The CPU
    interpret-mode tests gate at 1e-5.
    """
    B, L = xyz.shape[:2]
    tile_i = min(tile_i, _ceil_to(max(L, 8), 8))
    tile_j = min(tile_j, _ceil_to(max(L, 128), 128))
    Lpi = _ceil_to(max(L, 8), tile_i)
    Lpj = _ceil_to(max(L, 128), tile_j)

    xi = jnp.pad(xyz.astype(jnp.float32),
                 ((0, 0), (0, Lpi - L), (0, 0), (0, 0)))
    xj = jnp.pad(xyz.astype(jnp.float32),
                 ((0, 0), (0, Lpj - L), (0, 0), (0, 0)))
    fi, _ = _pack_planes(xi)
    _, fj = _pack_planes(xj)

    gs = [jnp.pad(g[k].astype(jnp.float32),
                  ((0, 0), (0, Lpi - L), (0, Lpj - L)))
          for k in _MAP_NAMES]

    gspec = pl.BlockSpec((1, tile_i, tile_j), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM)
    dfi, dfj = pl.pallas_call(
        _bwd_kernel,
        name="trrosetta_pair_features_bwd",
        grid=(B, Lpi // tile_i, Lpj // tile_j),
        in_specs=[
            pl.BlockSpec((1, tile_i, 12), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12, tile_j), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ] + [gspec] * 6,
        out_specs=[
            pl.BlockSpec((1, tile_i, 12), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12, Lpj), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lpi, 12), jnp.float32),
            jax.ShapeDtypeStruct((B, 12, Lpj), jnp.float32),
        ],
        interpret=interpret,
    )(fi, fj, *gs)

    A = xyz.shape[2]
    dxyz = jnp.zeros((B, L, A, 3), jnp.float32)
    for a in _ATOMS:
        k = _AIDX[a] * 3
        contrib = (dfi[:, :L, k : k + 3]
                   + jnp.swapaxes(dfj[:, k : k + 3, :L], 1, 2))
        dxyz = dxyz.at[:, :, int(ATOM[a]), :].set(contrib)
    return dxyz.astype(xyz.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def pairwise_maps(
    xyz: jnp.ndarray,
    tile_i: int = 128,
    tile_j: int = 512,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Differentiable fused pair maps: Pallas forward AND Pallas backward.

    The backward is the fused adjoint kernel (:func:`_maps_bwd_pallas`),
    value-matching the jnp formulation's VJP (``_maps_jnp``) at every
    handled degeneracy (coincident atoms -> exact 0 gradient).  Gradients
    at masked/NaN entries are NaN, as with the jnp path; mask the
    cotangents upstream (e.g. via a masked loss).  Set
    ``pallas_pairwise.BWD_IMPL = "jnp"`` to fall back to replaying the jnp
    formulation under ``jax.vjp``.
    """
    return pairwise_maps_pallas(xyz, tile_i, tile_j, interpret)


# backward implementation selector: "pallas" (fused adjoint kernel) or
# "jnp" (replay _maps_jnp under jax.vjp) — module-level so tests/benches
# can A/B the two without re-plumbing the call sites
BWD_IMPL = "pallas"


def _pairwise_maps_fwd(xyz, tile_i, tile_j, interpret):
    return pairwise_maps_pallas(xyz, tile_i, tile_j, interpret), xyz


def _pairwise_maps_bwd(tile_i, tile_j, interpret, xyz, g):
    if BWD_IMPL == "jnp":
        _, vjp = jax.vjp(_maps_jnp, xyz)
        (dxyz,) = vjp(dict(g))
        return (dxyz,)
    return (_maps_bwd_pallas(xyz, dict(g), min(tile_i, 128),
                             min(tile_j, 256), interpret),)


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
