"""Roofline probe for the trRosetta pair-feature kernel (run on the TPU).

Times kernel variants that isolate where the time goes at the headline
shape (B=256, L=512):

  full        — the production six-map kernel
  write-only  — same six HBM outputs, but each is a single cheap distance
                (pure-bandwidth probe: ~1/10 the VPU flops, identical
                write traffic)
  no-deg      — six maps without the degenerate-pair checks
  dist3       — only the three distance maps (half the write traffic,
                ~1/8 the flops)

Interpretation: if write-only ≈ full, the kernel is HBM-bound; if
write-only ≪ full, it is VPU-compute-bound and the gap is the compute
headroom.  Results feed guides/performance.md's roofline argument.

Usage: python experiments/kernel_probe.py   (default env = real TPU)
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from protstruc_tpu.ops import pallas_pairwise as pp

B, L = 256, 512
ITERS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _write_only_kernel(fi_ref, fj_ref, *out_refs):
    fi = fi_ref[0]
    fj = fj_ref[0]
    ca_i = (fi[:, 3:4], fi[:, 4:5], fi[:, 5:6])
    ca_j = (fj[3:4, :], fj[4:5, :], fj[5:6, :])
    d = pp._norm(pp._sub(ca_i, ca_j))
    for ref in out_refs:
        ref[0] = d


def run_variant(name, kernel, n_out, xyz, rtt):
    fi, _ = pp._pack_planes(xyz)
    _, fj = pp._pack_planes(xyz)
    tile_i, tile_j = 128, 512

    @jax.jit
    def fn(fi, fj):
        outs = pl.pallas_call(
            kernel,
            name=f"probe_{name}",
            grid=(B, L // tile_i, L // tile_j),
            in_specs=[
                pl.BlockSpec((1, tile_i, 12), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 12, tile_j), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((1, tile_i, tile_j), lambda b, i, j: (b, i, j),
                                    memory_space=pltpu.VMEM)] * n_out,
            out_shape=[jax.ShapeDtypeStruct((B, L, L), jnp.float32)] * n_out,
            interpret=jax.default_backend() != "tpu",
        )(fi, fj)
        chk = sum(o[0, 0, 1] + o[-1, 5, 9] for o in outs)
        return outs, chk

    out = fn(fi, fj)
    float(out[-1])
    for _ in range(2):
        float(fn(fi, fj)[-1])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(fi, fj)
    float(out[-1])
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS
    gb = n_out * B * L * L * 4 / 1e9
    log(f"[{name:>10}] {dt*1e3:6.2f} ms  ({n_out} maps, {gb:.2f} GB written, "
        f"{gb/dt:.0f} GB/s effective)")
    return dt


def _make_opt_kernel(poly_deg=11, fast_div=True, rsqrt_dist=True,
                     drop_nan_where=True):
    """Arithmetic-optimized six-map kernel variant (probe only).

    The packed-store A/B showed the kernel is VPU-compute-bound (write-only
    2.58 ms vs full 5.48 ms), so the remaining lever is op count:

    * deg-11 odd minimax polynomial for atan (max err 1.7e-6 vs deg-15's
      2.9e-7 — both far inside the 2e-4 kernel-vs-jnp budget)
    * divisions as ``a * rsqrt(b*b)`` (hardware rsqrt vs exact f32 divide)
    * distance sqrt as ``q * rsqrt(q)`` with a zero guard
    * drop the explicit NaN re-where in atan2: NaN propagates through the
      poly and the select chain keeps it (mosaic-vs-interpret + NaN-set
      gates verify)
    """
    P9 = (9.998663318e-01, -3.303047936e-01, 1.801592832e-01,
          -8.515630106e-02, 2.084508111e-02)          # max err 1.1e-5
    P11 = (9.999772197e-01, -3.326228327e-01, 1.935403833e-01,
           -1.164264699e-01, 5.264731915e-02, -1.171911837e-02)  # 1.7e-6
    P13 = (9.999961117e-01, -3.331736824e-01, 1.980781622e-01,
           -1.323334264e-01, 7.962366137e-02, -3.360419960e-02,
           6.811783856e-03)                           # 2.5e-7
    P15 = (9.999999228e-01, -3.333223262e-01, 1.997402858e-01,
           -1.404782123e-01, 1.000220526e-01, -6.087448222e-02,
           2.533170106e-02, -5.021063911e-03)         # 2.9e-7
    coeffs = {9: P9, 11: P11, 13: P13, 15: P15}[poly_deg]

    def atan2_opt(y, x):
        ax = jnp.abs(x)
        ay = jnp.abs(y)
        maxv = jnp.maximum(ax, ay)
        minv = jnp.minimum(ax, ay)
        if fast_div:
            safe = jnp.where(maxv == 0.0, 1.0, maxv)
            t = minv * jax.lax.rsqrt(safe * safe)
        else:
            t = minv / jnp.where(maxv == 0.0, 1.0, maxv)
        zz = t * t
        p = coeffs[-1]
        for c in coeffs[-2::-1]:
            p = p * zz + c
        p = p * t
        r = jnp.where(ay > ax, pp._PI_2 - p, p)
        r = jnp.where(x < 0.0, pp._PI - r, r)
        r = jnp.where(y < 0.0, -r, r)
        if not drop_nan_where:
            nan = jnp.isnan(x) | jnp.isnan(y)
            r = jnp.where(nan, jnp.nan, r)
        return r

    def norm_opt(a):
        q = pp._dot(a, a)
        if not rsqrt_dist:
            return jnp.sqrt(q)
        return jnp.where(q > 0.0, q * jax.lax.rsqrt(jnp.where(q > 0.0, q, 1.0)),
                         jnp.where(jnp.isnan(q), jnp.nan, 0.0))

    def dihedral_opt(a, b, c, d):
        b0, b1, b2 = pp._sub(a, b), pp._sub(c, b), pp._sub(d, c)
        n0 = pp._cross(b0, b1)
        n1 = pp._cross(b2, b1)
        x = pp._dot(n0, n1) + 0.0
        y = -norm_opt(b1) * pp._dot(n0, b2) + 0.0
        return atan2_opt(y, x)

    def angle_opt(a, b, c):
        ba = pp._sub(a, b)
        bc = pp._sub(c, b)
        cr = pp._cross(ba, bc)
        s = norm_opt(cr)
        ang = atan2_opt(s, pp._dot(ba, bc))
        zero = (pp._dot(bc, bc) == 0.0) | (pp._dot(ba, ba) == 0.0)
        return jnp.where(zero, jnp.nan, ang)

    def kernel(fi_ref, fj_ref, *out_refs):
        fi = fi_ref[0]
        fj = fj_ref[0]
        refs = dict(zip(pp._MAP_NAMES, out_refs))

        def ivec(atom):
            k = pp._AIDX[atom] * 3
            return tuple(fi[:, k + c : k + c + 1] for c in range(3))

        def jvec(atom):
            k = pp._AIDX[atom] * 3
            return tuple(fj[k + c : k + c + 1, :] for c in range(3))

        n_i, ca_i, cb_i = ivec("N"), ivec("CA"), ivec("CB")
        ca_j, cb_j, o_j = jvec("CA"), jvec("CB"), jvec("O")

        refs["d_ca"][0] = norm_opt(pp._sub(ca_i, ca_j))
        refs["d_cb"][0] = norm_opt(pp._sub(cb_i, cb_j))
        refs["d_no"][0] = norm_opt(pp._sub(n_i, o_j))

        deg_o = ((pp._eq3(ca_i, ca_j) & pp._eq3(cb_i, cb_j))
                 | pp._eq3(ca_j, cb_j) | pp._eq3(ca_i, cb_i))
        refs["omega"][0] = jnp.where(
            deg_o, 0.0, dihedral_opt(ca_i, cb_i, ca_j, cb_j))

        deg_t = ((pp._eq3(n_i, cb_i) & pp._eq3(ca_i, cb_j))
                 | pp._eq3(cb_i, cb_j) | pp._eq3(n_i, ca_i))
        refs["theta"][0] = jnp.where(
            deg_t, 0.0, dihedral_opt(n_i, ca_i, cb_i, cb_j))

        refs["phi"][0] = angle_opt(ca_i, cb_i, cb_j)

    return kernel


def _write_only_packed_kernel(fi_ref, fj_ref, out_ref):
    """One (1, 6, TI, TJ) output ref instead of six (1, TI, TJ) refs."""
    fi = fi_ref[0]
    fj = fj_ref[0]
    ca_i = (fi[:, 3:4], fi[:, 4:5], fi[:, 5:6])
    ca_j = (fj[3:4, :], fj[4:5, :], fj[5:6, :])
    d = pp._norm(pp._sub(ca_i, ca_j))
    for k in range(6):
        out_ref[0, k] = d


def _full_packed_kernel(fi_ref, fj_ref, out_ref):
    """Production six-map formulation -> single packed (1, 6, TI, TJ) ref."""
    inner = pp._make_trrosetta_kernel(pp._MAP_NAMES)

    class _PlaneRef:
        def __init__(self, ref, k):
            self.ref, self.k = ref, k
            self.dtype = ref.dtype

        def __setitem__(self, idx, val):
            assert idx == 0
            self.ref[0, self.k] = val

    inner(fi_ref, fj_ref, *[_PlaneRef(out_ref, k) for k in range(6)])


def run_packed_variant(name, kernel, xyz, rtt, tile_i=128, tile_j=512):
    """Variant with ONE (B, 6, L, L) plane-major output stream.

    Tests VERDICT r2 item 1: the 454 GB/s store ceiling was measured with
    six concurrent output streams; a single contiguous packed store may
    clear it (one DMA descriptor per tile covering all six planes).
    """
    fi, _ = pp._pack_planes(xyz)
    _, fj = pp._pack_planes(xyz)

    @jax.jit
    def fn(fi, fj):
        out = pl.pallas_call(
            kernel,
            name=f"probe_{name}",
            grid=(B, L // tile_i, L // tile_j),
            in_specs=[
                pl.BlockSpec((1, tile_i, 12), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 12, tile_j), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 6, tile_i, tile_j),
                                   lambda b, i, j: (b, 0, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 6, L, L), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(fi, fj)
        chk = out[0, 0, 0, 1] + out[-1, 5, 5, 9]
        return out, chk

    out = fn(fi, fj)
    float(out[-1])
    for _ in range(2):
        float(fn(fi, fj)[-1])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(fi, fj)
    float(out[-1])
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS
    gb = 6 * B * L * L * 4 / 1e9
    log(f"[{name:>16}] {dt*1e3:6.2f} ms  (packed 6-plane, {gb:.2f} GB written, "
        f"{gb/dt:.0f} GB/s effective)")
    return dt


def main():
    log(f"backend: {jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (B, L, 15, 3), jnp.float32) * 10.0

    # tunnel RTT
    @jax.jit
    def tiny(x):
        return jnp.sum(x)

    float(tiny(jnp.ones(4)))
    vals = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(tiny(jnp.ones(4)))
        vals.append(time.perf_counter() - t0)
    rtt = min(vals)
    log(f"RTT {rtt*1e3:.1f} ms")

    full = pp._make_trrosetta_kernel(pp._MAP_NAMES)
    dist3 = pp._make_trrosetta_kernel(("d_ca", "d_cb", "d_no"))

    run_variant("full", full, 6, xyz, rtt)
    run_variant("write-only", _write_only_kernel, 6, xyz, rtt)
    if "packed" in sys.argv:
        run_variant("dist3", dist3, 3, xyz, rtt)
        run_packed_variant("write-only-packed", _write_only_packed_kernel,
                           xyz, rtt)
        run_packed_variant("full-packed", _full_packed_kernel, xyz, rtt)
        for tj in (128, 256):
            run_packed_variant(f"full-packed-tj{tj}", _full_packed_kernel,
                               xyz, rtt, tile_j=tj)
    # grid over (poly degree, fast divide), two timing passes each to see
    # through ~10% run variance; everything else production-identical
    variants = {}
    for deg in (9, 11, 13, 15):
        for fd in (False, True):
            name = f"opt-d{deg}{'-fdiv' if fd else ''}"
            variants[name] = _make_opt_kernel(
                poly_deg=deg, fast_div=fd, rsqrt_dist=False,
                drop_nan_where=False)
    results = {}
    for rep in range(2):
        for name, k in variants.items():
            dt = run_variant(f"{name}#{rep}", k, 6, xyz, rtt)
            results[name] = min(results.get(name, 1e9), dt)
        results["full"] = min(results.get("full", 1e9),
                              run_variant(f"full#{rep}", full, 6, xyz, rtt))
    for name, dt in sorted(results.items(), key=lambda kv: kv[1]):
        log(f"BEST {name:>14}: {dt*1e3:.2f} ms  ({B/dt:.0f} structures/s)")


if __name__ == "__main__" and "sweep" not in sys.argv:
    main()


def tile_sweep():
    """Sweep tile_i for the full and write-only kernels (store-BW ceiling)."""
    log(f"backend: {jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (B, L, 15, 3), jnp.float32) * 10.0

    @jax.jit
    def tiny(x):
        return jnp.sum(x)

    float(tiny(jnp.ones(4)))
    import time as _t
    vals = []
    for _ in range(3):
        t0 = _t.perf_counter()
        float(tiny(jnp.ones(4)))
        vals.append(_t.perf_counter() - t0)
    rtt = min(vals)
    log(f"RTT {rtt*1e3:.1f} ms")

    full = pp._make_trrosetta_kernel(pp._MAP_NAMES)
    fi, _ = pp._pack_planes(xyz)
    _, fj = pp._pack_planes(xyz)

    for name, kernel in [("full", full), ("write-only", _write_only_kernel)]:
        for tile_i in (128, 256, 512):
            @jax.jit
            def fn(fi, fj, tile_i=tile_i, kernel=kernel):
                outs = pl.pallas_call(
                    kernel,
                    name=f"sweep_{tile_i}",
                    grid=(B, L // tile_i, 1),
                    in_specs=[
                        pl.BlockSpec((1, tile_i, 12), lambda b, i, j: (b, i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 12, L), lambda b, i, j: (b, 0, j),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=[pl.BlockSpec((1, tile_i, L), lambda b, i, j: (b, i, j),
                                            memory_space=pltpu.VMEM)] * 6,
                    out_shape=[jax.ShapeDtypeStruct((B, L, L), jnp.float32)] * 6,
                    interpret=jax.default_backend() != "tpu",
                )(fi, fj)
                chk = sum(o[0, 0, 1] + o[-1, 5, 9] for o in outs)
                return outs, chk

            out = fn(fi, fj)
            float(out[-1])
            for _ in range(2):
                float(fn(fi, fj)[-1])
            t0 = _t.perf_counter()
            for _ in range(ITERS):
                out = fn(fi, fj)
            float(out[-1])
            dt = max(_t.perf_counter() - t0 - rtt, 1e-9) / ITERS
            gb = 6 * B * L * L * 4 / 1e9
            log(f"[{name} ti={tile_i:3d}] {dt*1e3:6.2f} ms  ({gb/dt:.0f} GB/s)")


if "sweep" in sys.argv:
    tile_sweep()
