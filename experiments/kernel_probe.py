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
    run_variant("dist3", dist3, 3, xyz, rtt)


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
