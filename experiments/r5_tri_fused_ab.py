"""On-chip A/B: fused Pallas triangle multiplication vs the flax path.

Module level (chained-fori_loop differencing, see attn_sweep.py) at the
VERDICT r4 A/B widths C=128 and C=256, then the full train step via
experiments/mfu.py's measure().

Usage: python experiments/r5_tri_fused_ab.py [module|step]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def wall(fn, *args):
    out = fn(*args)
    float(out[-1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out[-1])
        best = min(best, time.perf_counter() - t0)
    return best


def chained(step, n):
    @jax.jit
    def run(carry):
        carry = jax.lax.fori_loop(0, n, lambda _, c: step(c), carry)
        return carry, jnp.sum(carry.astype(jnp.float32))

    return run


def per_iter(step, carry, n1, n2):
    t1 = wall(chained(step, n1), carry)
    t2 = wall(chained(step, n2), carry)
    return (t2 - t1) / (n2 - n1)


def module_ab(C, L=512, B=4, n1=4, n2=12):
    from protstruc_tpu.models.trfold import TrFoldConfig, TriangleMultiplication

    dtype = jnp.bfloat16
    rows = {}
    key = jax.random.PRNGKey(0)
    pair = jax.random.normal(key, (B, L, L, C), dtype)
    mask = jnp.ones((B, L), bool)
    eps = jnp.asarray(1e-3, dtype)

    mods = {}
    for name, fused in (("flax", False), ("fused", True)):
        cfg = TrFoldConfig(node_dim=2 * C, pair_dim=C, dtype=dtype,
                           fused_tri=fused)
        mods[name] = TriangleMultiplication(cfg, outgoing=True)
    params = mods["flax"].init(jax.random.PRNGKey(1), pair, mask)["params"]

    for name, mod in mods.items():
        def fwd(p, mod=mod):
            out = mod.apply({"params": params}, p, mask)
            return (p + eps * out).astype(dtype)

        t = per_iter(fwd, pair, n1, n2)
        rows[f"{name}_fwd_ms"] = round(t * 1e3, 2)
        log(f"C={C} {name:5s} fwd     {t*1e3:8.2f} ms")

        def loss(p, mod=mod):
            out = mod.apply({"params": params}, p, mask)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def fwdbwd(p, loss=loss):
            g = jax.grad(loss)(p)
            return (p + eps * g.astype(dtype)).astype(dtype)

        t = per_iter(fwdbwd, pair, max(n1 // 2, 2), max(n2 // 2, 4))
        rows[f"{name}_fwdbwd_ms"] = round(t * 1e3, 2)
        log(f"C={C} {name:5s} fwd+bwd {t*1e3:8.2f} ms")

    rows["speedup_fwd"] = round(rows["flax_fwd_ms"] / rows["fused_fwd_ms"], 2)
    rows["speedup_fwdbwd"] = round(
        rows["flax_fwdbwd_ms"] / rows["fused_fwdbwd_ms"], 2)
    log(f"C={C} speedup fwd {rows['speedup_fwd']}x  "
        f"fwd+bwd {rows['speedup_fwdbwd']}x")
    return dict(rows, C=C, L=L, B=B)


def step_ab():
    """Full train step at the two VERDICT A/B configs, fused on/off.

    XLA's cost analysis cannot count FLOPs inside Pallas kernels, so the
    fused row reports the FLOPs of its paired unfused row (identical math,
    identical param tree — only the kernel organization differs); its
    tflops/pct are therefore true MFU, not an under-count.
    """
    sys.path.insert(0, "experiments")
    from mfu import measure

    rows = []
    for D, P, blocks in ((256, 128, 4), (512, 256, 6)):
        pair = []
        for fused in (False, True):
            r = measure(D, P, blocks, pair_update="triangle", remat=True,
                        fused_tri=fused)
            r["fused_tri"] = fused
            pair.append(r)
        unfused, fused_row = pair
        fused_row["gflop"] = unfused["gflop"]
        # GFLOP / ms == TFLOP/s
        fused_row["tflops"] = round(unfused["gflop"] / fused_row["ms"], 2)
        fused_row["pct_bf16_peak"] = round(
            100 * fused_row["tflops"] * 1e12 / 197e12, 2)
        fused_row["flops_from"] = "paired unfused row (XLA cost analysis "
        fused_row["flops_from"] += "cannot see inside Pallas kernels)"
        rows.extend(pair)
    return rows


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "module"
    log(f"backend: {jax.default_backend()}")
    if mode == "module":
        out = [module_ab(128), module_ab(256)]
    else:
        out = step_ab()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
