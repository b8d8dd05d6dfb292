"""Tile sweep for the flash pair-bias attention kernel (ops/flash_attn.py).

First on-chip A/B (r4) showed the 128x128-tile kernel 8.5x SLOWER than
XLA's fused jnp path at L=2048 (grid-step overhead + f32-upcast matmuls).
After the precision fix (native-dtype MXU dots) this sweep re-measures.

Timing method: the ops here are 0.1-1 ms while the axon relay RTT is
~36 ms, so host-side wall-clock minus a measured RTT is pure noise
(the first sweep printed "0.00 ms" rows).  Instead each measurement jits a
``lax.fori_loop`` that CHAINS n attention steps (the output feeds the next
query, so XLA cannot elide or overlap iterations) and we difference two
inner counts: per_iter = (t(n2) - t(n1)) / (n2 - n1).  The constant
dispatch + RTT + fetch cost cancels exactly.

Usage: python experiments/attn_sweep.py [L] [dtype] [n1 n2]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def wall(fn, *args):
    out = fn(*args)
    float(out[-1])  # compile + settle
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out[-1])
        best = min(best, time.perf_counter() - t0)
    return best


def chained_fwd(attn, n, kmask):
    """n chained forward steps: out_i feeds q_{i+1}."""

    @jax.jit
    def run(q, k, v, bias):
        def body(_, q):
            o = attn(q, k, v, bias, kmask)
            return o.astype(q.dtype)

        q = jax.lax.fori_loop(0, n, body, q)
        return q, jnp.sum(q.astype(jnp.float32))

    return run


def chained_fwdbwd(attn, n, kmask):
    """n chained fwd+bwd steps: grads perturb the next iterate."""

    def loss(q, k, v, bias):
        o = attn(q, k, v, bias, kmask)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    @jax.jit
    def run(q, k, v, bias):
        def body(_, carry):
            q, k, v, bias = carry
            g = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
            eps = jnp.asarray(1e-6, q.dtype)
            return (q + eps * g[0].astype(q.dtype),
                    k + eps * g[1].astype(k.dtype),
                    v + eps * g[2].astype(v.dtype),
                    bias + eps * g[3].astype(bias.dtype))

        q, k, v, bias = jax.lax.fori_loop(0, n, body, (q, k, v, bias))
        return q, jnp.sum(q.astype(jnp.float32))

    return run


def per_iter(make, attn, n1, n2, kmask, *args):
    t1 = wall(make(attn, n1, kmask), *args)
    t2 = wall(make(attn, n2, kmask), *args)
    return (t2 - t1) / (n2 - n1)


def main():
    from protstruc_tpu.ops.flash_attn import (
        flash_pair_bias_attention, pair_bias_attention_reference)

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    dtype = jnp.bfloat16 if (len(sys.argv) < 3 or sys.argv[2] == "bf16") \
        else jnp.float32
    n1 = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n2 = int(sys.argv[4]) if len(sys.argv) > 4 else 40
    B, H, dh = 1, 8, 32
    log(f"backend: {jax.default_backend()}  L={L} dtype={dtype.__name__} "
        f"inner n={n1}/{n2}")

    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (B, L, H, dh), dtype)
    k = jax.random.normal(ks[1], (B, L, H, dh), dtype)
    v = jax.random.normal(ks[2], (B, L, H, dh), dtype)
    bias = jax.random.normal(ks[3], (B, H, L, L), dtype)
    kmask = jnp.ones((B, L), bool).at[:, -100:].set(False)

    def bench(name, attn):
        tf = per_iter(chained_fwd, attn, n1, n2, kmask, q, k, v, bias)
        tb = per_iter(chained_fwdbwd, attn, max(n1 // 2, 2), max(n2 // 2, 8),
                      kmask, q, k, v, bias)
        log(f"{name:24s} fwd {tf*1e3:7.3f} ms   fwd+bwd {tb*1e3:7.3f} ms")
        return tf, tb

    base_f, base_b = bench("jnp", pair_bias_attention_reference)

    for tq, tk in [(128, 128), (256, 256), (256, 512), (512, 512),
                   (128, 512), (512, 1024), (256, 1024), (256, 2048),
                   (512, 2048), (1024, 1024), (128, 2048)]:
        if tq > L or tk > L:
            continue
        try:
            tf, tb = bench(
                f"flash {tq}x{tk}",
                lambda q, k, v, b, m, tq=tq, tk=tk: flash_pair_bias_attention(
                    q, k, v, b, m, tile_q=tq, tile_k=tk))
            log(f"   -> speedup fwd {base_f/tf:.2f}x  fwd+bwd {base_b/tb:.2f}x")
        except Exception as e:
            log(f"flash {tq}x{tk} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
