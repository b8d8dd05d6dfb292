"""Decompose TriangleMultiplication cost on-chip before fusing it (r5).

VERDICT r4 item 1: production configs (P=128-256) sit at 6.6-12.8% MFU and
the named suspect is ~15 elementwise passes over the (B, L, L, P) pair
stream per block.  Before writing a Pallas fusion, measure where the time
actually goes at the two A/B configs (D=256/P=128 and D=512/P=256):

  * trimul fwd / fwd+bwd   — the whole module (the thing to beat)
  * contract (blc layout)  — einsum("bikc,bjkc->bijc") alone on ready a/b
  * contract (bcl layout)  — same contraction with C as a leading batch dim
                             (no XLA transposes around the batched matmul)
  * lngp fwd               — the LN + 4 gate/proj Denses + sigmoids + mask
                             producing a/b (the elementwise-heavy prologue)
  * epilogue fwd           — LN(prod) + out_proj + out_gate * residual

Timing: chained-fori_loop differencing (see experiments/attn_sweep.py
docstring — host wall-clock alone is noise over the axon relay).

Usage: python experiments/r5_tri_probe.py [C] [L] [B] [n1 n2]
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
    float(out[-1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out[-1])
        best = min(best, time.perf_counter() - t0)
    return best


def chained(step, n):
    """n chained steps: step must map carry -> carry (same pytree)."""

    @jax.jit
    def run(carry):
        carry = jax.lax.fori_loop(0, n, lambda _, c: step(c), carry)
        return carry, jnp.sum(
            jax.tree_util.tree_reduce(
                lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), carry, 0.0
            )
        )

    return run


def per_iter(step, carry, n1, n2):
    t1 = wall(chained(step, n1), carry)
    t2 = wall(chained(step, n2), carry)
    return (t2 - t1) / (n2 - n1)


def main():
    from protstruc_tpu.models.trfold import TrFoldConfig, TriangleMultiplication

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n1 = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    n2 = int(sys.argv[5]) if len(sys.argv) > 5 else 12
    dtype = jnp.bfloat16
    log(f"backend: {jax.default_backend()}  B={B} L={L} C={C} bf16 n={n1}/{n2}")

    cfg = TrFoldConfig(node_dim=2 * C, pair_dim=C, dtype=dtype)
    mod = TriangleMultiplication(cfg, outgoing=True)
    key = jax.random.PRNGKey(0)
    pair = jax.random.normal(key, (B, L, L, C), dtype)
    mask = jnp.ones((B, L), bool)
    params = mod.init(key, pair, mask)["params"]
    eps = jnp.asarray(1e-3, dtype)

    nbytes = B * L * L * C * 2
    log(f"(B,L,L,C) bf16 = {nbytes/1e6:.0f} MB; "
        f"contraction flops 2BCL^3 = {2*B*C*L**3/1e9:.0f} GFLOP")

    # -- whole module ------------------------------------------------------
    def tri_fwd(p):
        out = mod.apply({"params": params}, p, mask)
        return (p + eps * out).astype(dtype)

    t = per_iter(tri_fwd, pair, n1, n2)
    log(f"trimul fwd          {t*1e3:8.2f} ms")

    def tri_loss(p):
        out = mod.apply({"params": params}, p, mask)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def tri_fwdbwd(p):
        g = jax.grad(tri_loss)(p)
        return (p + eps * g.astype(dtype)).astype(dtype)

    t = per_iter(tri_fwdbwd, pair, max(n1 // 2, 2), max(n2 // 2, 4))
    log(f"trimul fwd+bwd      {t*1e3:8.2f} ms")

    # -- contraction alone, both layouts ----------------------------------
    a = jax.random.normal(key, (B, L, L, C), dtype)
    b = jax.random.normal(key, (B, L, L, C), dtype)

    def contract_blc(ab):
        a, b = ab
        prod = jnp.einsum("bikc,bjkc->bijc", a, b)
        return ((a + eps * prod).astype(dtype), b)

    t = per_iter(contract_blc, (a, b), n1, n2)
    log(f"contract blc fwd    {t*1e3:8.2f} ms")

    at = jnp.moveaxis(a, -1, 1)
    bt = jnp.moveaxis(b, -1, 1)

    def contract_bcl(ab):
        a, b = ab
        prod = jnp.einsum("bcik,bcjk->bcij", a, b)
        return ((a + eps * prod).astype(dtype), b)

    t = per_iter(contract_bcl, (at, bt), n1, n2)
    log(f"contract bcl fwd    {t*1e3:8.2f} ms")

    # -- prologue: LN + gates/projs -> a, b -------------------------------
    import flax.linen as nn

    class LNGP(nn.Module):
        @nn.compact
        def __call__(self, pair, mask):
            src = nn.LayerNorm(dtype=dtype, name="ln_in")(pair)
            m = (mask[:, :, None] & mask[:, None, :]).astype(dtype)[..., None]
            a = nn.sigmoid(nn.Dense(C, name="a_gate", dtype=dtype)(src)) * \
                nn.Dense(C, name="a_proj", dtype=dtype)(src) * m
            b = nn.sigmoid(nn.Dense(C, name="b_gate", dtype=dtype)(src)) * \
                nn.Dense(C, name="b_proj", dtype=dtype)(src) * m
            return a, b

    lngp = LNGP()
    lp = lngp.init(key, pair, mask)["params"]

    def lngp_fwd(p):
        a, b = lngp.apply({"params": lp}, p, mask)
        return (p + eps * (a - b)).astype(dtype)

    t = per_iter(lngp_fwd, pair, n1, n2)
    log(f"lngp fwd            {t*1e3:8.2f} ms")

    def lngp_loss(p):
        a, b = lngp.apply({"params": lp}, p, mask)
        return jnp.sum(a.astype(jnp.float32) ** 2) - jnp.sum(
            b.astype(jnp.float32) ** 2)

    def lngp_fwdbwd(p):
        g = jax.grad(lngp_loss)(p)
        return (p + eps * g.astype(dtype)).astype(dtype)

    t = per_iter(lngp_fwdbwd, pair, max(n1 // 2, 2), max(n2 // 2, 4))
    log(f"lngp fwd+bwd        {t*1e3:8.2f} ms")

    # -- epilogue: LN(prod) + out_proj, gate on src, residual -------------
    class Epi(nn.Module):
        @nn.compact
        def __call__(self, pair, prod):
            g = nn.sigmoid(nn.Dense(C, name="out_gate", dtype=dtype)(pair))
            upd = nn.Dense(C, name="out_proj", dtype=dtype)(
                nn.LayerNorm(dtype=dtype, name="ln_out")(prod))
            return pair + g * upd

    epi = Epi()
    ep = epi.init(key, pair, a)["params"]

    def epi_fwd(carry):
        p, prod = carry
        out = epi.apply({"params": ep}, p, prod)
        return (out.astype(dtype), prod)

    t = per_iter(epi_fwd, (pair, a), n1, n2)
    log(f"epilogue fwd        {t*1e3:8.2f} ms")

    # -- raw stream calibration: one LN pass, one Dense pass --------------
    ln = nn.LayerNorm(dtype=dtype)
    lnp = ln.init(key, pair)["params"]

    def ln_fwd(p):
        return (ln.apply({"params": lnp}, p) + eps * p).astype(dtype)

    t = per_iter(ln_fwd, pair, n1, n2)
    log(f"layernorm fwd       {t*1e3:8.2f} ms  "
        f"({2*nbytes/t/1e9:.0f} GB/s effective r+w)")

    dn = nn.Dense(C, dtype=dtype)
    dp = dn.init(key, pair)["params"]

    def dn_fwd(p):
        return (dn.apply({"params": dp}, p) + eps * p).astype(dtype)

    t = per_iter(dn_fwd, pair, n1, n2)
    log(f"dense CxC fwd       {t*1e3:8.2f} ms  "
        f"({2*nbytes/t/1e9:.0f} GB/s effective r+w, "
        f"{2*B*L*L*C*C/t/1e12:.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
