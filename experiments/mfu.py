"""TrFold train-step MFU sweep: width/depth/pair-update curve on the TPU.

For each config: step time (checksum protocol — fetch only the scalar
loss), XLA's own cost-analysis FLOP count for the compiled step, achieved
TFLOP/s, and % of TPU v5e peak (197 TFLOP/s bf16; ~49 TFLOP/s for
f32-precision matmuls via 6-pass bf16 emulation).  Feeds the MFU section
of docs/guides/performance.md (VERDICT r3 item 3: measure the curve up to
the largest step that fits one chip instead of asserting it).

Usage:
    python experiments/mfu.py                 # the default sweep
    python experiments/mfu.py D P BLOCKS [L] [B] [pair_update] [dtype] \
                              [flash] [remat]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

PEAK_BF16 = 197e12
PEAK_F32 = 49e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(D, P, blocks, L=512, B=4, pair_update="mix", dtype_name="bf16",
            remat=False, heads=8, remat_policy="none", use_flash_attn=False,
            fused_tri=False):
    import optax

    from protstruc_tpu.models.trfold import (
        TrFold, TrFoldConfig, featurize_for_model, loss_fn, make_train_state)
    import protstruc_tpu as ps

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    cfg = TrFoldConfig(node_dim=D, pair_dim=P, n_heads=heads, n_blocks=blocks,
                       dtype=dtype, pair_update=pair_update, remat=remat,
                       remat_policy=remat_policy, use_flash_attn=use_flash_attn,
                       fused_tri=fused_tri)
    model = TrFold(cfg)

    rng = np.random.RandomState(0)
    xyz = rng.randn(B, L, 15, 3).astype(np.float32) * 5.0
    sb = ps.StructureBatch.from_xyz(xyz)
    feats = featurize_for_model(sb)
    params, opt_state, tx = make_train_state(model, feats, jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    def step(params, opt_state, feats):
        loss, grads = jax.value_and_grad(loss_fn)(params, model, feats)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    compiled = jstep.lower(params, opt_state, feats).compile()
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")

    name = (f"D={D} P={P} b={blocks} L={L} B={B} {pair_update}"
            f"{'+remat' if remat else ''}"
            f"{'/' + remat_policy if remat and remat_policy != 'none' else ''}"
            f"{'+flash' if use_flash_attn else ''}"
            f"{'+fused_tri' if fused_tri else ''}"
            f" {dtype_name}")
    t0 = time.perf_counter()
    params, opt_state, loss = jstep(params, opt_state, feats)
    l0 = float(loss)
    log(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s loss={l0:.3f} "
        f"params={n_params/1e6:.1f}M")

    for _ in range(2):
        params, opt_state, loss = jstep(params, opt_state, feats)
    float(loss)
    iters = 10
    best = None
    for _ in range(2):  # min-of-2 rounds vs relay stalls
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = jstep(params, opt_state, feats)
        float(loss)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    dt = best

    peak = PEAK_BF16 if dtype == jnp.bfloat16 else PEAK_F32
    log(f"[{name}] {dt*1e3:.1f} ms/step, {flops/1e9:.0f} GFLOP "
        f"-> {flops/dt/1e12:.2f} TFLOP/s = {100*flops/dt/peak:.1f}% of "
        f"{peak/1e12:.0f}T peak = {100*flops/dt/PEAK_BF16:.2f}% of bf16 peak")
    return {"config": name, "ms": round(dt * 1e3, 1),
            "gflop": round(flops / 1e9, 1),
            "tflops": round(flops / dt / 1e12, 2),
            "pct_bf16_peak": round(100 * flops / dt / PEAK_BF16, 2),
            "params_m": round(n_params / 1e6, 1)}


DEFAULT_SWEEP = [
    # the r3 baseline points (gated mix)
    dict(D=128, P=64, blocks=3, dtype_name="f32"),
    dict(D=128, P=64, blocks=3),
    dict(D=384, P=128, blocks=6),
    # width scaling, gated mix
    dict(D=512, P=256, blocks=6),
    # production-shape: triangle updates + remat at increasing width
    dict(D=256, P=128, blocks=4, pair_update="triangle", remat=True),
    dict(D=384, P=192, blocks=6, pair_update="triangle", remat=True),
    dict(D=512, P=256, blocks=6, pair_update="triangle", remat=True),
    # batch scaling at the big config (amortize optimizer HBM traffic)
    dict(D=512, P=256, blocks=6, pair_update="triangle", remat=True, B=8,
         L=384),
    # remat_policy="tri_dots": save the triangle-contraction outputs so the
    # backward skips the O(L^3 P) recompute.  NOTE: cost_analysis flops
    # DROP with the recompute gone, so compare ms/step at fixed config —
    # pct_bf16_peak across policies is not apples-to-apples.
    dict(D=512, P=256, blocks=6, pair_update="triangle", remat=True,
         remat_policy="tri_dots"),
    dict(D=640, P=320, blocks=6, pair_update="triangle", remat=True, L=384,
         remat_policy="tri_dots"),
    # the r4 width-push rungs (experiments/r4_mfu_push*.py) that produced
    # the 6.6% -> 59.6% curve committed in docs/quality/mfu_sweep_r4.json;
    # listed here so the default sweep reproduces the whole curve
    dict(D=768, P=384, blocks=4, L=256, B=8, pair_update="triangle",
         remat=True),
    dict(D=896, P=448, blocks=4, L=256, B=8, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    dict(D=1024, P=512, blocks=4, L=256, B=8, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    dict(D=1280, P=640, blocks=4, L=256, B=4, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    dict(D=1536, P=768, blocks=4, L=256, B=4, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    dict(D=2048, P=1024, blocks=3, L=256, B=2, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    dict(D=2560, P=1280, blocks=3, L=256, B=2, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    dict(D=3072, P=1536, blocks=2, L=256, B=2, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
]


def main():
    log(f"backend: {jax.default_backend()}")
    if len(sys.argv) > 1:
        D, P, blocks = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
        L = int(sys.argv[4]) if len(sys.argv) > 4 else 512
        B = int(sys.argv[5]) if len(sys.argv) > 5 else 4
        pu = sys.argv[6] if len(sys.argv) > 6 else "mix"
        dt = sys.argv[7] if len(sys.argv) > 7 else "bf16"
        extras = set(sys.argv[8:])
        rows = [measure(D, P, blocks, L=L, B=B, pair_update=pu,
                        dtype_name=dt,
                        remat=pu == "triangle" or "remat" in extras,
                        use_flash_attn="flash" in extras)]
    else:
        rows = []
        for kw in DEFAULT_SWEEP:
            try:
                rows.append(measure(**kw))
            except Exception as e:
                log(f"[sweep] {kw} FAILED: {type(e).__name__}: {e}")
                rows.append({"config": str(kw), "error": str(e)})
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
