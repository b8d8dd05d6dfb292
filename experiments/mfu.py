"""Measure TrFold train-step time + XLA FLOP count -> MFU on the TPU.

Prints step time, XLA's own cost-analysis FLOP count for the compiled
step, achieved TFLOP/s, and the fraction of TPU v5e peak (197 TFLOP/s
bf16 / ~49 TFLOP/s for f32-precision matmuls).  Feeds the MFU paragraph
in docs/guides/performance.md (VERDICT r1 item 9).

Usage: python experiments/mfu.py   (default env = real TPU)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

B, L = 4, 512
PEAK_BF16 = 197e12  # TPU v5e MXU peak, bf16
PEAK_F32 = 49e12    # ~bf16/4: f32-precision matmuls via 6-pass bf16 emulation


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(dtype_name, dtype):
    import optax

    from protstruc_tpu.models.trfold import (
        TrFold, TrFoldConfig, featurize_for_model, loss_fn, make_train_state)
    import protstruc_tpu as ps

    cfg = TrFoldConfig(node_dim=128, pair_dim=64, n_heads=8, n_blocks=3,
                       dtype=dtype)
    model = TrFold(cfg)

    rng = np.random.RandomState(0)
    xyz = rng.randn(B, L, 15, 3).astype(np.float32) * 5.0
    sb = ps.StructureBatch.from_xyz(xyz)
    feats = featurize_for_model(sb)
    params, opt_state, tx = make_train_state(model, feats, jax.random.PRNGKey(0))

    def step(params, opt_state, feats):
        loss, grads = jax.value_and_grad(loss_fn)(params, model, feats)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    lowered = jstep.lower(params, opt_state, feats)
    compiled = lowered.compile()
    try:
        flops = compiled.cost_analysis()["flops"]
    except Exception:
        flops = float("nan")

    t0 = time.perf_counter()
    params, opt_state, loss = jstep(params, opt_state, feats)
    l0 = float(loss)
    log(f"[{dtype_name}] compile+first step {time.perf_counter()-t0:.1f}s, "
        f"loss={l0:.3f}")

    # warm + timed (checksum protocol: fetch only the scalar loss)
    for _ in range(2):
        params, opt_state, loss = jstep(params, opt_state, feats)
    float(loss)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = jstep(params, opt_state, feats)
    float(loss)
    dt = (time.perf_counter() - t0) / iters

    peak = PEAK_BF16 if dtype == jnp.bfloat16 else PEAK_F32
    tflops = flops / dt / 1e12
    log(f"[{dtype_name}] {dt*1e3:.1f} ms/step, XLA flops/step = {flops/1e9:.2f} G "
        f"-> {tflops:.2f} TFLOP/s achieved = {100*flops/dt/peak:.1f}% of "
        f"{peak/1e12:.0f} TFLOP/s peak ({dtype_name})"
        f" = {100*flops/dt/PEAK_BF16:.2f}% of bf16 peak")
    return dt, flops


def main():
    log(f"backend: {jax.default_backend()}")
    measure("f32", jnp.float32)
    measure("bf16", jnp.bfloat16)


if __name__ == "__main__":
    main()
