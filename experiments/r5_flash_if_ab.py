"""Flash-attention end-to-end A/B where attention is a first-order cost.

VERDICT r4 item 2: the committed TrFold train-step A/B at a pair-dominated
config (D=256/P=128/L=2048) was a wash — the O(L^2 P^2) pair mixing dwarfs
node attention there.  This harness A/Bs the *InverseFold* train step
(pair-lite, node-heavy: the pair tensor only feeds an (B,H,L,L) attention
bias, there is no pair-stream mixing at all), where the jnp path's
materialized logits/probs planes are the dominant HBM traffic and flash
should show an honest end-to-end win.

Usage:
    python experiments/r5_flash_if_ab.py [L ...]     # default 2048 4096

Prints one JSON object per config pair on stdout; human lines on stderr.
Timing protocol: jit-compiled full train step (teacher-forced AR loss,
value_and_grad + adamw update), min-of-2 rounds of 10 chained steps,
fetching only the scalar loss (CLAUDE.md relay rules).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(L, use_flash, B=1, D=256, P=32, heads=8, blocks=3, dec_blocks=3):
    import optax

    import protstruc_tpu as ps
    from protstruc_tpu.models.inverse_fold import (
        InverseFold, InverseFoldConfig, featurize_backbone, if_ar_loss,
        make_if_train_state)

    cfg = InverseFoldConfig(
        node_dim=D, pair_dim=P, n_heads=heads, n_blocks=blocks,
        n_decoder_blocks=dec_blocks, dtype=jnp.bfloat16,
        use_flash_attn=use_flash)
    model = InverseFold(cfg)

    rng = np.random.RandomState(0)
    xyz = rng.randn(B, L, 15, 3).astype(np.float32) * 5.0
    seq = rng.randint(0, 20, (B, L))
    sb = ps.StructureBatch.from_xyz(xyz)
    feats = featurize_backbone(sb)
    feats["target_seq"] = jnp.asarray(seq, jnp.int32)

    key = jax.random.PRNGKey(0)
    # init needs the decoder inputs present
    from protstruc_tpu.models.inverse_fold import random_decode_order
    init_feats = dict(feats, prev_seq=feats["target_seq"],
                      decode_rank=random_decode_order(key, (B, L)))
    params, opt_state, tx = make_if_train_state(model, init_feats, key)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    def step(params, opt_state, feats, key):
        loss, grads = jax.value_and_grad(if_ar_loss)(params, model, feats, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    name = (f"IF D={D} P={P} H={heads} enc={blocks} dec={dec_blocks} "
            f"L={L} B={B} bf16{'+flash' if use_flash else ''}")
    t0 = time.perf_counter()
    params, opt_state, loss = jstep(params, opt_state, feats, key)
    l0 = float(loss)
    log(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s "
        f"loss={l0:.3f} params={n_params/1e6:.1f}M")

    for _ in range(2):
        params, opt_state, loss = jstep(params, opt_state, feats, key)
    float(loss)
    iters = 10
    best = None
    for _ in range(2):  # min-of-2 rounds vs relay stalls
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = jstep(params, opt_state, feats, key)
        float(loss)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    log(f"[{name}] {best*1e3:.1f} ms/step (loss {float(loss):.3f})")
    return {"config": name, "ms": round(best * 1e3, 2),
            "loss": round(float(loss), 4)}


def main():
    lengths = [int(a) for a in sys.argv[1:]] or [2048, 4096]
    log(f"backend: {jax.default_backend()}")
    out = {"experiment": "experiments/r5_flash_if_ab.py",
           "hardware": f"{jax.default_backend()} ({len(jax.devices())})",
           "setup": "InverseFold AR train step (enc 3 + dec 3 blocks, "
                    "D=256, P=32, H=8, dh=32, bf16, adamw), teacher-forced "
                    "if_ar_loss; pair tensor is attention bias only",
           "rows": []}
    for L in lengths:
        jn = measure(L, use_flash=False)
        fl = measure(L, use_flash=True)
        speedup = round(jn["ms"] / fl["ms"], 3)
        log(f"[A/B] L={L}: jnp {jn['ms']} ms vs flash {fl['ms']} ms "
            f"-> {speedup}x")
        out["rows"].append({"L": L, "jnp_ms": jn["ms"], "flash_ms": fl["ms"],
                            "speedup": speedup,
                            "jnp_loss": jn["loss"], "flash_loss": fl["loss"]})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
