"""On-chip A/B for the flash backward schedule (ops/flash_attn.py).

Axes, at the bench [attn]-style config (B=1 H=8 L=4096 bf16, fwd+bwd
through a scalar loss; dh from argv):

  block shape   backward (tile_q, tile_k) — pipelined buffer footprint
  strip width   in-kernel sub_k — the f32 temporaries bound

Both are passed through ``bwd_tiles=(tq, tk, sub_k)``, i.e. real traced
arguments — an earlier version of this script toggled a module global
around the forward call and silently never varied the strip width (the
custom_vjp backward traces after the forward returns).

Timing: chained fori_loop differencing (see experiments/attn_sweep.py).
Session-noise calibration: identical-kernel repeats in earlier runs
spread ~15%, so only same-session gaps well beyond that are real.

    python experiments/attn_strips_ab.py [L] [n1 n2] [dh]
"""

import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))  # repo root: protstruc_tpu
sys.path.insert(0, _here)                   # sibling: attn_sweep

import jax
import jax.numpy as jnp

from attn_sweep import chained_fwdbwd, log, per_iter  # noqa: E402


def main():
    from protstruc_tpu.ops.flash_attn import (
        flash_pair_bias_attention, pair_bias_attention_reference)

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n1 = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n2 = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    dh = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    B, H = 1, 8
    log(f"backend: {jax.default_backend()}  L={L} dh={dh} bf16  "
        f"inner n={n1}/{n2}")

    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (B, L, H, dh), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, L, H, dh), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, L, H, dh), jnp.bfloat16)
    bias = jax.random.normal(ks[3], (B, H, L, L), jnp.bfloat16)
    kmask = jnp.ones((B, L), bool).at[:, -100:].set(False)

    def flash(bwd_tiles):
        return lambda *a: flash_pair_bias_attention(*a, bwd_tiles=bwd_tiles)

    variants = [
        ("jnp", pair_bias_attention_reference),
        # block 512x2048 (the fwd default) across strip widths
        ("512blk/s256", flash((512, 2048, 256))),
        ("512blk/s512", flash((512, 2048, 512))),
        ("512blk/whole", flash((512, 2048, 2048))),
        # block 256x2048 across strip widths
        ("256blk/s512", flash((256, 2048, 512))),
        ("256blk/s1024", flash((256, 2048, 1024))),
        ("256blk/whole", flash((256, 2048, 2048))),
    ]
    base = None
    for name, attn in variants:
        try:
            tb = per_iter(chained_fwdbwd, attn, n1, n2, kmask, q, k, v, bias)
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            log(f"{name:14s} FAILED: {type(e).__name__}: {e}")
            continue
        extra = ""
        if base is None:
            base = tb
        else:
            extra = f"   speedup {base/tb:.2f}x"
        log(f"{name:14s} fwd+bwd {tb*1e3:7.3f} ms{extra}")


if __name__ == "__main__":
    main()
