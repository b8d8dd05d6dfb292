"""On-chip A/B for the bwd key-strip kernel (ops/flash_attn.py).

Compares, at the bench [attn] pinned config (B=1 H=8 dh=32 L=4096 bf16,
fwd+bwd through a scalar loss):

  jnp            XLA's fused reference path
  flash-strips   new default: bwd block 512x2048, in-kernel sub_k=512 strips
  flash-capped   the r4 interim cap: bwd block 256x2048 (no strips needed)

Timing: chained fori_loop differencing (see experiments/attn_sweep.py).

    python experiments/attn_strips_ab.py [L] [n1 n2]
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

    import protstruc_tpu.ops.flash_attn as fa

    def with_subk(sub_k, bwd_tiles=None):
        def attn(*a):
            fa._BWD_SUB_K = sub_k
            try:
                return fa.flash_pair_bias_attention(*a, bwd_tiles=bwd_tiles)
            finally:
                fa._BWD_SUB_K = 512
        return attn

    variants = [
        ("jnp", pair_bias_attention_reference),
        # block 512x2048 (the fwd default) at three strip widths
        ("512blk/s256", with_subk(256, (512, 2048))),
        ("512blk/s512", with_subk(512, (512, 2048))),
        # block 256x2048 at two strip widths
        ("256blk/s512", with_subk(512, (256, 2048))),
        ("256blk/s1024", with_subk(1024, (256, 2048))),
        ("256blk/whole", with_subk(2048, (256, 2048))),
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
