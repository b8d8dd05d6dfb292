"""Fifth MFU-push rung: chase the single-chip ceiling past 57%.

push4: D=2560 P=1280 x3 (L=256 B=2) = 57.0% of bf16 peak, 315M-class
params; depth now mildly positive (D=2048 x6 = 54.0% vs x3 52.6%).
Probe the widest configs that can fit params + Adam states + tri_dots
residency in 15.75G.

    python experiments/r4_mfu_push5.py   # writes /tmp/mfu_push5_r4.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mfu import measure, log  # noqa: E402

CONFIGS = [
    dict(D=3072, P=1536, blocks=2, L=256, B=2, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    dict(D=2560, P=1280, blocks=4, L=256, B=2, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    dict(D=3584, P=1792, blocks=2, L=256, B=1, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
]


def main():
    import jax

    log(f"backend: {jax.default_backend()}")
    out = []
    for kw in CONFIGS:
        try:
            row = measure(**kw)
        except Exception as e:
            msg = f"{type(e).__name__}: {e}"
            log(f"[mfu-push5] {kw} FAILED: {msg[:400]}")
            row = {"config": str(kw), "error": msg[:2000]}
        out.append(row)
        with open("/tmp/mfu_push5_r4.json", "w") as fh:
            json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
