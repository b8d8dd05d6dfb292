"""Third MFU-push rung: where does the width curve saturate or OOM?

push2 reached 39.1% of bf16 peak at D=1280 P=640 x4 (L=256 B=4).  Probe
wider (P=768, P=1024) and one deeper D=1280 to find the single-chip
ceiling of the triangle trunk under tri_dots.

    python experiments/r4_mfu_push3.py   # writes /tmp/mfu_push3_r4.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mfu import measure, log  # noqa: E402

CONFIGS = [
    dict(D=1536, P=768, blocks=4, L=256, B=4, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    dict(D=1280, P=640, blocks=6, L=256, B=4, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    dict(D=2048, P=1024, blocks=3, L=256, B=2, pair_update="triangle",
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
            log(f"[mfu-push3] {kw} FAILED: {msg[:400]}")
            row = {"config": str(kw), "error": msg[:2000]}
        out.append(row)
        with open("/tmp/mfu_push3_r4.json", "w") as fh:
            json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
