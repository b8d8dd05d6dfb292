"""Second MFU-push rung: keep widening under tri_dots past the 32.9% row.

r4_mfu_push showed width still pays at L=256 (D=896 P=448 x4 = 32.9% of
bf16 peak).  Probe D=1024 P=512 and a deeper D=896, plus one L=384
variant to check the length axis at these widths.

    python experiments/r4_mfu_push2.py   # writes /tmp/mfu_push2_r4.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mfu import measure, log  # noqa: E402

CONFIGS = [
    dict(D=1024, P=512, blocks=4, L=256, B=8, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    dict(D=896, P=448, blocks=6, L=256, B=8, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    dict(D=896, P=448, blocks=4, L=384, B=4, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    dict(D=1280, P=640, blocks=4, L=256, B=4, pair_update="triangle",
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
            log(f"[mfu-push2] {kw} FAILED: {msg[:400]}")
            row = {"config": str(kw), "error": msg[:2000]}
        out.append(row)
        with open("/tmp/mfu_push2_r4.json", "w") as fh:
            json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
