"""Push the peak-MFU row: tri_dots A/B at the sweep's best config + scale-ups.

The committed sweep peaks at D=768 P=384 x4, L=256 B=8 = 26.7% of bf16
peak with plain per-block remat.  At L=256 the tri_dots saved
activations are small ((8,256,256,384) bf16 = 48 MB per contraction), so
the HBM trade that OOM'd L=512 should fit with room to spare; also probe
one deeper and one wider variant under tri_dots.

    python experiments/r4_mfu_push.py    # writes /tmp/mfu_push_r4.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mfu import measure, log  # noqa: E402

CONFIGS = [
    # A/B on the committed peak row.
    dict(D=768, P=384, blocks=4, L=256, B=8, pair_update="triangle",
         remat=True, remat_policy="none"),
    dict(D=768, P=384, blocks=4, L=256, B=8, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    # Deeper at the same width (amortizes embed/head overhead).
    dict(D=768, P=384, blocks=6, L=256, B=8, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    # Wider still.
    dict(D=896, P=448, blocks=4, L=256, B=8, pair_update="triangle",
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
            log(f"[mfu-push] {kw} FAILED: {msg[:400]}")
            row = {"config": str(kw), "error": msg[:2000]}
        out.append(row)
        with open("/tmp/mfu_push_r4.json", "w") as fh:
            json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
