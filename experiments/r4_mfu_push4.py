"""Fourth (final) MFU-push rung: past 52.6% — find the single-chip ceiling.

push3: D=2048 P=1024 x3 (L=256 B=2) = 52.6% of bf16 peak.  Probe wider
(P=1280), deeper at the same width, and a longer-L variant to complete
the curve.

    python experiments/r4_mfu_push4.py   # writes /tmp/mfu_push4_r4.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mfu import measure, log  # noqa: E402

CONFIGS = [
    dict(D=2560, P=1280, blocks=3, L=256, B=2, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    dict(D=2048, P=1024, blocks=6, L=256, B=2, pair_update="triangle",
         remat=True, remat_policy="tri_dots"),
    dict(D=2048, P=1024, blocks=3, L=384, B=1, pair_update="triangle",
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
            log(f"[mfu-push4] {kw} FAILED: {msg[:400]}")
            row = {"config": str(kw), "error": msg[:2000]}
        out.append(row)
        with open("/tmp/mfu_push4_r4.json", "w") as fh:
            json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
