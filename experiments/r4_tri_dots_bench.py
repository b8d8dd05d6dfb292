"""Measure the remat_policy='tri_dots' step-time win on the live chip.

A/B at the two largest committed MFU-sweep configs: full-recompute remat
vs saving the triangle-contraction outputs (models/trfold.py
_remat_policy).  Policies change the backward recompute only, so the
honest comparison is ms/step at fixed config — cost_analysis flops DROP
when the recompute disappears.

    python experiments/r4_tri_dots_bench.py   # writes /tmp/tri_dots_r4.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))   # experiments/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mfu import DEFAULT_SWEEP, measure, log  # noqa: E402  (experiments/ sibling)

# A/B the sweep's committed tri_dots rows (single source of truth): the
# same config runs with remat_policy none vs tri_dots below.
CONFIGS = [{k: v for k, v in kw.items() if k != "remat_policy"}
           for kw in DEFAULT_SWEEP if kw.get("remat_policy") == "tri_dots"]


def main():
    import jax

    log(f"backend: {jax.default_backend()}")
    out = []
    for base in CONFIGS:
        pair = {}
        for policy in ("none", "tri_dots"):
            try:
                pair[policy] = measure(**base, remat_policy=policy)
            except Exception as e:
                log(f"[tri-dots] {base} {policy} FAILED: "
                    f"{type(e).__name__}: {e}")
                pair[policy] = {"error": f"{type(e).__name__}: {e}"}
        row = {"base": str(base), **{f"policy_{k}": v
                                     for k, v in pair.items()}}
        a, b = pair.get("none", {}).get("ms"), pair.get("tri_dots", {}).get("ms")
        if a and b:
            row["speedup"] = round(a / b, 3)
            log(f"[tri-dots] {base}: {a} -> {b} ms/step ({a/b:.2f}x)")
        out.append(row)
    with open("/tmp/tri_dots_r4.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
