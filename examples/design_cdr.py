"""CDR redesign workflow: antibody masks + InverseFold composition.

Loads an antibody, trains InverseFold briefly on its backbone, then reports
designed sequences for the H3 loop — the library-composition showcase
(Chothia masks -> backbone featurization -> model -> per-loop decoding).

    python examples/design_cdr.py tests/data/6dc4.pdb H L
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "tests/data/6dc4.pdb"
    heavy = sys.argv[2] if len(sys.argv) > 2 else "H"
    light = sys.argv[3] if len(sys.argv) > 3 else "L"

    import jax

    import protstruc_tpu as ps
    from protstruc_tpu.models.inverse_fold import (
        InverseFold,
        InverseFoldConfig,
        featurize_backbone,
        if_train_step,
        make_if_train_state,
        sequence_recovery,
    )
    from protstruc_tpu.vocab import resindex_to_oneletter

    ab = ps.AntibodyStructureBatch.from_pdb(path, heavy, light, keep_fv_only=True)
    print(f"{path}: Fv region, {ab.n_residues} residues")

    feats = featurize_backbone(ab)
    cfg = InverseFoldConfig(node_dim=64, pair_dim=16, n_heads=2, n_blocks=2)
    model = InverseFold(cfg)
    params, opt, tx = make_if_train_state(model, feats, jax.random.PRNGKey(0), 2e-3)
    jstep = jax.jit(functools.partial(if_train_step, model=model, tx=tx))

    for i in range(100):
        params, opt, loss = jstep(params, opt, feats)
    rec = float(sequence_recovery(params, model, feats))
    print(f"trained: loss {float(loss):.3f}, overall recovery {rec:.0%}")

    logits = model.apply({"params": params}, feats)
    pred = np.asarray(logits.argmax(-1))[0]
    native = np.asarray(feats["target_seq"])[0]

    for loop in ["H1", "H2", "H3", "L1", "L2", "L3"]:
        m = np.asarray(ab.get_cdr_mask(loop))[0]
        if not m.any():
            continue
        nat = "".join(resindex_to_oneletter[int(i)] for i in native[m])
        des = "".join(resindex_to_oneletter[int(i)] for i in pred[m])
        match = np.mean(native[m] == pred[m])
        print(f"{loop}: native {nat}  designed {des}  ({match:.0%})")


if __name__ == "__main__":
    main()
