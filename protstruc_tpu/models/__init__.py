"""Model zoo built on protstruc-tpu featurization.

The reference library feeds external deep-learning pipelines but ships no
models; this package provides TPU-native reference models that consume the
library's featurization directly:

* ``trfold.TrFold`` — flagship trRosetta-style pair-representation network:
  6D geometry maps -> distogram + backbone-torsion prediction, with
  dp/sp/tp-shardable parameters and activations.
* ``trfold.DiffusionDenoiser`` — epsilon-prediction head over noisy
  coordinates for the Euclidean diffusion pipeline (ops/diffusion.py).
* ``inverse_fold.InverseFold`` — fixed-backbone sequence design
  (ProteinMPNN-style) with distance-kernel attention neighborhoods.
* ``moe.MoEMLP`` — Switch-style expert layer with 'ep' sharding.
* ``ipa.StructureModule`` / ``ipa.FoldModel`` — AlphaFold-2-style invariant
  point attention over rigid frames: end-to-end on-device structure decode
  (no host MDS), trained with FAPE.
* ``framediff.FrameDenoiser`` — SE(3) diffusion over backbone frames
  (IGSO3 rotations + Euclidean translations) for generative backbone
  design, sampled under one ``lax.scan``.
"""

from protstruc_tpu.models.trfold import (
    TrFold,
    TrFoldConfig,
    DiffusionDenoiser,
    make_train_state,
    train_step,
    param_shardings,
)
from protstruc_tpu.models.inverse_fold import InverseFold, InverseFoldConfig
from protstruc_tpu.models.moe import MoEMLP
from protstruc_tpu.models.framediff import (
    FrameDenoiser,
    FrameDiffConfig,
    framediff_loss,
    framediff_sample,
    frameflow_loss,
    frameflow_sample,
)
from protstruc_tpu.models.ipa import (
    FoldModel,
    IPAConfig,
    InvariantPointAttention,
    StructureModule,
    fape_loss,
    fold_loss_fn,
)
