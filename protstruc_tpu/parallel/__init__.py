"""Device-mesh parallelism for protstruc-tpu.

The reference has no distributed story (single-process torch; SURVEY.md §5).
This package is the TPU-native design that replaces it: a named
``jax.sharding.Mesh`` over (dp, sp, tp) axes, sharding rules for
StructureBatch pytrees and model parameters, and pjit-compiled featurization
/ training steps where XLA inserts the ICI collectives.
"""

from protstruc_tpu.parallel.mesh import (
    make_mesh,
    batch_pspecs,
    shard_batch,
    featurize_sharded,
)
from protstruc_tpu.parallel.zero import (
    zero1_opt_shardings,
    shard_opt_state_zero1,
)
