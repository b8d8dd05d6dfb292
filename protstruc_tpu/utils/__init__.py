"""Utilities: bucketed padding, serialization, profiling, compat adapters."""

from protstruc_tpu.utils.aot import CompiledFeaturizer, precompile_featurizer
from protstruc_tpu.utils.buckets import bucket_length, pad_batch_to_bucket
from protstruc_tpu.utils.serialization import (
    load_structure_batch,
    save_structure_batch,
)
