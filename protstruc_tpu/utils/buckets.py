"""Bucketed padding of the residue axis.

Every distinct (B, L, A) shape triggers an XLA recompilation.  The reference
pads each batch to its own max length (protstruc.py:171-176) — fine eagerly,
pathological under jit.  Bucketing rounds L up to a bounded set of sizes so
the number of compiled programs stays small (SURVEY.md §5 long-context
notes; the one genuinely new config surface of the TPU rebuild).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

__all__ = ["DEFAULT_BUCKETS", "bucket_length", "pad_batch_to_bucket"]

#: Default residue-length buckets: fine-grained at common protein sizes,
#: multiples of 128 (TPU lane width) from 256 up.
DEFAULT_BUCKETS = (64, 128, 256, 384, 512, 768, 1024, 1536, 2048)


def bucket_length(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket >= n; rounds up to a multiple of 128 beyond the table."""
    for b in buckets:
        if n <= b:
            return b
    return (n + 127) // 128 * 128


def pad_batch_to_bucket(batch, buckets: Sequence[int] = DEFAULT_BUCKETS):
    """Pad a StructureBatch's residue axis up to its bucket size.

    Padding uses the library's standard conventions: zero coords, False
    masks, -1 integer indices.  No-op if L is already a bucket size.
    """
    from protstruc_tpu.batch import PAD_IDX

    L = batch.n_residues
    target = bucket_length(L, buckets)
    if target == L:
        return batch
    extra = target - L

    def pad(x, value):
        widths = [(0, 0), (0, extra)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, widths, constant_values=value)

    return batch.replace(
        xyz=pad(batch.xyz, 0.0),
        atom_mask=pad(batch.atom_mask, False),
        chain_idx=pad(batch.chain_idx, PAD_IDX),
        residue_idx=pad(batch.residue_idx, PAD_IDX),
    )
