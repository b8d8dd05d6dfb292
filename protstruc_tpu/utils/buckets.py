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

__all__ = ["DEFAULT_BUCKETS", "bucket_length", "pad_batch_to_bucket", "concat_batches"]

#: Default residue-length buckets: fine-grained at common protein sizes,
#: multiples of 128 (TPU lane width) from 256 up.
DEFAULT_BUCKETS = (64, 128, 256, 384, 512, 768, 1024, 1536, 2048)


def bucket_length(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket >= n; rounds up to a multiple of 128 beyond the table."""
    for b in buckets:
        if n <= b:
            return b
    return (n + 127) // 128 * 128


def concat_batches(batches, buckets: Sequence[int] = DEFAULT_BUCKETS):
    """Concatenate StructureBatches along B, padding L to a common bucket.

    Metadata (chain_ids/seq) concatenates when present on every input,
    otherwise drops to None.  Standardized batches cannot be mixed with
    unstandardized ones.
    """
    if not batches:
        raise ValueError("concat_batches needs at least one batch")
    if len({b.standardized for b in batches}) > 1:
        raise ValueError("cannot concat standardized with unstandardized batches")

    target = bucket_length(max(b.n_residues for b in batches), buckets)
    padded = [
        pad_batch_to_bucket(b, (target,)) if b.n_residues != target else b
        for b in batches
    ]

    def cat(field):
        return jnp.concatenate([getattr(b, field) for b in padded], axis=0)

    chain_ids = None
    if all(b.chain_ids is not None for b in batches):
        chain_ids = sum((b.chain_ids for b in batches), ())
    seq = None
    if all(b.seq is not None for b in batches):
        seq = sum((b.seq for b in batches), ())

    first = padded[0]
    out = first.replace(
        xyz=cat("xyz"),
        atom_mask=cat("atom_mask"),
        chain_idx=cat("chain_idx"),
        residue_idx=cat("residue_idx"),
        mu=cat("mu") if first.mu is not None else None,
        std=cat("std") if first.std is not None else None,
        chain_ids=chain_ids,
        seq=seq,
    )
    # antibody batches: either ALL inputs carry residue_masks or none —
    # a plain first batch must not silently discard later batches' masks
    have_masks = [bool(getattr(b, "residue_masks", None)) for b in padded]
    if any(have_masks):
        if not all(have_masks):
            raise ValueError("cannot concat antibody batches with plain batches")
        out = out.replace(
            residue_masks={
                k: jnp.concatenate([b.residue_masks[k] for b in padded], axis=0)
                for k in first.residue_masks
            },
            # per-structure static metadata (length-B tuples) concatenates
            # alongside B — keeping the first batch's tuple would leave
            # get_heavy_chain_id() one entry short per appended structure
            heavy_chain_id=_cat_tuples(padded, "heavy_chain_id"),
            light_chain_id=_cat_tuples(padded, "light_chain_id"),
            antigen_chain_ids=_cat_tuples(padded, "antigen_chain_ids"),
        )
    return out


def _cat_tuples(batches, field):
    """Concatenate per-structure tuple metadata; None if absent anywhere."""
    vals = [getattr(b, field, None) for b in batches]
    if any(v is None for v in vals):
        return None
    return sum(vals, ())


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

    out = batch.replace(
        xyz=pad(batch.xyz, 0.0),
        atom_mask=pad(batch.atom_mask, False),
        chain_idx=pad(batch.chain_idx, PAD_IDX),
        residue_idx=pad(batch.residue_idx, PAD_IDX),
    )
    # antibody batches carry named (B, L) residue masks that must pad along
    if getattr(batch, "residue_masks", None):
        out = out.replace(
            residue_masks={k: pad(v, False) for k, v in batch.residue_masks.items()}
        )
    return out
