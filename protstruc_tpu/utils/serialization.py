"""StructureBatch persistence (checkpoint/resume).

The reference has no batch serialization (SURVEY.md §5 — only the PDB
writer).  Because StructureBatch is a pytree with hashable aux data, saving
is trivial: arrays go to an ``.npz``, static metadata to a JSON sidecar
inside the same file.  Model/optimizer state should use orbax as usual;
this helper covers the data container.
"""

from __future__ import annotations

import json
from typing import Union

import numpy as np

__all__ = ["save_structure_batch", "load_structure_batch"]

_ARRAY_FIELDS = ["xyz", "atom_mask", "chain_idx", "residue_idx", "mu", "std"]


def save_structure_batch(batch, path: Union[str, "io.IOBase"]) -> None:
    arrays = {}
    for f in _ARRAY_FIELDS:
        v = getattr(batch, f)
        if v is not None:
            arrays[f] = np.asarray(v)
    meta = {
        "chain_ids": batch.chain_ids,
        "seq": batch.seq,
        "standardized": batch.standardized,
        "class": type(batch).__name__,
    }
    # key the antibody branch on the CLASS, matching the loader — an
    # AntibodyStructureBatch with residue_masks=None (its default) must
    # still write the chain-id metadata the loader reads unconditionally
    if hasattr(batch, "heavy_chain_id"):
        for k, v in (getattr(batch, "residue_masks", None) or {}).items():
            arrays[f"residue_masks/{k}"] = np.asarray(v)
        meta.update(
            heavy_chain_id=batch.heavy_chain_id,
            light_chain_id=batch.light_chain_id,
            antigen_chain_ids=batch.antigen_chain_ids,
            numbering_scheme=batch.numbering_scheme,
            keep_fv_only=batch.keep_fv_only,
        )
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    # np.savez_compressed appends '.npz' to suffix-less string paths but
    # the loader opens the path verbatim — normalize here so save/load
    # stay symmetric for any path
    if isinstance(path, str) and not path.endswith(".npz"):
        path = path + ".npz"
    np.savez_compressed(path, **arrays)


def _tuplify(x):
    if isinstance(x, list):
        return tuple(_tuplify(v) for v in x)
    return x


def load_structure_batch(path: Union[str, "io.IOBase"]):
    import jax.numpy as jnp

    from protstruc_tpu.antibody import AntibodyStructureBatch
    from protstruc_tpu.batch import StructureBatch

    if isinstance(path, str) and not path.endswith(".npz"):
        import os

        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        arrays = {k: z[k] for k in z.files if k != "__meta__"}

    kwargs = dict(
        xyz=jnp.asarray(arrays["xyz"]),
        atom_mask=jnp.asarray(arrays["atom_mask"]),
        chain_idx=jnp.asarray(arrays["chain_idx"]),
        residue_idx=jnp.asarray(arrays["residue_idx"]),
        mu=jnp.asarray(arrays["mu"]) if "mu" in arrays else None,
        std=jnp.asarray(arrays["std"]) if "std" in arrays else None,
        chain_ids=_tuplify(meta["chain_ids"]),
        seq=_tuplify(meta["seq"]),
        standardized=meta["standardized"],
    )

    if meta["class"] == "AntibodyStructureBatch":
        masks = {
            k.split("/", 1)[1]: jnp.asarray(v)
            for k, v in arrays.items()
            if k.startswith("residue_masks/")
        }
        return AntibodyStructureBatch(
            residue_masks=masks,
            heavy_chain_id=_tuplify(meta["heavy_chain_id"]),
            light_chain_id=_tuplify(meta["light_chain_id"]),
            antigen_chain_ids=_tuplify(meta["antigen_chain_ids"]),
            numbering_scheme=meta["numbering_scheme"],
            keep_fv_only=meta["keep_fv_only"],
            **kwargs,
        )
    return StructureBatch(**kwargs)
