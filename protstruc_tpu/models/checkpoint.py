"""Orbax checkpointing for model/optimizer train state.

Complements utils/serialization.py (which covers the StructureBatch data
container): training state — params, optimizer state, step counter — goes
through orbax so sharded arrays restore onto the mesh they were saved from.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax

__all__ = ["save_train_state", "restore_train_state", "latest_step",
           "all_steps"]


def _mgr(directory: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(os.path.abspath(directory))


def save_train_state(directory: str, step: int, params, opt_state) -> None:
    """Write params + optimizer state for ``step`` under ``directory``."""
    import orbax.checkpoint as ocp

    with _mgr(directory) as mgr:
        mgr.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                opt_state=ocp.args.StandardSave(opt_state),
            ),
        )
        mgr.wait_until_finished()


def latest_step(directory: str) -> Optional[int]:
    with _mgr(directory) as mgr:
        return mgr.latest_step()


def all_steps(directory: str) -> list:
    """Sorted list of every step with a checkpoint under ``directory``."""
    with _mgr(directory) as mgr:
        return sorted(mgr.all_steps())


def restore_train_state(
    directory: str,
    step: Optional[int] = None,
    params_like: Any = None,
    opt_state_like: Any = None,
) -> Tuple[Any, Any, int]:
    """Restore (params, opt_state, step); templates restore shardings.

    Pass ``params_like``/``opt_state_like`` (e.g. freshly-initialized and
    device_put onto the target mesh) to restore directly into the right
    shardings; without templates arrays come back unsharded.
    """
    import orbax.checkpoint as ocp

    with _mgr(directory) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")

        def arg(template):
            if template is None:
                return ocp.args.StandardRestore()
            shapes = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None)),
                template,
            )
            return ocp.args.StandardRestore(shapes)

        out = mgr.restore(
            step,
            args=ocp.args.Composite(
                params=arg(params_like), opt_state=arg(opt_state_like)
            ),
        )
    return out["params"], out["opt_state"], step
