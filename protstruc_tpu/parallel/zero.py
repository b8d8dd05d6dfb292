"""ZeRO-1 optimizer-state sharding over the data-parallel axis.

The reference has no distributed runtime at all (SURVEY.md §5: no
NCCL/MPI/torch.distributed anywhere under /root/reference/protstruc) — this
is TPU-native new design.  With plain data parallelism every dp replica
holds a full copy of the Adam moments: 8 bytes/param of pure redundancy.
ZeRO-1 (Rajbhandari et al. 2020, "ZeRO: Memory Optimizations Toward
Training Trillion Parameter Models", §5.1) removes it by *partitioning*
the optimizer state across the dp group while keeping params replicated.

The JAX/XLA formulation needs no hand-written collectives: we place each
moment tensor with a NamedSharding that splits its largest dp-divisible
free axis over ``'dp'`` and let GSPMD insert the traffic.  In the
resulting step program each replica updates only its 1/dp shard of the
moments, and the weight update — params stay replicated — becomes the
all-gather that ZeRO-1 prescribes.  Composes with tp/sp: axes the param
rules already shard (attention heads over tp,
models/ipa.ipa_param_shardings) keep that sharding and 'dp' goes on a
*different* axis.

Shardings must be derived from the **param** shardings, not read off the
moment arrays: ``jnp.zeros_like`` under jit is a constant to XLA, so
``jax.jit(tx.init)(params)`` returns moments with default (single-device)
placement even when params carry NamedShardings.  Moment subtrees that
mirror the params pytree (Adam mu/nu, momentum traces, …) are detected by
treedef equality and mapped against the param sharding tree pairwise.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["zero1_opt_shardings", "shard_opt_state_zero1"]


def _taken_axes(spec: Any) -> dict:
    """axis index -> mesh axis name(s) already occupied by ``spec``.

    Accepts a NamedSharding, a PartitionSpec, or None (replicated).
    """
    if isinstance(spec, NamedSharding):
        spec = spec.spec
    taken: dict = {}
    if spec is None:
        return taken
    for ax, names in enumerate(spec):
        if names is not None:
            taken[ax] = names
    return taken


def _leaf_sharding(leaf: Any, mesh: Mesh, dp: int, dp_axis: str,
                   taken: dict) -> NamedSharding:
    """Shard the largest dp-divisible *free* axis of ``leaf`` over dp_axis.

    Axes listed in ``taken`` (already sharded by the param rules, e.g. tp
    heads) are kept as-is and excluded.  Scalars and leaves with no
    divisible free axis stay on just the ``taken`` spec (replicated over
    dp) — correctness never depends on partitioning succeeding.
    """
    shape = getattr(leaf, "shape", ())
    spec = [taken.get(ax) for ax in range(len(shape))]
    if dp > 1:
        best = None
        for ax, n in enumerate(shape):
            if ax in taken or n % dp:
                continue
            if best is None or n > shape[best]:
                best = ax
        if best is not None:
            spec[best] = dp_axis
    return NamedSharding(mesh, P(*spec))


def zero1_opt_shardings(
    opt_state,
    mesh: Mesh,
    dp_axis: str = "dp",
    param_shardings: Optional[Any] = None,
):
    """NamedSharding tree partitioning optimizer moments over ``dp_axis``.

    Every array leaf (Adam mu/nu, momentum buffers, …) gets its largest
    dp-divisible free axis sharded; step counters and leaves with no
    divisible axis stay replicated.

    ``param_shardings`` — the NamedSharding/PartitionSpec tree the params
    were placed with (e.g. ``ipa_param_shardings(params, mesh)``).  Moment
    subtrees of ``opt_state`` whose pytree structure equals the params'
    keep those axes (tp heads etc.) and receive 'dp' on a free axis only.
    Without it all axes are considered free.
    """
    dp = mesh.shape[dp_axis]

    def plain(leaf):
        return _leaf_sharding(leaf, mesh, dp, dp_axis, {})

    if param_shardings is None:
        return jax.tree_util.tree_map(plain, opt_state)

    ptd = jax.tree_util.tree_structure(param_shardings)
    if ptd.num_leaves <= 1 and ptd == jax.tree_util.tree_structure(0):
        raise ValueError(
            "param_shardings must be a container pytree (got a single "
            "leaf); pass the same tree used to device_put the params")

    def is_param_subtree(node):
        return jax.tree_util.tree_structure(node) == ptd

    def one_subtree(node):
        if is_param_subtree(node):
            return jax.tree_util.tree_map(
                lambda leaf, ps: _leaf_sharding(
                    leaf, mesh, dp, dp_axis, _taken_axes(ps)),
                node, param_shardings)
        return jax.tree_util.tree_map(plain, node)

    return jax.tree_util.tree_map(
        one_subtree, opt_state, is_leaf=is_param_subtree)


def shard_opt_state_zero1(
    opt_state,
    mesh: Mesh,
    dp_axis: str = "dp",
    param_shardings: Optional[Any] = None,
):
    """Place ``opt_state`` with ZeRO-1 shardings; returns (state, shardings).

    The shardings tree is returned so the train step can pin its output
    opt_state with ``jax.lax.with_sharding_constraint`` — otherwise GSPMD
    may propagate the (replicated) gradient sharding through the moment
    update and silently undo the partitioning.
    """
    shardings = zero1_opt_shardings(opt_state, mesh, dp_axis, param_shardings)
    return jax.device_put(opt_state, shardings), shardings
