"""GPipe-style pipeline parallelism over a 'pp' mesh axis.

SPMD formulation under ``shard_map``: every device holds one stage's
parameters (leading stage axis sharded over 'pp'); microbatch activations
rotate stage-to-stage via ``lax.ppermute`` inside a ``lax.scan`` over
S + M - 1 ticks.  Bubbles do wasted (masked) compute — the textbook GPipe
schedule — and gradients flow through the whole schedule, so the same
function trains.

This is the 'pp' leg of the parallelism story (dp/sp/tp live in mesh.py /
models/trfold.py; ep in models/moe.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

__all__ = ["pipeline_forward", "stack_stage_params"]


def stack_stage_params(params_list):
    """Stack per-stage param pytrees along a new leading stage axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def pipeline_forward(
    stage_fn: Callable,
    stage_params,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pp",
):
    """Run ``stage_fn`` S times (one stage per 'pp' device) over microbatches.

    Args:
        stage_fn: ``(params_one_stage, activation) -> activation`` where the
            activation is an array or pytree of arrays ``(mb, ...)``; its
            structure and shapes must be identical for every stage (they
            flow device-to-device).  Activations must be floating-point:
            the schedule initializes them with ``zeros_like`` and reduces
            the emitted outputs with ``psum`` over the pp axis, so integer
            or boolean activations are not supported.
        stage_params: pytree with leading axis S == mesh.shape[axis].
        x: microbatched input — array or pytree with leading ``(M, mb, ...)``.
        mesh: mesh containing ``axis``.

    Returns outputs of the same structure as ``x`` (replicated across pp).
    """
    S = mesh.shape[axis]
    tmap = jax.tree_util.tree_map
    M = jax.tree_util.tree_leaves(x)[0].shape[0]

    def spmd(params_local, x_all):
        # params_local: this device's stage params (leading axis 1)
        params_me = tmap(lambda p: p[0], params_local)
        d = jax.lax.axis_index(axis)

        state = tmap(lambda v: jnp.zeros_like(v[0]), x_all)
        outs = tmap(jnp.zeros_like, x_all)

        def tick(carry, t):
            state, outs = carry
            # activations advance one stage per tick
            recv = tmap(
                lambda s: jax.lax.ppermute(
                    s, axis, [(i, (i + 1) % S) for i in range(S)]
                ),
                state,
            )
            feed_idx = jnp.clip(t, 0, M - 1)
            inp = tmap(
                lambda xa, r: jnp.where(d == 0, xa[feed_idx], r), x_all, recv
            )
            new_state = stage_fn(params_me, inp)
            # last stage emits microbatch t - (S - 1)
            out_idx = jnp.clip(t - (S - 1), 0, M - 1)
            emit = (d == S - 1) & (t >= S - 1)
            outs = jax.lax.cond(
                emit,
                lambda o: tmap(lambda oo, ns: oo.at[out_idx].set(ns), o, new_state),
                lambda o: o,
                outs,
            )
            return (new_state, outs), None

        (_, outs), _ = jax.lax.scan(
            tick, (state, outs), jnp.arange(S + M - 1)
        )
        # replicate the last stage's outputs across the pp axis
        outs = tmap(
            lambda o: jax.lax.psum(jnp.where(d == S - 1, o, 0.0), axis), outs
        )
        return outs

    in_specs = (
        tmap(lambda _: P(axis), stage_params),
        tmap(lambda _: P(), x),
    )
    fn = shard_map(
        spmd, mesh=mesh, in_specs=in_specs, out_specs=tmap(lambda _: P(), x),
        check_vma=False,
    )
    return fn(stage_params, x)
