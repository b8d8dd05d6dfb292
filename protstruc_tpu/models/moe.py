"""Mixture-of-Experts MLP with expert parallelism (the 'ep' story).

Switch-style top-1 routing in the Mesh-TensorFlow einsum formulation:
tokens are dispatched into per-expert capacity slots with one-hot matmuls
(static shapes, no sorts/gathers), experts compute batched matmuls (MXU),
and results combine back weighted by the router probability.  Sharding the
expert axis of ``w1``/``w2`` and of the dispatched activations over a mesh
axis ('ep', typically aliased to 'dp') makes XLA insert the all-to-alls.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MoEMLP", "moe_param_shardings"]


class MoEMLP(nn.Module):
    """Top-1 routed expert MLP over token axis (B, L, D) -> (B, L, D)."""

    n_experts: int = 4
    hidden_dim: int = 128
    capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, L, D = x.shape
        E, H = self.n_experts, self.hidden_dim
        T = B * L
        C = max(int(self.capacity_factor * T / E), 1)

        xt = x.reshape(T, D)
        valid = mask.reshape(T)

        # router
        logits = nn.Dense(E, name="router")(xt)  # (T, E)
        probs = jax.nn.softmax(logits, axis=-1)
        top = jnp.argmax(probs, axis=-1)  # (T,)
        top_prob = jnp.max(probs, axis=-1)
        onehot = jax.nn.one_hot(top, E) * valid[:, None]  # (T, E)

        # capacity slots: position of each token within its expert
        pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0  # (T, E), -1 if unrouted
        keep = (pos >= 0) & (pos < C)
        slot = jnp.clip(pos, 0, C - 1).astype(jnp.int32)
        # dispatch tensor (T, E, C): one-hot over capacity slots
        dispatch = jax.nn.one_hot(slot, C) * keep[..., None]  # (T, E, C)
        combine = dispatch * top_prob[:, None, None]

        # expert compute: (E, C, D) batched matmuls on the MXU
        expert_in = jnp.einsum("tec,td->ecd", dispatch, xt)
        w1 = self.param("w1", nn.initializers.lecun_normal(), (E, D, H))
        b1 = self.param("b1", nn.initializers.zeros, (E, H))
        w2 = self.param("w2", nn.initializers.lecun_normal(), (E, H, D))
        b2 = self.param("b2", nn.initializers.zeros, (E, D))
        h = jax.nn.gelu(
            jnp.einsum("ecd,edh->ech", expert_in, w1) + b1[:, None, :]
        )
        expert_out = jnp.einsum("ech,ehd->ecd", h, w2) + b2[:, None, :]

        out = jnp.einsum("tec,ecd->td", combine, expert_out)

        # load-balancing auxiliary loss (Switch Transformer eq. 4),
        # normalized by the VALID token count: dividing by T would shrink
        # the aux quadratically with the padding fraction, so balancing
        # pressure varied ~10x across length buckets
        n_valid = jnp.maximum(jnp.sum(valid.astype(probs.dtype)), 1.0)
        frac_tokens = jnp.sum(onehot, axis=0) / n_valid
        frac_probs = jnp.sum(probs * valid[:, None], axis=0) / n_valid
        aux = E * jnp.sum(frac_tokens * frac_probs)

        return out.reshape(B, L, D), aux


def moe_param_shardings(params, mesh: Mesh, ep_axis: str = "dp"):
    """Shard the leading expert axis of MoE parameters over ``ep_axis``."""

    def spec_for(path, x):
        # match the exact FINAL path component: substring matching over
        # the joined path would also hit unrelated params whose names
        # merely contain 'w1'/'b1' (e.g. 'row1', 'emb1') and shard an
        # axis of the wrong size
        leaf = getattr(path[-1], "key", str(path[-1])) if path else ""
        if leaf in ("w1", "w2", "b1", "b2"):
            return P(ep_axis, *([None] * (x.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, spec_for(path, x)), params
    )
