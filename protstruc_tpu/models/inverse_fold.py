"""InverseFold: fixed-backbone sequence design (ProteinMPNN-style task).

Second model family of the zoo: given backbone geometry only, predict the
native sequence.  TPU-first mechanics: instead of ragged k-NN graph gathers,
neighborhoods are expressed as distance-kernel attention biases over the
dense (B, L, L) CA distance map — static shapes, MXU attention, shards like
TrFold (dp/sp over tokens, tp over heads).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from protstruc_tpu.models.trfold import PairBiasAttention, TrFoldConfig

__all__ = [
    "InverseFoldConfig",
    "InverseFold",
    "featurize_backbone",
    "make_if_train_state",
    "if_train_step",
    "sequence_recovery",
]


@dataclasses.dataclass(frozen=True)
class InverseFoldConfig:
    vocab: int = 21
    node_dim: int = 128
    pair_dim: int = 32
    n_heads: int = 4
    n_blocks: int = 3
    n_rbf: int = 16
    max_dist: float = 20.0
    dtype: Any = jnp.float32


def featurize_backbone(batch) -> Dict[str, jnp.ndarray]:
    """Backbone-only features: torsions, frames and the CA distance map.

    Deliberately excludes sequence identity (the prediction target).
    """
    torsions, torsion_mask = batch.backbone_dihedrals()
    torsion_mask = torsion_mask & jnp.isfinite(torsions)
    torsions = jnp.nan_to_num(torsions, nan=0.0)
    d_ca, d_mask = batch.pairwise_atom_distance("CA", "CA")
    frames = batch.backbone_orientations()
    frames = jnp.nan_to_num(frames, nan=0.0)
    return {
        "torsions": torsions,
        "torsion_mask": torsion_mask,
        "d_ca": jnp.nan_to_num(d_ca, nan=1e6),
        "d_mask": d_mask,
        "frames": frames,
        "residue_mask": batch.residue_mask,
        "target_seq": batch.get_seq_idx() if batch.seq is not None else None,
    }


class InverseFold(nn.Module):
    cfg: InverseFoldConfig = InverseFoldConfig()

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        cfg = self.cfg
        mask = feats["residue_mask"]

        tor = jnp.concatenate(
            [jnp.sin(feats["torsions"]), jnp.cos(feats["torsions"])], axis=-1
        )
        tor = jnp.where(jnp.repeat(feats["torsion_mask"], 2, -1), tor, 0.0)
        frames_flat = feats["frames"].reshape(feats["frames"].shape[:2] + (9,))
        node_in = jnp.concatenate([tor, frames_flat], axis=-1).astype(cfg.dtype)
        node = nn.Dense(cfg.node_dim, name="node_in", dtype=cfg.dtype)(node_in)

        # distance kernel features -> pair bias (soft k-NN neighborhoods)
        centers = jnp.linspace(0.0, cfg.max_dist, cfg.n_rbf)
        width = cfg.max_dist / cfg.n_rbf
        rbf = jnp.exp(
            -((feats["d_ca"][..., None] - centers) ** 2) / (2 * width**2)
        ).astype(cfg.dtype)
        rbf = jnp.where(feats["d_mask"][..., None], rbf, 0.0)
        pair = nn.Dense(cfg.pair_dim, name="rbf_embed", dtype=cfg.dtype)(rbf)

        tr_cfg = TrFoldConfig(
            node_dim=cfg.node_dim, pair_dim=cfg.pair_dim,
            n_heads=cfg.n_heads, dtype=cfg.dtype,
        )
        for i in range(cfg.n_blocks):
            node = node + PairBiasAttention(tr_cfg, name=f"attn_{i}")(
                nn.LayerNorm(dtype=cfg.dtype)(node), pair, mask
            )
            h = nn.Dense(cfg.node_dim * 2, name=f"mlp_in_{i}", dtype=cfg.dtype)(
                nn.LayerNorm(dtype=cfg.dtype)(node)
            )
            node = node + nn.Dense(cfg.node_dim, name=f"mlp_out_{i}", dtype=cfg.dtype)(
                nn.gelu(h)
            )

        return nn.Dense(cfg.vocab, name="logits", dtype=jnp.float32)(node)


def if_loss(params, model: InverseFold, feats) -> jnp.ndarray:
    logits = model.apply({"params": params}, feats)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = feats["target_seq"]
    ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    m = feats["residue_mask"]
    return jnp.sum(jnp.where(m, ce, 0.0)) / jnp.maximum(jnp.sum(m), 1.0)


def make_if_train_state(model, feats, key, learning_rate: float = 1e-3):
    params = model.init(key, feats)["params"]
    tx = optax.adamw(learning_rate)
    return params, tx.init(params), tx


def if_train_step(params, opt_state, feats, model, tx):
    loss, grads = jax.value_and_grad(if_loss)(params, model, feats)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def sample_sequence(
    params, model, feats, key: jax.Array, temperature: float = 1.0
) -> jnp.ndarray:
    """Sample sequences from the design distribution. ``(B, L)`` int32.

    ``temperature -> 0`` approaches argmax design; higher values diversify.
    Positions outside ``residue_mask`` come back as UNK (20).
    """
    logits = model.apply({"params": params}, feats)
    t = jnp.maximum(temperature, 1e-4)
    seq = jax.random.categorical(key, logits / t, axis=-1)
    return jnp.where(feats["residue_mask"], seq, 20).astype(jnp.int32)


def sequence_recovery(params, model, feats) -> jnp.ndarray:
    """Fraction of valid residues whose argmax prediction matches the native."""
    logits = model.apply({"params": params}, feats)
    pred = jnp.argmax(logits, axis=-1)
    m = feats["residue_mask"]
    hit = (pred == feats["target_seq"]) & m
    return jnp.sum(hit) / jnp.maximum(jnp.sum(m), 1)
