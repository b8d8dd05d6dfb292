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
    "if_ar_loss",
    "ar_sample_sequence",
    "random_decode_order",
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
    # > 0 adds ProteinMPNN-style autoregressive decoder blocks: sequence
    # context enters through causally-masked attention over an explicit
    # decoding order (teacher-forced in one pass at training; L-step scan
    # at sampling — see ar_sample_sequence)
    n_decoder_blocks: int = 0
    # route node attention (encoder + causal decoder) through the fused
    # flash Pallas kernel — see models/trfold.py TrFoldConfig.use_flash_attn
    use_flash_attn: bool = False
    # sequence-parallel mesh for ring flash attention under sp > 1
    # (TrFoldConfig.ring_mesh / ops/ring_attn.py)
    ring_mesh: Any = None


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
    """Encoder (+ optional AR decoder) over dense backbone geometry.

    With ``cfg.n_decoder_blocks > 0`` the call also consumes
    ``prev_seq (B, L)`` (residue identities to condition on) and
    ``decode_rank (B, L)`` (position's index in the decoding order):
    decoder attention at position i sees only positions with strictly
    smaller rank — teacher forcing with the native sequence trains the
    full conditional in one pass, exactly like ProteinMPNN's random-order
    decoder.
    """

    cfg: InverseFoldConfig = InverseFoldConfig()

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        cfg = self.cfg
        mask = feats["residue_mask"]

        tor = jnp.concatenate(
            [jnp.sin(feats["torsions"]), jnp.cos(feats["torsions"])], axis=-1
        )
        # mask mirrors the concatenate([sin, cos]) layout — repeat() would
        # interleave and mask the wrong channels at chain termini
        tm = feats["torsion_mask"]
        tor = jnp.where(jnp.concatenate([tm, tm], axis=-1), tor, 0.0)
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
            use_flash_attn=cfg.use_flash_attn,
            ring_mesh=cfg.ring_mesh,
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

        if cfg.n_decoder_blocks > 0:
            rank = feats["decode_rank"]  # (B, L) int32
            # position i attends to j iff j was decoded strictly before i
            causal = rank[:, None, :] < rank[:, :, None]  # (B, Li, Lj)
            seq_ctx = nn.Embed(cfg.vocab, cfg.node_dim, name="seq_ctx",
                               dtype=cfg.dtype)(feats["prev_seq"])
            for i in range(cfg.n_decoder_blocks):
                # queries: geometry only; keys/values: geometry + decoded
                # identities — a position's own identity never reaches its
                # own logits (teacher-forcing stays honest)
                q_in = nn.LayerNorm(dtype=cfg.dtype, name=f"dec_ln_q_{i}")(node)
                kv_in = nn.LayerNorm(dtype=cfg.dtype, name=f"dec_ln_kv_{i}")(
                    node + seq_ctx
                )
                node = node + PairBiasAttention(tr_cfg, name=f"dec_attn_{i}")(
                    q_in, pair, mask, extra_mask=causal, kv=kv_in
                )
                h = nn.Dense(cfg.node_dim * 2, name=f"dec_mlp_in_{i}",
                             dtype=cfg.dtype)(nn.LayerNorm(dtype=cfg.dtype)(node))
                node = node + nn.Dense(cfg.node_dim, name=f"dec_mlp_out_{i}",
                                       dtype=cfg.dtype)(nn.gelu(h))

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
    # never draw UNK (20) at a valid position: it doubles as the padding
    # sentinel (the output would be ambiguous) and is un-synthesizable —
    # same rule as the AR decoder (ar_sample_sequence)
    logits = logits.at[..., 20:].set(-1e9)
    t = jnp.maximum(temperature, 1e-4)
    seq = jax.random.categorical(key, logits / t, axis=-1)
    return jnp.where(feats["residue_mask"], seq, 20).astype(jnp.int32)


def random_decode_order(key: jax.Array, shape: Tuple[int, int]) -> jnp.ndarray:
    """Random per-structure decoding order ranks ``(B, L)`` int32.

    ``rank[b, i] = k`` means position i is decoded k-th.  ProteinMPNN trains
    over random orders so any conditional (e.g. fixed-region redesign) is
    available at sampling time.
    """
    B, L = shape
    keys = jax.random.split(key, B)
    perm = jax.vmap(lambda k: jax.random.permutation(k, L))(keys)
    rank = jnp.zeros((B, L), jnp.int32)
    return rank.at[jnp.arange(B)[:, None], perm].set(jnp.arange(L)[None])


def if_ar_loss(params, model: InverseFold, feats, key: jax.Array) -> jnp.ndarray:
    """Teacher-forced autoregressive CE over a random decoding order."""
    rank = random_decode_order(key, feats["residue_mask"].shape)
    f = dict(feats, prev_seq=feats["target_seq"], decode_rank=rank)
    return if_loss(params, model, f)


def ar_sample_sequence(
    params,
    model: InverseFold,
    feats,
    key: jax.Array,
    temperature: float = 0.1,
    fixed_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Autoregressive sampling: decode positions one at a time under lax.scan.

    Each of the L steps reruns the (jit-compiled) network with the grown
    sequence context and samples the next position in the decoding order.
    ``fixed_mask`` (True = keep) pins positions to ``feats['target_seq']``
    and decodes them first, so designed regions condition on the fixed
    context (CDR redesign etc.).  Returns ``(B, L)`` int32.
    """
    mask = feats["residue_mask"]
    B, L = mask.shape
    korder, kloop = jax.random.split(key)

    rank = random_decode_order(korder, (B, L))
    if fixed_mask is not None:
        # fixed positions first (rank stays relatively ordered inside groups)
        rank = jnp.where(fixed_mask, rank, rank + L).argsort(axis=1).argsort(axis=1)
        rank = rank.astype(jnp.int32)

    # position decoded at step k: perm[b, k]
    perm = jnp.argsort(rank, axis=1)  # (B, L)

    init_seq = jnp.full((B, L), 20, jnp.int32)
    if fixed_mask is not None:
        init_seq = jnp.where(fixed_mask, feats["target_seq"], init_seq)

    t = jnp.maximum(temperature, 1e-4)
    keys = jax.random.split(kloop, L)

    def step(seq, inp):
        k, kstep = inp
        pos = perm[:, k]  # (B,)
        f = dict(feats, prev_seq=seq, decode_rank=rank)
        logits = model.apply({"params": params}, f)  # (B, L, V)
        row = jnp.take_along_axis(logits, pos[:, None, None].repeat(
            logits.shape[-1], -1), axis=1)[:, 0]     # (B, V)
        # a designer never emits UNK: mask vocab indices beyond the 20
        # standard amino acids (UNK=20 is the padding/teacher-context class)
        aa_ok = jnp.arange(row.shape[-1]) < 20
        row = jnp.where(aa_ok[None, :], row, -1e9)
        draw = jax.random.categorical(kstep, row / t, axis=-1).astype(jnp.int32)
        keep = (
            fixed_mask[jnp.arange(B), pos]
            if fixed_mask is not None
            else jnp.zeros((B,), bool)
        )
        cur = seq[jnp.arange(B), pos]
        new = jnp.where(keep, cur, draw)
        return seq.at[jnp.arange(B), pos].set(new), None

    seq, _ = jax.lax.scan(step, init_seq, (jnp.arange(L), keys))
    return jnp.where(mask, seq, 20).astype(jnp.int32)


def sequence_recovery(params, model, feats) -> jnp.ndarray:
    """Fraction of valid residues whose argmax prediction matches the native.

    For AR models without explicit decoding context in ``feats``, the
    standard teacher-forced form is used (native sequence as context,
    left-to-right order).
    """
    if model.cfg.n_decoder_blocks > 0 and "prev_seq" not in feats:
        B, L = feats["residue_mask"].shape
        rank = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
        feats = dict(feats, prev_seq=feats["target_seq"], decode_rank=rank)
    logits = model.apply({"params": params}, feats)
    pred = jnp.argmax(logits, axis=-1)
    m = feats["residue_mask"]
    hit = (pred == feats["target_seq"]) & m
    return jnp.sum(hit) / jnp.maximum(jnp.sum(m), 1)
