"""TrFold: a trRosetta-style pair-representation model, TPU-first.

Flagship model of the rebuild.  Consumes the library's own featurization
(6D inter-residue geometry + backbone torsions) and predicts a distogram
over CB-CB distances plus backbone torsion angles — the classic
trRosetta/AlphaFold-1 task the reference library was built to feed
(README.md:7-12 of the reference describes exactly this use case).

Design for the (dp, sp, tp) mesh (parallel/mesh.py):

* node activations ``(B, L, D)`` shard ``P(dp, sp, None)``;
* pair activations ``(B, L, L, P)`` shard ``P(dp, sp, None, None)`` —
  the first residue axis is sequence-parallel, so row-wise ops are local
  and column-wise context arrives via XLA-inserted all-gathers;
* attention heads and MLP hidden dims shard over tp (``param_shardings``);
* everything is standard flax/optax — ``train_step`` jits under a Mesh
  with ``NamedSharding`` in/out specs and XLA emits the collectives.

Matmul-heavy by construction (MXU-friendly): attention with pair bias,
outer-product pair updates, gated row/column pair mixing (a lightweight
stand-in for triangle multiplication at O(L^2 D + L^2 P) flops).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax.ad_checkpoint import checkpoint_name
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "TrFoldConfig",
    "TrFold",
    "DiffusionDenoiser",
    "make_train_state",
    "train_step",
    "param_shardings",
    "featurize_for_model",
    "featurize_from_sequence",
]


@dataclasses.dataclass(frozen=True)
class TrFoldConfig:
    vocab: int = 21
    node_dim: int = 128
    pair_dim: int = 64
    n_heads: int = 4
    n_blocks: int = 3
    n_dist_bins: int = 36
    max_dist: float = 20.0
    relpos_clip: int = 32     # AF2-style clipped relative-position encoding
    dtype: Any = jnp.float32  # set jnp.bfloat16 for MXU-native training
    moe_experts: int = 0      # > 0 replaces block MLPs with expert-parallel MoE
    moe_aux_weight: float = 1e-2
    # Pre-norm pair residual stream (LayerNorm inside the PairUpdate branch,
    # one final LN before the heads) instead of the original post-norm.
    # Post-norm re-normalizes the pair stream every block, attenuating the
    # identity path from the input distance embedding to the distogram head
    # — the round-1 distogram plateau.  Measured on a one-batch overfit
    # (experiments/distogram_plateau.py, 400 steps): top-1 0.74 / loss 1.62
    # post-norm vs top-1 0.93 / loss 0.90 pre-norm.
    pair_pre_norm: bool = True
    # Rematerialize each block on the backward pass (jax.checkpoint): the
    # per-block (B, L, L, P) pair activations are not stored, trading
    # ~1 extra forward for O(n_blocks x L^2 P) less HBM — the lever that
    # fits long-L training on one chip.
    remat: bool = False
    # Remat policy (applies only when remat=True):
    #   "none"     — save nothing, recompute the whole block (max savings).
    #   "tri_dots" — save the two triangle-contraction outputs per block
    #                (checkpoint_name "tri_prod"); the backward pass then
    #                skips recomputing the O(L^3 P) einsums — the dominant
    #                FLOPs at production widths — for 2 x (B, L, L, P)
    #                extra HBM per block.  Values and param tree identical.
    #   "dots"     — jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    #                (saves unbatched matmul outputs; the batched triangle
    #                einsums still recompute — mostly useful for node-stream
    #                heavy configs).
    remat_policy: str = "none"
    # Pair-update mechanism: "gated_mix" (default — gated row/column mixing,
    # a lightweight O(L^2 P) stand-in) or "triangle" (true Evoformer
    # triangle multiplicative updates, outgoing + incoming, each a gated
    # einsum over the third residue — the AF2 pair-refinement mechanism).
    pair_update: str = "gated_mix"
    # Fused Pallas streaming kernels for the triangle updates
    # (ops/tri_mul.py): one pass for LayerNorm + the four gate/proj Denses
    # + mask (prologue) and one for gate + LayerNorm + out-proj (epilogue),
    # both with fused Pallas backwards — removes the ~15 elementwise passes
    # over the (B, L, L, P) pair stream that bound production-width MFU.
    # Param tree identical to the unfused path (checkpoints load across the
    # flag); values match to dtype rounding.  Off-TPU it would run in the
    # Pallas interpreter — load_fold_model flips it off there.
    fused_tri: bool = False
    # Node attention via the fused flash Pallas kernel
    # (ops/flash_attn.py): online-softmax over key tiles, never
    # materializing the (B, H, L, L) logits/probabilities in HBM.  The op
    # is HBM-bound at dh = node_dim/n_heads = 32, so this removes its
    # dominant cost at long L.  An extra_mask (AR InverseFold decoding)
    # is folded into the additive bias with the jnp path's -1e9.
    use_flash_attn: bool = False
    # Sequence-parallel flash: a jax.sharding.Mesh whose ("dp", "sp", "tp")
    # axes carry the train step.  When set with sp > 1 (and use_flash_attn),
    # node attention runs as RING flash attention (ops/ring_attn.py): k/v
    # blocks rotate over the sp axis via ppermute with an online-softmax
    # merge, so neither the (B, H, L, L) bias nor the keys are ever
    # gathered.  None (default) = single-device / GSPMD flash.
    ring_mesh: Any = None


def featurize_for_model(batch, use_pallas: bool = False, fused: bool = False,
                        n_dist_bins: int = 36, max_dist: float = 20.0,
                        ang_dtype=jnp.bfloat16, include_chi: bool = False):
    """StructureBatch -> model inputs (seq_idx, torsions, pair features, masks).

    Real structures have residues with missing backbone atoms whose torsions
    are NaN even where the (terminal-only) dihedral mask is True
    (protstruc.py:502-503 documents the same limitation); the mask is
    tightened here so NaNs never reach the model or the loss.

    ``fused=True`` is the training-ingest fast path: one Pallas kernel emits
    ``d_cb_bins`` (already binned, int32) and ``ang_sincos`` (bf16
    ``(B, L, L, 6)`` [sin w, cos w, sin t, cos t, sin phi, cos phi]) — no
    raw angle maps, no atan2, no second sin/cos pass.  ``n_dist_bins`` /
    ``max_dist`` must match the model config.  Both layouts are accepted by
    ``TrFold`` and ``loss_fn``.
    """
    from protstruc_tpu.vocab import ATOM

    torsions, torsion_mask = batch.backbone_dihedrals()
    torsion_mask = torsion_mask & jnp.isfinite(torsions)
    torsions = jnp.nan_to_num(torsions, nan=0.0)
    seq_idx = batch.get_seq_idx() if batch.seq is not None else jnp.zeros(
        batch.chain_idx.shape, jnp.int32
    )
    common = {
        "seq_idx": seq_idx,
        "torsions": torsions,
        "torsion_mask": torsion_mask,
        "residue_mask": batch.residue_mask,
        "chain_idx": batch.chain_idx,
    }
    if include_chi:
        # sidechain chi1-4 (ops/chi.py) as extra node-level torsion features;
        # embedded alongside phi/psi/omega in TrFold.embed
        chi, chi_mask = batch.chi_angles()
        common["chi"] = chi
        common["chi_mask"] = chi_mask

    if fused:
        from protstruc_tpu.ops.pallas_pairwise import model_features_pallas

        bins, ang = model_features_pallas(
            batch.xyz, n_bins=n_dist_bins, max_dist=max_dist,
            interpret=jax.default_backend() != "tpu", ang_dtype=ang_dtype,
        )
        cb_ok = (
            batch.atom_mask[:, :, int(ATOM.CB)]
            & jnp.isfinite(batch.xyz[:, :, int(ATOM.CB)]).all(-1)
        )
        common.update(
            d_cb_bins=bins,
            ang_sincos=jnp.moveaxis(ang, 1, -1),
            pair_mask=cb_ok[:, :, None] & cb_ok[:, None, :],
        )
        return common

    g = batch.inter_residue_geometry(use_pallas=use_pallas)
    common.update(
        d_cb=g["d_cb"],
        omega=g["omega"],
        theta=g["theta"],
        phi=g["phi"],
        pair_mask=g["d_cb_mask"] & jnp.isfinite(g["d_cb"]),
    )
    return common


def featurize_from_sequence(seq_idx, chain_idx=None, n_dist_bins: int = 36):
    """Sequence-only model inputs: fold *without* structural features.

    Structural channels are set to their "absent" conventions — zero
    torsions with an all-False mask, the distogram's last bin (the
    missing-atom class) everywhere, and an all-False pair mask — so the
    trunk sees sequence + relative position only.  With
    ``FoldModel(n_recycle>0)`` the second pass re-embeds the first pass's
    *predicted* CB distogram, turning the model into an iterative
    sequence -> structure predictor (the AF2 recycling mechanism).  Used by
    the self-consistency evaluation (experiments/self_consistency.py).
    """
    seq_idx = jnp.asarray(seq_idx, jnp.int32)
    B, L = seq_idx.shape
    if chain_idx is None:
        chain_idx = jnp.zeros((B, L), jnp.int32)
    return {
        "seq_idx": seq_idx,
        "torsions": jnp.zeros((B, L, 3), jnp.float32),
        "torsion_mask": jnp.zeros((B, L, 3), bool),
        "residue_mask": jnp.ones((B, L), bool),
        "chain_idx": chain_idx,
        "d_cb_bins": jnp.full((B, L, L), n_dist_bins - 1, jnp.int32),
        "ang_sincos": jnp.zeros((B, L, L, 6), jnp.float32),
        "pair_mask": jnp.zeros((B, L, L), bool),
    }


class PairBiasAttention(nn.Module):
    """Multi-head node self-attention with an additive pair-derived bias.

    ``extra_mask`` (optional ``(B, L, L)`` bool, True = attend) composes
    with the key mask — used by the autoregressive InverseFold decoder for
    causal decoding-order masking.  ``kv`` (optional) provides a separate
    key/value input stream: queries come from ``node``, keys/values from
    ``kv`` — the AR decoder injects sequence context into keys/values only,
    so a position's own identity never reaches its own query/logits.
    """

    cfg: TrFoldConfig

    @nn.compact
    def __call__(self, node, pair, mask, extra_mask=None, kv=None):
        cfg = self.cfg
        h, dh = cfg.n_heads, cfg.node_dim // cfg.n_heads

        qkv_layer = nn.DenseGeneral((3, h, dh), name="qkv", dtype=cfg.dtype)
        qkv = qkv_layer(node)
        q = qkv[..., 0, :, :]
        if kv is None:
            k, v = qkv[..., 1, :, :], qkv[..., 2, :, :]
        else:
            kv3 = qkv_layer(kv)  # same projection, sequence-conditioned input
            k, v = kv3[..., 1, :, :], kv3[..., 2, :, :]

        bias = nn.DenseGeneral((h,), name="pair_bias", dtype=cfg.dtype)(pair)
        bias = jnp.moveaxis(bias, -1, 1)  # (B, h, L, L)

        if cfg.use_flash_attn:
            from protstruc_tpu.ops.flash_attn import flash_pair_bias_attention

            if (cfg.ring_mesh is not None
                    and cfg.ring_mesh.shape.get("sp", 1) > 1):
                from protstruc_tpu.ops.ring_attn import ring_attention_sharded

                def attend(q, k, v, bias, mask):
                    return ring_attention_sharded(
                        q, k, v, bias, mask, cfg.ring_mesh)
            else:
                attend = flash_pair_bias_attention

            if extra_mask is None:
                out = attend(q, k, v, bias, mask)
            else:
                # Fold the (B, L, L) attend-mask into the additive bias
                # (same -1e9 the jnp path uses).  The one semantic gap is
                # rows whose every key is disallowed by extra_mask: the
                # kernel's zero-output convention only sees kmask, so those
                # rows softmax over the -1e9 logits — post-zero them (their
                # upstream grad is then 0, which zeroes ds/dk/dv exactly
                # like the jnp path's post-softmax where).
                neg = jnp.asarray(-1e9, jnp.float32)
                fbias = (bias.astype(jnp.float32)
                         + jnp.where(extra_mask[:, None], 0.0, neg)
                         ).astype(bias.dtype)
                out = attend(q, k, v, fbias, mask)
                row_ok = jnp.any(extra_mask & mask[:, None, :], axis=-1)
                out = jnp.where(row_ok[:, :, None, None], out, 0.0)
            return nn.DenseGeneral(cfg.node_dim, axis=(-2, -1), name="out",
                                   dtype=cfg.dtype)(out)

        logits = jnp.einsum("blhd,bmhd->bhlm", q, k) / jnp.sqrt(dh).astype(cfg.dtype)
        logits = logits + bias
        neg = jnp.asarray(-1e9, cfg.dtype)
        allowed = mask[:, None, None, :]
        if extra_mask is not None:
            allowed = allowed & extra_mask[:, None]
        logits = jnp.where(allowed, logits, neg)
        attn = jax.nn.softmax(logits, axis=-1)
        # a row with no allowed key would otherwise softmax to uniform
        # weights over the -1e9 logits and leak every value in
        attn = jnp.where(allowed, attn, 0.0)

        out = jnp.einsum("bhlm,bmhd->blhd", attn, v)
        return nn.DenseGeneral(cfg.node_dim, axis=(-2, -1), name="out", dtype=cfg.dtype)(out)


def _remat_policy(name: str):
    """Resolve TrFoldConfig.remat_policy to a jax.checkpoint policy."""
    if name == "none":
        return None  # save nothing: full per-block recompute
    if name == "tri_dots":
        return jax.checkpoint_policies.save_only_these_names("tri_prod")
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(
        f"remat_policy must be 'none', 'tri_dots' or 'dots', got {name!r}")


class _SplitDense(nn.Module):
    """Dense over the concatenation of two inputs WITHOUT materializing it.

    ``concat([a, b], -1) @ K + bias`` computed as the block-matrix form
    ``a @ K[:Ca] + b @ K[Ca:] + bias``.  Mathematically identical and
    param-tree identical to ``nn.Dense`` on the concatenation (kernel
    ``(Ca+Cb, features)``, bias ``(features,)`` — checkpoints load across
    the change), but XLA no longer materializes the ``(B, L, L, Ca+Cb)``
    temp: at D=512/P=256 that concat was a 1 GB HLO temp per block and the
    allocation that OOM'd the dense backward (XLA memory dump,
    experiments/mfu.py r4).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        ca, cb = a.shape[-1], b.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (ca + cb, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(self.dtype)
        # cast inputs like nn.Dense would: f32 activations against a bf16
        # kernel would otherwise promote to f32 math and re-inflate the
        # (B, L, L, .) temps this class exists to shrink
        a = a.astype(self.dtype)
        b = b.astype(self.dtype)
        return (
            a @ kernel[:ca] + b @ kernel[ca:] + bias.astype(self.dtype)
        )


class PairUpdate(nn.Module):
    """Outer-product node->pair update + gated row/column mixing.

    The row/column mixing contracts over the residue axis (MXU matmuls),
    giving triangle-multiplication-like information flow at O(L^2 P) cost.
    """

    cfg: TrFoldConfig

    @nn.compact
    def __call__(self, node, pair, mask):
        cfg = self.cfg
        a = nn.Dense(cfg.pair_dim, name="outer_a", dtype=cfg.dtype)(node)
        b = nn.Dense(cfg.pair_dim, name="outer_b", dtype=cfg.dtype)(node)
        pair = pair + a[:, :, None, :] * b[:, None, :, :]

        # pre-norm (default): normalize only the mixing branch's input so the
        # residual stream carries the input pair embedding to the heads
        # unattenuated (see TrFoldConfig.pair_pre_norm)
        src = nn.LayerNorm(dtype=cfg.dtype)(pair) if cfg.pair_pre_norm else pair

        g_row = nn.sigmoid(nn.Dense(cfg.pair_dim, name="gate_row", dtype=cfg.dtype)(src))
        g_col = nn.sigmoid(nn.Dense(cfg.pair_dim, name="gate_col", dtype=cfg.dtype)(src))
        m = mask.astype(cfg.dtype)
        pm = src * (m[:, :, None, None] * m[:, None, :, None])
        denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)[:, None, None, None]
        row_ctx = jnp.einsum("bikc,bkjc->bijc", g_row * pm, pm) / denom
        col_ctx = jnp.einsum("bkic,bkjc->bijc", g_col * pm, pm) / denom
        mix = _SplitDense(cfg.pair_dim, name="mix", dtype=cfg.dtype)(
            row_ctx, col_ctx
        )
        if cfg.pair_pre_norm:
            return pair + mix
        return nn.LayerNorm(dtype=cfg.dtype)(pair + mix)


class _DenseParams(nn.Module):
    """Param-tree twin of ``nn.Dense``: declares kernel/bias with nn.Dense's
    exact names, shapes and initializers WITHOUT running the matmul — the
    hook that lets the fused-kernel path (ops/tri_mul.py) consume the same
    checkpointable params the flax path would."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (self.in_features, self.features)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class _LNParams(nn.Module):
    """Param-tree twin of ``nn.LayerNorm`` (scale ones, bias zeros)."""

    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class TriangleMultiplication(nn.Module):
    """AF2-style triangle multiplicative update (Algorithm 11/12).

    ``outgoing=True``: ``z_ij <- g_ij * Linear(LN(sum_k a_ik b_jk))``;
    ``outgoing=False`` contracts over the incoming edges
    (``sum_k a_ki b_kj``).  Each contraction is one (L, L) x (L, L) batched
    matmul per channel — MXU-native, O(L^3 C) flops.

    With ``cfg.fused_tri`` the elementwise/Dense streaming around the
    contraction runs as two fused Pallas kernels (ops/tri_mul.py) with the
    same param tree and values (to dtype rounding).
    """

    cfg: TrFoldConfig
    outgoing: bool = True

    @nn.compact
    def __call__(self, pair, mask):
        cfg = self.cfg
        C = cfg.pair_dim
        if cfg.fused_tri:
            from protstruc_tpu.ops.tri_mul import fused_triangle_multiplication

            dt = cfg.dtype
            # mirror the flax modules' internal casts: Dense/LayerNorm cast
            # their params to the compute dtype before use, so the cast
            # sits on the same side of the custom VJP as flax puts it
            params = {
                name: tuple(w.astype(dt) for w in
                            _LNParams(C, name=name)())
                for name in ("ln_in", "ln_out")
            }
            params.update({
                name: tuple(w.astype(dt) for w in
                            _DenseParams(C, C, name=name)())
                for name in ("a_gate", "a_proj", "b_gate", "b_proj",
                             "out_gate", "out_proj")
            })
            return fused_triangle_multiplication(
                pair.astype(dt), mask, params, outgoing=self.outgoing)
        src = nn.LayerNorm(dtype=cfg.dtype, name="ln_in")(pair)
        m = (mask[:, :, None] & mask[:, None, :]).astype(cfg.dtype)[..., None]

        a = nn.sigmoid(nn.Dense(C, name="a_gate", dtype=cfg.dtype)(src)) * \
            nn.Dense(C, name="a_proj", dtype=cfg.dtype)(src) * m
        b = nn.sigmoid(nn.Dense(C, name="b_gate", dtype=cfg.dtype)(src)) * \
            nn.Dense(C, name="b_proj", dtype=cfg.dtype)(src) * m

        if self.outgoing:
            prod = jnp.einsum("bikc,bjkc->bijc", a, b)
        else:
            prod = jnp.einsum("bkic,bkjc->bijc", a, b)
        # name the O(L^3 P) contraction output so remat_policy="tri_dots"
        # can save it across the backward pass instead of recomputing it
        prod = checkpoint_name(prod, "tri_prod")

        g = nn.sigmoid(nn.Dense(C, name="out_gate", dtype=cfg.dtype)(src))
        upd = nn.Dense(C, name="out_proj", dtype=cfg.dtype)(
            nn.LayerNorm(dtype=cfg.dtype, name="ln_out")(prod)
        )
        return g * upd


class TrFoldBlock(nn.Module):
    cfg: TrFoldConfig

    @nn.compact
    def __call__(self, node, pair, mask):
        cfg = self.cfg
        node = node + PairBiasAttention(cfg, name="attn")(
            nn.LayerNorm(dtype=cfg.dtype)(node), pair, mask
        )
        mlp_in = nn.LayerNorm(dtype=cfg.dtype)(node)
        aux = 0.0
        if cfg.moe_experts > 0:
            from protstruc_tpu.models.moe import MoEMLP

            mlp, aux = MoEMLP(
                n_experts=cfg.moe_experts,
                hidden_dim=cfg.node_dim * 4,
                name="moe",
            )(mlp_in, mask)
        else:
            mlp = nn.Dense(cfg.node_dim * 4, name="mlp_in", dtype=cfg.dtype)(mlp_in)
            mlp = nn.Dense(cfg.node_dim, name="mlp_out", dtype=cfg.dtype)(nn.gelu(mlp))
        node = node + mlp
        if cfg.pair_update == "triangle":
            # outer-product node->pair injection, then the two triangle
            # multiplicative updates on a pre-norm residual stream
            a = nn.Dense(cfg.pair_dim, name="outer_a", dtype=cfg.dtype)(node)
            b = nn.Dense(cfg.pair_dim, name="outer_b", dtype=cfg.dtype)(node)
            pair = pair + a[:, :, None, :] * b[:, None, :, :]
            pair = pair + TriangleMultiplication(
                cfg, outgoing=True, name="tri_out")(pair, mask)
            pair = pair + TriangleMultiplication(
                cfg, outgoing=False, name="tri_in")(pair, mask)
        else:
            pair = PairUpdate(cfg, name="pair_update")(node, pair, mask)
        return node, pair, aux


class TrFold(nn.Module):
    """6D geometry + sequence -> distogram logits + torsion predictions.

    ``setup``-style so the embed / block-stack / heads phases are separately
    callable (``method=TrFold.embed`` etc.) — the hook the pipeline-parallel
    apply (:func:`pipeline_apply`) uses to run blocks as 'pp' stages.  Module
    names match the original flat layout, so the param tree is unchanged.
    """

    cfg: TrFoldConfig = TrFoldConfig()

    def setup(self):
        cfg = self.cfg
        self.seq_embed = nn.Embed(cfg.vocab, cfg.node_dim, dtype=cfg.dtype)
        self.torsion_embed = nn.Dense(cfg.node_dim, dtype=cfg.dtype)
        self.chi_embed = nn.Dense(cfg.node_dim, dtype=cfg.dtype)
        self.dist_embed = nn.Embed(cfg.n_dist_bins, cfg.pair_dim, dtype=cfg.dtype)
        self.ang_embed = nn.Dense(cfg.pair_dim, dtype=cfg.dtype)
        self.relpos_embed = nn.Embed(2 * cfg.relpos_clip + 2, cfg.pair_dim,
                                     dtype=cfg.dtype)
        # nn.remat is a lifted transform: wrapping the class keeps the param
        # tree identical, so checkpoints load across the remat flag
        block_cls = (
            nn.remat(TrFoldBlock, policy=_remat_policy(cfg.remat_policy))
            if cfg.remat else TrFoldBlock
        )
        self.blocks = [
            block_cls(cfg, name=f"block_{i}") for i in range(cfg.n_blocks)
        ]
        if cfg.pair_pre_norm:
            # pre-norm stream: one final normalization before the heads
            self.final_node_norm = nn.LayerNorm(dtype=cfg.dtype)
            self.final_pair_norm = nn.LayerNorm(dtype=cfg.dtype)
        self.distogram_head = nn.Dense(cfg.n_dist_bins, dtype=jnp.float32)
        self.torsion_head = nn.Dense(6, dtype=jnp.float32)
        self.omega_head = nn.Dense(2, dtype=jnp.float32)
        self.theta_head = nn.Dense(2, dtype=jnp.float32)
        self.phi_head = nn.Dense(2, dtype=jnp.float32)

    def embed(self, feats: Dict[str, jnp.ndarray]):
        """Feature dict -> initial (node, pair) representations."""
        cfg = self.cfg

        # node embedding: sequence + torsion sin/cos
        node = self.seq_embed(feats["seq_idx"])
        # mask layout must mirror the FEATURE layout: concatenate([sin,
        # cos]) is [sin_phi, sin_psi, sin_omega, cos_phi, ...], so the
        # mask doubles by concatenation too — repeat() would interleave
        # [m_phi, m_phi, m_psi, ...] and zero/leak the wrong channels at
        # every chain terminus
        tor = jnp.concatenate(
            [jnp.sin(feats["torsions"]), jnp.cos(feats["torsions"])], axis=-1
        )
        tm = feats["torsion_mask"]
        tor = jnp.where(
            jnp.concatenate([tm, tm], axis=-1), tor, 0.0
        ).astype(cfg.dtype)
        node = node + self.torsion_embed(tor)
        if "chi" in feats:
            chi_sc = jnp.concatenate(
                [jnp.sin(feats["chi"]), jnp.cos(feats["chi"])], axis=-1
            )
            cm = feats["chi_mask"]
            chi_sc = jnp.where(
                jnp.concatenate([cm, cm], axis=-1), chi_sc, 0.0
            ).astype(cfg.dtype)
            node = node + self.chi_embed(chi_sc)

        # pair embedding: binned distance + angular sin/cos maps (either the
        # fused-kernel precomputed form or derived from raw angle maps)
        if "d_cb_bins" in feats:
            bins = feats["d_cb_bins"]
            ang = feats["ang_sincos"].astype(cfg.dtype)
        else:
            from protstruc_tpu.ops.histogram import distogram_bins

            bins = distogram_bins(feats["d_cb"], cfg.n_dist_bins, cfg.max_dist)
            ang = jnp.stack(
                [
                    jnp.sin(feats["omega"]), jnp.cos(feats["omega"]),
                    jnp.sin(feats["theta"]), jnp.cos(feats["theta"]),
                    jnp.sin(feats["phi"]), jnp.cos(feats["phi"]),
                ],
                axis=-1,
            )
            ang = jnp.nan_to_num(ang, nan=0.0).astype(cfg.dtype)
        pair = self.dist_embed(bins)
        ang = jnp.where(feats["pair_mask"][..., None], ang, 0.0)
        pair = pair + self.ang_embed(ang)

        # AF2-style relative position: clipped sequence offset, bucketed with
        # a dedicated "different chain" class when chain indices are given
        L = feats["seq_idx"].shape[1]
        offset = jnp.arange(L)[None, :, None] - jnp.arange(L)[None, None, :]
        clipped = jnp.clip(offset, -cfg.relpos_clip, cfg.relpos_clip) + cfg.relpos_clip
        n_rel = 2 * cfg.relpos_clip + 2  # last class = cross-chain
        if "chain_idx" in feats:
            cross = feats["chain_idx"][:, :, None] != feats["chain_idx"][:, None, :]
            clipped = jnp.where(cross, n_rel - 1, clipped)
        pair = pair + self.relpos_embed(clipped)
        return node, pair

    def heads(self, node, pair):
        """Final (node, pair) -> prediction heads."""
        if self.cfg.pair_pre_norm:
            node = self.final_node_norm(node)
            pair = self.final_pair_norm(pair)
        pair_sym = pair + jnp.swapaxes(pair, 1, 2)
        distogram = self.distogram_head(pair_sym)
        torsions = self.torsion_head(node)
        # the remaining trRosetta 6D heads: omega is symmetric, theta/phi are
        # directional — each predicted as (sin, cos) pairs
        return {
            "distogram_logits": distogram,
            "torsion_sincos": torsions.reshape(torsions.shape[:-1] + (3, 2)),
            "omega_sincos": self.omega_head(pair_sym),
            "theta_sincos": self.theta_head(pair),
            "phi_sincos": self.phi_head(pair),
        }

    def __call__(self, feats: Dict[str, jnp.ndarray]):
        mask = feats["residue_mask"]
        node, pair = self.embed(feats)

        moe_aux = 0.0
        for block in self.blocks:
            node, pair, aux = block(node, pair, mask)
            moe_aux = moe_aux + aux

        out = self.heads(node, pair)
        out["moe_aux_loss"] = jnp.asarray(moe_aux, jnp.float32)
        return out


class DiffusionDenoiser(nn.Module):
    """Epsilon-prediction denoiser over noisy CA coordinates.

    Pairs with ops/diffusion.py: given x_t and the timestep embedding,
    predict the added noise (MSE target from ``forward_marginal``).
    """

    cfg: TrFoldConfig = TrFoldConfig()

    @nn.compact
    def __call__(self, noisy_ca, t_embed, seq_idx, mask):
        cfg = self.cfg
        node = nn.Embed(cfg.vocab, cfg.node_dim, name="seq_embed", dtype=cfg.dtype)(seq_idx)
        node = node + nn.Dense(cfg.node_dim, name="coord_in", dtype=cfg.dtype)(noisy_ca)
        node = node + nn.Dense(cfg.node_dim, name="t_in", dtype=cfg.dtype)(t_embed)[:, None, :]

        # relative-position pair bias from current noisy geometry
        d = jnp.linalg.norm(
            noisy_ca[:, :, None, :] - noisy_ca[:, None, :, :], axis=-1, keepdims=True
        )
        pair = nn.Dense(cfg.pair_dim, name="dist_in", dtype=cfg.dtype)(d.astype(cfg.dtype))

        for i in range(2):
            node = node + PairBiasAttention(cfg, name=f"attn_{i}")(
                nn.LayerNorm(dtype=cfg.dtype)(node), pair, mask
            )
            h = nn.Dense(cfg.node_dim * 2, name=f"mlp_in_{i}", dtype=cfg.dtype)(
                nn.LayerNorm(dtype=cfg.dtype)(node)
            )
            node = node + nn.Dense(cfg.node_dim, name=f"mlp_out_{i}", dtype=cfg.dtype)(
                nn.gelu(h)
            )
        return nn.Dense(3, name="eps_head", dtype=jnp.float32)(node)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def loss_fn(params, model: TrFold, feats: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Masked distogram CE + torsion sin/cos MSE (self-supervised targets
    come from the featurization itself)."""
    from protstruc_tpu.ops.histogram import distogram_bins

    out = model.apply({"params": params}, feats)
    cfg = model.cfg

    if "d_cb_bins" in feats:
        target_bins = feats["d_cb_bins"]
    else:
        target_bins = distogram_bins(feats["d_cb"], cfg.n_dist_bins, cfg.max_dist)
    logp = jax.nn.log_softmax(out["distogram_logits"], axis=-1)
    ce = -jnp.take_along_axis(logp, target_bins[..., None], axis=-1)[..., 0]
    pm = feats["pair_mask"]
    ce = jnp.sum(jnp.where(pm, ce, 0.0)) / jnp.maximum(jnp.sum(pm), 1.0)

    target_sc = jnp.stack(
        [jnp.sin(feats["torsions"]), jnp.cos(feats["torsions"])], axis=-1
    )
    tm = feats["torsion_mask"][..., None]
    mse = jnp.sum(jnp.where(tm, (out["torsion_sincos"] - target_sc) ** 2, 0.0))
    mse = mse / jnp.maximum(jnp.sum(tm), 1.0)

    # inter-residue angle heads (sin/cos MSE; NaN/invalid targets masked out)
    pair_loss = 0.0
    for i, key in enumerate(("omega", "theta", "phi")):
        if "ang_sincos" in feats:
            sc = feats["ang_sincos"][..., 2 * i : 2 * i + 2].astype(jnp.float32)
            # invalid entries were emitted as (0, 0); valid ones are unit
            ok = feats["pair_mask"] & (jnp.sum(sc**2, -1) > 0.5)
        else:
            tgt = feats[key]
            ok = feats["pair_mask"] & jnp.isfinite(tgt)
            t = jnp.nan_to_num(tgt, nan=0.0)
            sc = jnp.stack([jnp.sin(t), jnp.cos(t)], axis=-1)
        err = jnp.where(ok[..., None], (out[f"{key}_sincos"] - sc) ** 2, 0.0)
        pair_loss = pair_loss + jnp.sum(err) / jnp.maximum(jnp.sum(ok), 1.0)

    return ce + mse + pair_loss + cfg.moe_aux_weight * out["moe_aux_loss"]


def pipeline_apply(params, model: TrFold, feats, mesh, n_microbatches: int = None):
    """Forward TrFold with its blocks as GPipe pipeline stages over 'pp'.

    The pp leg integrated into the flagship model (round-1 deferred item):
    embeddings and heads run replicated; the ``n_blocks`` TrFoldBlocks run
    one-per-device via :func:`parallel.pipeline.pipeline_forward`, with the
    batch split into ``n_microbatches`` microbatches (default: pipeline
    depth).  Requires ``cfg.n_blocks == mesh.shape['pp']``, ``B`` divisible
    by the microbatch count, and dense blocks (``moe_experts == 0`` — the
    MoE aux loss cannot ride the activation rotation, which is float-only).

    Numerically identical to ``model.apply`` (same blocks, same order);
    tested against it in tests/test_pipeline_moe.py.
    """
    from protstruc_tpu.parallel.pipeline import pipeline_forward, stack_stage_params

    cfg = model.cfg
    S = mesh.shape["pp"]
    if cfg.n_blocks != S:
        raise ValueError(f"n_blocks {cfg.n_blocks} != pp axis size {S}")
    if cfg.moe_experts > 0:
        raise ValueError("pipeline_apply supports dense blocks only")

    B = feats["seq_idx"].shape[0]
    M = n_microbatches or min(S, B)
    if B % M:
        raise ValueError(f"batch {B} not divisible into {M} microbatches")

    node, pair = model.apply({"params": params}, feats, method=TrFold.embed)
    mask = feats["residue_mask"]

    stages = stack_stage_params([params[f"block_{i}"] for i in range(S)])
    block = TrFoldBlock(cfg)

    def stage_fn(p, act):
        n, pr, aux = block.apply(
            {"params": p}, act["node"], act["pair"], act["mask"] > 0.5
        )
        return {"node": n, "pair": pr, "mask": act["mask"]}

    def mb(x):  # (B, ...) -> (M, B/M, ...)
        return x.reshape((M, B // M) + x.shape[1:])

    acts = {
        "node": mb(node),
        "pair": mb(pair),
        "mask": mb(mask.astype(node.dtype)),
    }
    out = pipeline_forward(stage_fn, stages, acts, mesh)
    node = out["node"].reshape((B,) + out["node"].shape[2:])
    pair = out["pair"].reshape((B,) + out["pair"].shape[2:])

    result = model.apply({"params": params}, node, pair, method=TrFold.heads)
    result["moe_aux_loss"] = jnp.zeros((), jnp.float32)
    return result


def make_train_state(
    model: TrFold, feats, key, learning_rate: float = 1e-3
) -> Tuple[Any, Any, optax.GradientTransformation]:
    params = model.init(key, feats)["params"]
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(params)
    return params, opt_state, tx


def train_step(params, opt_state, feats, model: TrFold, tx):
    """One optimizer step; pure function of its inputs (pjit-able)."""
    loss, grads = jax.value_and_grad(loss_fn)(params, model, feats)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def predict_structure(params, model: TrFold, feats, max_iter: int = 200):
    """Model predictions -> 3D backbone via the trRosetta decode path.

    Converts the distogram to expected CB distances and the angle heads to
    radians, then runs reconstruction + MDS + idealization (B=1).
    Returns ``(coords (5, L, 3) N/CA/C/O/CB, predicted 6D dict)``.
    """
    from protstruc_tpu.ops.idealize import idealize_backbone
    from protstruc_tpu.ops.reconstruct import (
        initialize_backbone_with_mds,
        reconstruct_backbone_distmat_from_interresidue_geometry,
    )

    out = model.apply({"params": params}, feats)
    cfg = model.cfg

    probs = jax.nn.softmax(out["distogram_logits"], axis=-1)
    centers = (jnp.arange(cfg.n_dist_bins) + 0.5) * (cfg.max_dist / cfg.n_dist_bins)
    d_cb = jnp.einsum("blmk,k->blm", probs, centers)

    def ang(key):
        sc = out[f"{key}_sincos"]
        return jnp.arctan2(sc[..., 0], sc[..., 1])

    pred = {"d_cb": d_cb, "omega": ang("omega"), "theta": ang("theta"),
            "phi": ang("phi")}

    mask = feats["pair_mask"][0]
    dist = reconstruct_backbone_distmat_from_interresidue_geometry(
        d_cb[0], pred["omega"][0], pred["theta"][0], pred["phi"][0], mask=mask
    )
    coords = initialize_backbone_with_mds(dist, max_iter=max_iter)
    bb = jnp.stack([coords[0], coords[1], coords[2], coords[3]], axis=1)
    refined, _ = idealize_backbone(bb, n_steps=150)
    coords = jnp.stack(
        [refined[:, 0], refined[:, 1], refined[:, 2], refined[:, 3], coords[4]]
    )
    return coords, pred


# ---------------------------------------------------------------------------
# sharding rules
# ---------------------------------------------------------------------------


def param_shardings(params, mesh: Mesh):
    """NamedShardings for TrFold params: head/hidden dims over tp.

    Rules (by parameter path):
      * attention ``qkv`` kernels  (D, 3, h, dh)  -> shard h over tp
      * attention ``out`` kernels  (h, dh, D)     -> shard h over tp
      * MLP ``mlp_in`` kernel      (D, 4D)        -> shard out dim over tp
      * MLP ``mlp_out`` kernel     (4D, D)        -> shard in dim over tp
      * everything else replicated.
    """

    def spec_for(path, x):
        names = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(names)
        if x.ndim == 4 and "qkv" in joined:
            return P(None, None, "tp", None)
        if x.ndim == 3 and joined.endswith("out/kernel"):
            return P("tp", None, None)
        if "mlp_in" in joined and names[-1] == "kernel":
            return P(None, "tp")
        if "mlp_out" in joined and names[-1] == "kernel":
            return P("tp", None)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, spec_for(path, x)), params
    )


def feats_shardings(mesh: Mesh):
    """NamedShardings for the featurization dict: B over dp, first L over sp."""
    pair = NamedSharding(mesh, P("dp", "sp", None))
    node = NamedSharding(mesh, P("dp", "sp"))
    return {
        "seq_idx": node,
        "torsions": NamedSharding(mesh, P("dp", "sp", None)),
        "torsion_mask": NamedSharding(mesh, P("dp", "sp", None)),
        "d_cb": pair,
        "omega": pair,
        "theta": pair,
        "phi": pair,
        "pair_mask": pair,
        "residue_mask": node,
        "chain_idx": node,
        # fused-featurization layout (featurize_for_model(fused=True))
        "d_cb_bins": pair,
        "ang_sincos": NamedSharding(mesh, P("dp", "sp", None, None)),
        # optional sidechain torsions (featurize_for_model(include_chi=True))
        "chi": NamedSharding(mesh, P("dp", "sp", None)),
        "chi_mask": NamedSharding(mesh, P("dp", "sp", None)),
    }
