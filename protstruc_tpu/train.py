"""Production training loop: PDB directory -> trained FoldModel checkpoint.

A framework surface the reference never had (it is a tensor library;
README.md:7-12): a resumable, bucketed, checkpointed training loop driving
the full stack — streaming ingest (pdbio/dataset.py), fused Pallas
featurization, FoldModel (TrFold trunk + IPA structure module, optional
recycling), trajectory-FAPE loss, orbax checkpointing — exposed both as a
library call (:func:`train`) and the ``protstruc_tpu train`` / ``fold``
CLI.

Design (TPU):

* batches stream through length buckets, so the jitted step compiles once
  per (batch, bucket) shape; first epoch pays the compiles, later epochs
  are steady-state.
* checkpoints carry the model config (config.json) next to the orbax
  state, so ``fold`` can rebuild the model without the training script.
* resume is automatic: if the checkpoint dir has a step, training
  continues from it up to the TOTAL ``steps`` target (a crash-recovery
  rerun completes the configured run; pass a larger ``steps`` to extend).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
import functools
from functools import partial
from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["TrainConfig", "train", "fold_sequence", "load_fold_model",
           "best_eval_step"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    steps: int = 1000
    batch_size: int = 4
    node_dim: int = 128
    pair_dim: int = 64
    n_heads: int = 4
    n_blocks: int = 4
    n_ipa_iter: int = 6
    n_recycle: int = 1
    sequence_only: bool = False   # train the sequence->structure path
    learning_rate: float = 3e-4
    grad_clip: float = 1.0
    # learning-rate schedule: "constant" (default) or "warmup_cosine"
    # (linear warmup over warmup_steps to learning_rate, cosine decay to
    # lr_min_ratio * learning_rate at cfg.steps).  The schedule is indexed
    # by OPTIMIZER steps, so it composes with accum_steps (k microbatches
    # advance it once) and with resume (the restored opt-state count
    # continues the schedule where it left off).
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    lr_min_ratio: float = 0.1
    # exponential moving average of the params (0.0 = off).  The EMA tree
    # rides inside the optimizer state (a terminal no-op transform), so
    # checkpointing, resume and ZeRO-1 sharding need no special cases;
    # load_fold_model returns the EMA weights when the checkpoint was
    # trained with this on (the standard eval-quality lever for fold and
    # diffusion models)
    ema_decay: float = 0.0
    # gradient accumulation: each train step processes one microbatch of
    # batch_size structures; the optimizer applies once every accum_steps
    # microbatches (optax.MultiSteps).  Effective batch = batch_size *
    # accum_steps at ~1/accum_steps the optimizer HBM traffic per
    # microbatch — the standard lever when the target batch doesn't fit
    accum_steps: int = 1
    save_every: int = 500
    seed: int = 0
    shuffle: bool = True
    bf16: bool = False
    # trunk pair-update mechanism: "gated_mix" (gated row/column mixing,
    # the throughput choice) or "triangle" (true Evoformer triangle
    # multiplicative updates — higher capacity, O(L^3 P); pair with
    # remat=True at production widths)
    pair_update: str = "gated_mix"
    remat: bool = False
    # remat policy (with remat=True): "none" recomputes the whole block;
    # "tri_dots" saves the triangle-contraction outputs so the backward
    # pass skips the O(L^3 P) einsums (models/trfold.py _remat_policy)
    remat_policy: str = "none"
    # fused flash pair-bias attention (ops/flash_attn.py) for the trunk's
    # node attention: online softmax over key tiles in a Pallas kernel, no
    # (B, H, L, L) logits/probs in HBM — the long-L node-attention lever
    # (1.8-2.9x fwd+bwd on v5e). Shards over dp/tp meshes; under sp>1 the
    # trunk switches to ring flash attention (ops/ring_attn.py).
    use_flash_attn: bool = False
    # fused Pallas triangle-multiplication kernels (ops/tri_mul.py) for
    # pair_update="triangle": the LN+gate/proj prologue and gate+LN+proj
    # epilogue each run as one streaming pass with fused backwards —
    # removes the pair-stream elementwise passes that bound MFU at
    # production widths.  Param tree unchanged (checkpoints interchange);
    # off-TPU load_fold_model flips it off (interpreter-only there).
    fused_tri: bool = False
    # observability: append {"step", "loss", "ms", "t"} lines to
    # <checkpoint_dir>/metrics.jsonl every log interval; capture an XProf
    # trace of steps 3-6 into profile_dir when set
    metrics_jsonl: bool = True
    profile_dir: Optional[str] = None
    # data augmentation: train on random contiguous crops of this many
    # residues (AF2-style); also collapses every length bucket to one
    # compiled shape
    crop_len: Optional[int] = None
    # (dp, sp, tp) device-mesh factorization; None = single device.
    # batch_size must divide dp, the length bucket must divide sp, and
    # n_heads must divide tp.  Params shard per ipa_param_shardings
    # (attention heads over tp), batches shard P(('dp',), 'sp') — XLA
    # (GSPMD) inserts the collectives.
    mesh_shape: Optional[tuple] = None
    # ZeRO-1: partition the Adam moments over the dp axis instead of
    # replicating them (parallel/zero.py) — saves 8 bytes/param/replica
    # of HBM at the cost of one all-gather per step that GSPMD inserts
    zero1: bool = False
    # held-out eval memory cap: the trunk's O(L^2 P) pair stream (and the
    # triangle O(L^3 P) contractions) OOM one v5e near L ~ 2400 at the
    # production eval config, so structures longer than this evaluate on
    # contiguous windows, metrics averaged weighted by valid residues.
    # Windowed lDDT excludes cross-window contacts (documented
    # approximation).  None/0 disables the cap.
    eval_max_len: Optional[int] = 1024

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        return json.dumps(d, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "TrainConfig":
        d = json.loads(text)
        if d.get("mesh_shape") is not None:
            d["mesh_shape"] = tuple(d["mesh_shape"])
        return cls(**d)


class EmaParamsState(NamedTuple):
    """State of :func:`_params_ema` — the EMA of the params themselves."""

    ema: Any


def _params_ema(decay: float):
    """Terminal optax transform maintaining an EMA of the PARAMS.

    Passes updates through unchanged; after each optimizer apply the state
    tracks ``ema <- decay * ema + (1 - decay) * (params + updates)``.
    Living inside the optimizer chain means the EMA tree is checkpointed,
    restored, donated and ZeRO-sharded exactly like the Adam moments.
    Under optax.MultiSteps it advances once per accumulation cycle (the
    mid-cycle no-op updates are all-zero, which would otherwise decay the
    EMA toward stale params — MultiSteps only calls the inner chain at
    the apply step, so this composes correctly).
    """
    import optax

    def init(params):
        # copy, don't alias: the train step donates params AND opt_state —
        # shared buffers would be donated twice on the first step
        return EmaParamsState(
            ema=jax.tree_util.tree_map(jnp.copy, params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("_params_ema requires params")
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            state.ema, new_params)
        return updates, EmaParamsState(ema=ema)

    return optax.GradientTransformation(init, update)


def _build_tx(cfg: TrainConfig):
    """The production optimizer chain for ``cfg`` (shared with
    load_fold_model, which rebuilds it as a restore template)."""
    import optax

    if cfg.lr_schedule == "constant":
        lr = cfg.learning_rate
    elif cfg.lr_schedule == "warmup_cosine":
        # both durations in OPTIMIZER steps: cfg.steps and warmup_steps
        # are microbatch-denominated, the schedule is advanced once per
        # accum cycle — mixing units would make warmup accum_steps-times
        # longer than configured (and crash optax when it exceeds decay)
        accum = max(cfg.accum_steps, 1)
        decay = max(cfg.steps // accum, 2)
        warm = min(max(cfg.warmup_steps // accum, 1), decay - 1)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=warm, decay_steps=decay,
            end_value=cfg.lr_min_ratio * cfg.learning_rate)
    else:
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r} "
                         "(constant | warmup_cosine)")
    parts = [optax.clip_by_global_norm(cfg.grad_clip), optax.adamw(lr)]
    if cfg.ema_decay > 0.0:
        parts.append(_params_ema(cfg.ema_decay))
    tx = optax.chain(*parts)
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


def _find_ema(opt_state):
    """Extract the EMA param tree from a (possibly wrapped) opt state."""
    found = []

    def walk(node):
        if isinstance(node, EmaParamsState):
            found.append(node.ema)
            return
        if isinstance(node, tuple):  # chain tuples + NamedTuples
            for child in node:
                walk(child)

    walk(opt_state)
    if len(found) != 1:
        raise ValueError(f"expected exactly one EmaParamsState in the "
                         f"optimizer state, found {len(found)}")
    return found[0]


def _build_model(cfg: TrainConfig, ring_mesh=None):
    from protstruc_tpu.models.ipa import FoldModel, IPAConfig
    from protstruc_tpu.models.trfold import TrFoldConfig

    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    trunk = TrFoldConfig(node_dim=cfg.node_dim, pair_dim=cfg.pair_dim,
                         n_heads=cfg.n_heads, n_blocks=cfg.n_blocks,
                         dtype=dtype, pair_update=cfg.pair_update,
                         remat=cfg.remat, remat_policy=cfg.remat_policy,
                         use_flash_attn=cfg.use_flash_attn,
                         fused_tri=cfg.fused_tri,
                         ring_mesh=ring_mesh)
    return FoldModel(
        trunk_cfg=trunk,
        ipa_cfg=IPAConfig(n_heads=cfg.n_heads, n_iter=cfg.n_ipa_iter),
        n_recycle=cfg.n_recycle,
    )


def _featurize(batch, cfg: TrainConfig, trunk_cfg, key=None,
               seq_idx_override=None):
    """``seq_idx_override``: pre-computed ``(B, <= L)`` residue identities
    for batches whose string ``seq`` metadata is stale (eval windows slice
    the arrays but cannot slice the per-chain sequence strings); padded to
    the batch length with UNK."""
    import numpy as np

    from protstruc_tpu.models.trfold import (
        featurize_for_model, featurize_from_sequence)
    from protstruc_tpu.vocab import AA

    if seq_idx_override is not None:
        pad = batch.n_residues - seq_idx_override.shape[1]
        seq_idx = jnp.asarray(
            np.pad(np.asarray(seq_idx_override), ((0, 0), (0, pad)),
                   constant_values=int(AA.UNK)) if pad
            else seq_idx_override)
    else:
        seq_idx = batch.get_seq_idx() if batch.seq is not None else None
    if cfg.crop_len and key is not None and cfg.crop_len < batch.n_residues:
        if seq_idx is None:
            batch = batch.random_crop(key, cfg.crop_len)
        else:
            batch, (seq_idx,) = batch.random_crop(key, cfg.crop_len,
                                                  extras=(seq_idx,))
    target = featurize_for_model(batch, fused=True,
                                 n_dist_bins=trunk_cfg.n_dist_bins,
                                 max_dist=trunk_cfg.max_dist)
    if seq_idx is not None:
        target["seq_idx"] = seq_idx
    if not cfg.sequence_only:
        return target, None, batch
    feats = featurize_from_sequence(target["seq_idx"], batch.chain_idx,
                                    n_dist_bins=trunk_cfg.n_dist_bins)
    feats["residue_mask"] = batch.residue_mask
    return feats, target, batch


@functools.lru_cache(maxsize=8)
def _jitted_apply(model):
    """Per-model jitted forward (flax Modules hash by config) — an eager
    apply would dispatch the trunk op-by-op, and on the remote-relay TPU
    each eager op is a tunnel round trip; eval shapes are bucketed so the
    jit cache stays small."""
    return jax.jit(lambda params, feats: model.apply({"params": params},
                                                     feats))


def eval_batch_metrics(model, params, cfg: TrainConfig, batch):
    """Per-structure ``(ca_lddt (B,), ca_rmsd (B,), n_windows)`` for one
    batch, windowing structures longer than ``cfg.eval_max_len``.

    Windows are contiguous ``[s, s + eval_max_len)`` residue slices scored
    independently and averaged weighted by valid-residue count — the
    full-length pair tensors of very long chains (8gpi: 2364 residues)
    exceed one chip's HBM otherwise.  Cross-window contacts are excluded
    from the windowed lDDT (documented approximation).  Shared by
    :func:`evaluate` and experiments/fold_generalization.py."""
    import numpy as np

    from protstruc_tpu.ops.metrics import lddt, rmsd
    from protstruc_tpu.utils.buckets import pad_batch_to_bucket

    if getattr(model.trunk_cfg, "ring_mesh", None) is not None:
        # eval batches can be partial/ragged (StructureDataset flushes
        # remainders, eval_per_structure passes B=1) and the ring
        # shard_map requires B % dp == 0 — ring changes no params, so
        # evaluate on the single-device flash path instead
        model = model.clone(trunk_cfg=dataclasses.replace(
            model.trunk_cfg, ring_mesh=None))

    L = batch.n_residues
    cap = cfg.eval_max_len or L
    # equal-split windowing: n = ceil(L / cap) near-equal slices (each <=
    # cap) instead of fixed-stride slices with an arbitrarily short tail —
    # an e.g. 1-residue tail window has ~0 aligned RMSD by construction and
    # would flatter the weighted average (ADVICE r4)
    n_win = -(-L // cap)
    wins = ([(0, L)] if n_win == 1
            else [(i * L // n_win, (i + 1) * L // n_win)
                  for i in range(n_win)])
    seq_idx = (np.asarray(batch.get_seq_idx())
               if len(wins) > 1 and batch.seq is not None else None)

    num_l = np.zeros(batch.batch_size)
    num_r = np.zeros(batch.batch_size)
    den = np.zeros(batch.batch_size)
    for s, e in wins:
        if len(wins) == 1:
            w, sidx = pad_batch_to_bucket(batch), None
        else:
            w = pad_batch_to_bucket(batch.replace(
                xyz=batch.xyz[:, s:e], atom_mask=batch.atom_mask[:, s:e],
                chain_idx=batch.chain_idx[:, s:e],
                residue_idx=batch.residue_idx[:, s:e],
                seq=None, chain_ids=None))
            sidx = seq_idx[:, s:e] if seq_idx is not None else None
        feats, _target, w = _featurize(w, cfg, model.trunk_cfg,
                                       seq_idx_override=sidx)
        out = _jitted_apply(model)(params, feats)
        ca_true = jnp.nan_to_num(w.xyz[:, :, 1], nan=1e6)
        mask = w.residue_mask & jnp.isfinite(w.xyz[:, :, 1]).all(-1)
        nv = np.asarray(mask.sum(axis=1), dtype=float)
        l = np.asarray(lddt(out["xyz"][:, :, 1], ca_true, mask=mask))
        r = np.asarray(rmsd(out["xyz"][:, :, 1], ca_true, mask=mask,
                            align=True))
        num_l += np.where(nv > 0, l, 0.0) * nv
        num_r += np.where(nv > 0, r, 0.0) * nv
        den += nv
    den = np.maximum(den, 1.0)
    return num_l / den, num_r / den, len(wins)


def evaluate(model, params, paths: Sequence[str], cfg: TrainConfig) -> dict:
    """Held-out structure metrics: mean CA-lDDT and aligned CA-RMSD.

    Structures longer than ``cfg.eval_max_len`` are scored on contiguous
    windows (see :func:`eval_batch_metrics`).  ``eval_n_windows`` in the
    returned dict is the max window count over the eval set (1 = every
    structure scored full-length) — windowed lDDT excludes cross-window
    contacts, so scores with ``eval_n_windows > 1`` are not comparable to
    full-length ones and the flag makes that visible in metrics.jsonl
    (ADVICE r4)."""
    import numpy as np

    from protstruc_tpu.pdbio.dataset import StructureDataset

    ls, rs = [], []
    max_windows = 1
    for batch in StructureDataset(list(paths), batch_size=cfg.batch_size,
                                  shuffle=False):
        l, r, nw = eval_batch_metrics(model, params, cfg, batch)
        ls.append(l)
        rs.append(r)
        max_windows = max(max_windows, nw)
    return {"eval_ca_lddt": float(np.concatenate(ls).mean()),
            "eval_ca_rmsd": float(np.concatenate(rs).mean()),
            "eval_n_windows": max_windows}


def train(
    paths: Sequence[str],
    checkpoint_dir: str,
    cfg: TrainConfig = TrainConfig(),
    log_fn=print,
    eval_paths: Sequence[str] = None,
) -> dict:
    """Train FoldModel over ``paths``; returns final metrics dict.

    ``eval_paths``: optional held-out structures — mean CA-lDDT / CA-RMSD
    are computed at every checkpoint save and at the end (recorded in
    metrics.jsonl and the returned dict).
    """
    import optax

    from protstruc_tpu.models.checkpoint import (
        latest_step, restore_train_state, save_train_state)
    from protstruc_tpu.models.ipa import fold_loss_fn
    from protstruc_tpu.pdbio.dataset import StructureDataset

    if not paths:
        raise ValueError("train() needs at least one input structure")
    if cfg.zero1 and cfg.mesh_shape is None:
        raise ValueError(
            "zero1=True requires mesh_shape: ZeRO-1 partitions optimizer "
            "state over the dp mesh axis — without a mesh it would be "
            "silently ignored")
    mesh = None
    if cfg.mesh_shape is not None:
        from protstruc_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis_shapes=cfg.mesh_shape)
    # flash + sequence parallelism = ring attention: k/v blocks rotate over
    # the sp axis (ppermute) with an online-softmax merge, so neither the
    # (B, H, L, L) bias nor the keys are ever gathered (ops/ring_attn.py)
    ring_mesh = (mesh if (cfg.use_flash_attn and cfg.mesh_shape is not None
                          and cfg.mesh_shape[1] > 1) else None)
    if ring_mesh is not None:
        log_fn(f"[train] flash attention rings over sp={cfg.mesh_shape[1]}")
    model = _build_model(cfg, ring_mesh=ring_mesh)
    tx = _build_tx(cfg)

    if cfg.mesh_shape is not None:
        log_fn(f"[train] mesh dp={cfg.mesh_shape[0]} sp={cfg.mesh_shape[1]} "
               f"tp={cfg.mesh_shape[2]} over {mesh.size} devices")

    ds = StructureDataset(paths, batch_size=cfg.batch_size,
                          shuffle=cfg.shuffle, seed=cfg.seed)

    os.makedirs(checkpoint_dir, exist_ok=True)
    cfg_path = os.path.join(checkpoint_dir, "config.json")
    # resume safety: the checkpoint's params were built for the config that
    # trained them — silently overwriting config.json with different model
    # shapes would surface only as opaque orbax restore errors (and `fold`
    # would later trust the wrong config).  Error on any mismatch of the
    # fields that shape params or the input pipeline.
    if latest_step(checkpoint_dir) is not None and os.path.exists(cfg_path):
        with open(cfg_path) as fh:
            existing = TrainConfig.from_json(fh.read())
        # accum_steps shapes the OPT state (MultiSteps wraps the moment
        # tree), so resuming across a change would fail in orbax — error
        # loudly with the others
        # lr_schedule also shapes the OPT state: adamw(float) carries
        # EmptyState where adamw(schedule) carries ScaleByScheduleState,
        # so resuming across a schedule change mismatches the saved tree
        shape_fields = ("node_dim", "pair_dim", "n_heads", "n_blocks",
                        "n_ipa_iter", "n_recycle", "sequence_only", "bf16",
                        "pair_update", "accum_steps", "ema_decay",
                        "lr_schedule")
        diff = {f: (getattr(existing, f), getattr(cfg, f))
                for f in shape_fields
                if getattr(existing, f) != getattr(cfg, f)}
        if diff:
            raise ValueError(
                f"checkpoint_dir {checkpoint_dir!r} holds a checkpoint "
                f"trained with a different model config: "
                + ", ".join(f"{k}={a!r} (checkpoint) vs {b!r} (requested)"
                            for k, (a, b) in diff.items())
                + ". Use a fresh checkpoint_dir or match the saved config.")
    with open(cfg_path, "w") as fh:
        fh.write(cfg.to_json())

    # donate params/opt_state: XLA updates them in place instead of holding
    # old + new copies live across the step — at production widths the
    # optimizer traffic halves and the freed HBM goes to activations.
    # opt_pin is filled before the first trace when cfg.zero1: without the
    # constraint GSPMD would propagate the replicated gradient sharding
    # through the moment update and silently undo the ZeRO partitioning.
    opt_pin = [None]

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, feats, target, xyz):
        loss, grads = jax.value_and_grad(fold_loss_fn)(
            params, model, feats, xyz, target_feats=target)
        updates, opt_state = tx.update(grads, opt_state, params)
        if opt_pin[0] is not None:
            opt_state = jax.lax.with_sharding_constraint(opt_state, opt_pin[0])
        return optax.apply_updates(params, updates), opt_state, loss

    params = opt_state = None
    start_step = 0
    t0 = time.perf_counter()
    step = 0
    losses = []
    last_eval = None  # (step, eval dict) of the newest in-loop held-out eval
    # cfg.steps is the TOTAL step target: a crash-recovery rerun of the
    # same command completes to the configured total instead of training
    # cfg.steps more (which would also leave warmup_cosine resumes
    # running entirely at the floor LR past the schedule end).  To EXTEND
    # a finished run, pass a larger steps with the same shape config.
    while step < cfg.steps or params is None:
        for batch in ds:
            if mesh is not None:
                from protstruc_tpu.parallel.mesh import shard_batch

                batch = shard_batch(batch, mesh)
            feats, target, batch = _featurize(
                batch, cfg, model.trunk_cfg,
                key=jax.random.PRNGKey(cfg.seed * 100003 + step))
            if params is None:
                params = model.init(jax.random.PRNGKey(cfg.seed), feats)["params"]
                if mesh is not None:
                    from protstruc_tpu.models.ipa import ipa_param_shardings

                    p_shardings = ipa_param_shardings(params, mesh)
                    params = jax.device_put(params, p_shardings)
                    opt_state = jax.jit(tx.init)(params)
                    if cfg.zero1:
                        from protstruc_tpu.parallel.zero import (
                            shard_opt_state_zero1)

                        opt_state, opt_pin[0] = shard_opt_state_zero1(
                            opt_state, mesh, param_shardings=p_shardings)
                else:
                    opt_state = tx.init(params)
                prev = latest_step(checkpoint_dir)
                if prev is not None:
                    params, opt_state, start_step = restore_train_state(
                        checkpoint_dir, params_like=params,
                        opt_state_like=opt_state)
                    step = start_step
                    log_fn(f"[train] resumed from step {start_step}")
                    if step >= cfg.steps:
                        log_fn(f"[train] checkpoint already at step {step} "
                               f">= steps={cfg.steps}; nothing to train")
                        break
            if cfg.profile_dir and step - start_step == 3:
                jax.profiler.start_trace(cfg.profile_dir)
            t_step = time.perf_counter()
            params, opt_state, loss = step_fn(
                params, opt_state, feats, target, batch.xyz)
            step += 1
            losses.append(float(loss))  # blocks: host-visible step time
            step_ms = (time.perf_counter() - t_step) * 1e3
            if cfg.profile_dir and step - start_step == 6:
                jax.profiler.stop_trace()
                log_fn(f"[train] XProf trace (steps 3-6) -> {cfg.profile_dir}")
            if step % max(cfg.steps // 10, 1) == 0:
                log_fn(f"[train] step {step:5d}  loss {losses[-1]:.4f}  "
                       f"{step_ms:.0f} ms")
                if cfg.metrics_jsonl:
                    with open(os.path.join(checkpoint_dir,
                                           "metrics.jsonl"), "a") as fh:
                        fh.write(json.dumps(
                            {"step": step, "loss": losses[-1],
                             "ms": round(step_ms, 1),
                             "t": round(time.perf_counter() - t0, 1)}) + "\n")
            if cfg.save_every and step % cfg.save_every == 0:
                save_train_state(checkpoint_dir, step, params, opt_state)
                if eval_paths:
                    ev = evaluate(model, params, eval_paths, cfg)
                    last_eval = (step, ev)
                    log_fn(f"[eval] step {step}: "
                           + " ".join(f"{k}={v:.3f}" for k, v in ev.items()))
                    if cfg.metrics_jsonl:
                        with open(os.path.join(checkpoint_dir,
                                               "metrics.jsonl"), "a") as fh:
                            fh.write(json.dumps(dict(ev, step=step)) + "\n")
            if step >= cfg.steps:
                break

    save_train_state(checkpoint_dir, step, params, opt_state)
    dt = time.perf_counter() - t0
    # losses is empty when the checkpoint was already at/past the target
    final_loss = losses[-1] if losses else None
    result = {"steps": step, "final_loss": final_loss, "seconds": dt}
    if eval_paths:
        if last_eval is not None and last_eval[0] == step:
            # cadence-aligned final step: the in-loop eval already scored
            # these exact params — reuse its dict instead of relying on a
            # loop-scoped binding (ADVICE r4)
            ev = last_eval[1]
            fresh_eval = False
        else:
            ev = evaluate(model, params, eval_paths, cfg)
            fresh_eval = True
        result.update(ev)
        log_fn("[eval] final: " + " ".join(
            f"{k}={v:.3f}" for k, v in result.items() if k.startswith("eval")))
        # persist the final checkpoint's eval like the in-loop ones: when
        # cfg.steps is off the save_every cadence, step='best' could
        # otherwise never select the final (possibly best) checkpoint
        if cfg.metrics_jsonl and fresh_eval:
            with open(os.path.join(checkpoint_dir, "metrics.jsonl"),
                      "a") as fh:
                fh.write(json.dumps(dict(ev, step=step)) + "\n")
    log_fn(f"[train] done: {step - start_step} steps in {dt:.0f}s "
           f"({dt / max(step - start_step, 1) * 1e3:.0f} ms/step)"
           + (f", final loss {final_loss:.4f}" if losses else ""))
    return result


def best_eval_step(checkpoint_dir: str,
                   metric: str = "eval_ca_lddt") -> Optional[int]:
    """Checkpointed step with the best recorded held-out eval metric.

    Reads <checkpoint_dir>/metrics.jsonl (written by :func:`train` when
    ``eval_paths`` is given) and returns the step with the best ``metric``
    among steps that actually have a checkpoint.  Higher is better except
    for ``*rmsd*`` metrics.  Returns None when no eval rows coincide with
    a saved checkpoint (e.g. training ran without ``eval_paths``).

    With ``ema_decay > 0`` the in-training eval curve is computed on the
    raw params while ``load_fold_model`` returns the EMA weights, so the
    selection metric is a proxy for the loaded model at that step —
    normally fine (the EMA tracks the raw params), but pass
    ``use_ema=False`` to load exactly what was evaluated.
    """
    from protstruc_tpu.models.checkpoint import all_steps

    path = os.path.join(checkpoint_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return None
    saved = set(all_steps(checkpoint_dir))
    best, best_v = None, None
    lower_is_better = "rmsd" in metric
    with open(path) as fh:
        for line in fh:
            try:
                row = json.loads(line)
            except ValueError:
                continue
            v = row.get(metric)
            if v is None or row.get("step") not in saved:
                continue
            if (best_v is None or (v < best_v if lower_is_better
                                   else v > best_v)):
                best, best_v = int(row["step"]), v
    return best


def load_fold_model(checkpoint_dir: str, use_ema: bool = True, step=None):
    """Rebuild (model, params, cfg) from a training checkpoint dir.

    When the checkpoint was trained with ``ema_decay > 0`` (the EMA tree
    rides inside the optimizer state), the returned params are the EMA
    weights — the standard inference choice; pass ``use_ema=False`` for
    the raw last-step params.

    ``step`` selects which checkpoint to load: ``None`` (default) takes
    the latest, an int takes that exact step, and ``"best"`` takes the
    step with the best held-out ``eval_ca_lddt`` recorded in
    metrics.jsonl (:func:`best_eval_step`) — eval curves routinely peak
    before the final step, so "best" is the standard inference choice
    when training ran with ``eval_paths``.  Falls back to the latest
    (with a warning) when no eval record matches a saved checkpoint.
    """
    from protstruc_tpu.models.checkpoint import restore_train_state
    from protstruc_tpu.models.trfold import featurize_from_sequence

    if step == "best":
        step = best_eval_step(checkpoint_dir)
        if step is None:
            import warnings

            warnings.warn(
                f"load_fold_model(step='best'): no eval metric rows match "
                f"a saved checkpoint under {checkpoint_dir!r} (was training "
                "run with eval_paths?); loading the latest step instead.",
                stacklevel=2)

    with open(os.path.join(checkpoint_dir, "config.json")) as fh:
        cfg = TrainConfig.from_json(fh.read())
    if not cfg.sequence_only:
        import warnings

        warnings.warn(
            f"checkpoint {checkpoint_dir!r} was trained structure-conditioned "
            "(sequence_only=False): its inputs were ground-truth distogram/"
            "angle features, so folding from a bare sequence is out-of-"
            "distribution and the coordinates (and pLDDT) are unreliable. "
            "Train with sequence_only=True (CLI: --sequence-only) for a "
            "checkpoint meant for sequence folding.",
            stacklevel=2)
    if cfg.use_flash_attn and jax.default_backend() != "tpu":
        # flash-trained checkpoints are path-interchangeable with the jnp
        # attention (same param tree, values within 1e-4); off-TPU the
        # kernel would run in the Pallas interpreter — orders of magnitude
        # slower than XLA's fused einsums, with no numerical upside.
        cfg = dataclasses.replace(cfg, use_flash_attn=False)
    if cfg.fused_tri and jax.default_backend() != "tpu":
        # same interchange for the fused triangle kernels (identical param
        # tree, values to dtype rounding)
        cfg = dataclasses.replace(cfg, fused_tri=False)
    model = _build_model(cfg)

    dummy = featurize_from_sequence(
        jnp.zeros((1, 8), jnp.int32), n_dist_bins=model.trunk_cfg.n_dist_bins)
    params_like = model.init(jax.random.PRNGKey(0), dummy)["params"]
    if use_ema and cfg.ema_decay > 0.0:
        opt_like = _build_tx(cfg).init(params_like)
        _, opt_state, _step = restore_train_state(
            checkpoint_dir, step=step, params_like=params_like,
            opt_state_like=opt_like)
        return model, _find_ema(opt_state), cfg
    params, _, _step = restore_train_state(checkpoint_dir, step=step,
                                           params_like=params_like)
    return model, params, cfg


def fold_sequence(
    checkpoint_dir: str,
    sequence: str,
    n_recycle: Optional[int] = None,
    return_confidence: bool = False,
    step=None,
    use_ema: bool = True,
):
    """Sequence string -> predicted backbone ``(L, 5, 3)`` N/CA/C/O/CB.

    Multi-chain complexes: separate chains with ``:`` (e.g.
    ``"MKV...:GSH..."``) — chain breaks enter through the cross-chain
    relative-position class of the trunk's pair embedding.  ``L`` is the
    total residue count.

    With ``return_confidence=True`` returns ``(coords, plddt (L,), pae
    (L, L))`` — per-residue predicted lDDT in [0, 100] and the predicted
    aligned-error matrix in angstroms (the model's own calibration heads).
    """
    model, params, cfg = load_fold_model(checkpoint_dir, step=step,
                                         use_ema=use_ema)
    return fold_with_model(model, params, cfg, sequence,
                           n_recycle=n_recycle,
                           return_confidence=return_confidence)


def fold_with_model(model, params, cfg, sequence: str,
                    n_recycle: Optional[int] = None,
                    return_confidence: bool = False):
    """Fold with an already-loaded (model, params, cfg) — the serving path
    (one checkpoint load per session, not per request)."""
    from protstruc_tpu import geometry as geom
    from protstruc_tpu.models.ipa import pae_from_logits, plddt_from_logits
    from protstruc_tpu.models.trfold import featurize_from_sequence
    from protstruc_tpu.vocab import ressymb_to_resindex

    chains = sequence.upper().split(":")
    seq_idx = jnp.asarray(
        [[ressymb_to_resindex.get(c, 20) for ch in chains for c in ch]],
        jnp.int32)
    chain_idx = jnp.asarray(
        [[k for k, ch in enumerate(chains) for _ in ch]], jnp.int32)
    feats = featurize_from_sequence(seq_idx, chain_idx,
                                    n_dist_bins=model.trunk_cfg.n_dist_bins)
    nr = cfg.n_recycle if n_recycle is None else n_recycle
    out = model.apply({"params": params}, feats, n_recycle=nr)
    bb = out["xyz"][0]  # (L, 4, 3) N/CA/C/CB
    o = geom.ideal_carbonyl_oxygen(bb[:, 0], bb[:, 1], bb[:, 2],
                                   chain_idx=chain_idx[0])
    coords = jnp.stack([bb[:, 0], bb[:, 1], bb[:, 2], o, bb[:, 3]], axis=1)
    if not return_confidence:
        return coords
    return (coords, plddt_from_logits(out["plddt_logits"][0]),
            pae_from_logits(out["pae_logits"][0]))
