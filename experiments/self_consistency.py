"""Self-consistency evaluation of the generative stack (designability).

The standard falsifiability loop for backbone generators (Trippe et al.
2022, FrameDiff paper protocol, at toy scale):

    FrameDiff samples backbones
      -> InverseFold designs sequences for them
      -> a sequence-only FoldModel refolds the sequences
      -> scRMSD / scTM between the refold and the sampled backbone

All three models are trained here on fragments of one input structure
(CPU-friendly sizes — this measures that the *pipeline* is coherent and
gives honest absolute numbers for the committed table in
docs/guides/performance.md, not SOTA designability).  The refolder uses
``featurize_from_sequence`` + recycling: pass 1 sees sequence+relpos only,
pass 2 re-embeds the predicted CB distogram (AF2-style iterative
sequence -> structure).

Controls reported alongside: refolding the NATIVE fragment sequences
(upper bound — the refolder memorized these) and a random-sequence refold
(lower bound).

    python experiments/self_consistency.py [steps] [n_samples]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    # comma-separated inputs: more source structures -> more fragments ->
    # a generator that learns local protein geometry rather than one fold
    path = (sys.argv[3] if len(sys.argv) > 3
            else "tests/data/1REX.pdb,tests/data/4EOT.pdb,"
                 "tests/data/1ad0_DC.pdb,tests/data/6dc4.pdb")
    frag_len = 32

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import protstruc_tpu as ps
    from protstruc_tpu.models.framediff import (
        FrameDenoiser, FrameDiffConfig, framediff_loss, framediff_sample)
    from protstruc_tpu.models.inverse_fold import (
        InverseFold, InverseFoldConfig, ar_sample_sequence,
        featurize_backbone, if_ar_loss, random_decode_order)
    from protstruc_tpu.models.ipa import (
        FoldModel, IPAConfig, backbone_xyz_from_frames, fold_loss_fn,
        frames_from_backbone)
    from protstruc_tpu.models.trfold import (
        TrFoldConfig, featurize_for_model, featurize_from_sequence)
    from protstruc_tpu.ops.metrics import rmsd, tm_score
    from protstruc_tpu.vocab import AA

    t_start = time.perf_counter()
    log(f"backend: {jax.default_backend()}")

    # ------------------------------------------------------------- fragments
    frags, seqs = [], []
    for p in path.split(","):
        sb = ps.StructureBatch.from_pdb(p)
        xyz = np.asarray(sb.xyz[0, :, :4])
        seq_full = np.asarray(sb.get_seq_idx()[0])
        ok = np.isfinite(xyz[:, :3]).all((1, 2))
        i = 0
        while i + frag_len <= len(ok):
            if ok[i : i + frag_len].all():
                frags.append(xyz[i : i + frag_len])
                seqs.append(seq_full[i : i + frag_len])
                i += frag_len // 2
            else:
                i += 1
    frags = jnp.asarray(np.stack(frags))       # (n, L, 4, 3)
    seqs = jnp.asarray(np.stack(seqs))         # (n, L)
    n_frag = frags.shape[0]
    log(f"[data] {n_frag} fragments of {frag_len} residues")

    # ------------------------------------------------- 1. backbone generator
    big = "big" in sys.argv
    w = 2 if big else 1
    cfg = FrameDiffConfig(node_dim=48 * w, pair_dim=24 * w, n_heads=4,
                          n_iter=2 if big else 1, T=48)
    ca = frags[:, :, 1]
    center = ca.mean(axis=1, keepdims=True)
    x0 = (ca - center) / cfg.trans_scale
    r0, _ = frames_from_backbone(frags - center[:, :, None])
    fmask = jnp.ones(x0.shape[:2], bool)

    denoiser = FrameDenoiser(cfg)
    dparams = denoiser.init(jax.random.PRNGKey(0), r0, x0,
                            jnp.zeros((n_frag,)), fmask)["params"]
    dtx = optax.chain(optax.zero_nans(),
                         optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    dopt = dtx.init(dparams)

    @jax.jit
    def dstep(p, o, k):
        l, g = jax.value_and_grad(
            lambda q: framediff_loss(q, denoiser, k, r0, x0, fmask, cfg))(p)
        u, o = dtx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for i in range(steps):
        dparams, dopt, dl = dstep(dparams, dopt, jax.random.PRNGKey(100 + i))
    log(f"[framediff] {steps} steps, loss {float(dl):.3f}")

    # --------------------------------------------------- 2. sequence designer
    native = ps.StructureBatch.from_xyz(
        jnp.concatenate([frags, jnp.full(frags.shape[:2] + (11, 3), jnp.nan)],
                        axis=2))
    tf = featurize_backbone(native)
    tf["target_seq"] = seqs
    if_cfg = InverseFoldConfig(node_dim=48 * w, pair_dim=24 * w, n_heads=4,
                               n_blocks=2 if big else 1, n_decoder_blocks=1)
    if_model = InverseFold(if_cfg)
    rank = random_decode_order(jax.random.PRNGKey(1), seqs.shape)
    if_params = if_model.init(
        jax.random.PRNGKey(2), dict(tf, prev_seq=seqs, decode_rank=rank)
    )["params"]
    if_tx = optax.chain(optax.zero_nans(),
                         optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    if_opt = if_tx.init(if_params)

    @jax.jit
    def istep(p, o, k):
        l, g = jax.value_and_grad(lambda q: if_ar_loss(q, if_model, tf, k))(p)
        u, o = if_tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for i in range(steps):
        if_params, if_opt, il = istep(if_params, if_opt,
                                      jax.random.PRNGKey(200 + i))
    log(f"[inversefold] {steps} steps, CE {float(il):.3f}")

    # ------------------------------------------- 3. sequence-only refolder
    # ``refolder=<checkpoint_dir>`` swaps the toy fragment-trained refolder
    # for a production train.py checkpoint (e.g. the r4 generalization run's
    # sequence-only model) — VERDICT r3 item 9
    ext_ck = next((a.split("=", 1)[1] for a in sys.argv
                   if a.startswith("refolder=")), None)
    # refolder_step=best|<int>: which checkpoint of the production run to
    # refold with.  The r4b rerun showed the refolder choice dominates the
    # designability signal — the 12k-step sequence model (overfit to 11
    # full-length structures, held-out lDDT 0.23) refolds everything at
    # the floor, while less-overfit checkpoints discriminate.
    ext_step = next((a.split("=", 1)[1] for a in sys.argv
                     if a.startswith("refolder_step=")), None)
    if ext_step is not None and ext_step != "best":
        ext_step = int(ext_step)
    if ext_ck:
        import warnings

        from protstruc_tpu.train import load_fold_model

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            fold, fparams, fcfg = load_fold_model(ext_ck, step=ext_step)
        tcfg = fold.trunk_cfg
        log(f"[refolder] external checkpoint {ext_ck} "
            f"(step={ext_step if ext_step is not None else 'latest'}, "
            f"D={tcfg.node_dim} P={tcfg.pair_dim}, "
            f"sequence_only={fcfg.sequence_only})")
    else:
        tcfg = TrFoldConfig(node_dim=64 * w, pair_dim=32 * w, n_heads=4,
                            n_blocks=3 if big else 2)
        fold = FoldModel(trunk_cfg=tcfg,
                         ipa_cfg=IPAConfig(n_heads=4, n_iter=4), n_recycle=1)
        seq_feats = featurize_from_sequence(seqs, n_dist_bins=tcfg.n_dist_bins)
        target = featurize_for_model(native, fused=True,
                                     n_dist_bins=tcfg.n_dist_bins)
        fparams = fold.init(jax.random.PRNGKey(3), seq_feats)["params"]
        ftx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
        fopt = ftx.init(fparams)

        @jax.jit
        def fstep(p, o):
            l, g = jax.value_and_grad(
                lambda q: fold_loss_fn(q, fold, seq_feats, native.xyz,
                                       target_feats=target))(p)
            u, o = ftx.update(g, o, p)
            return optax.apply_updates(p, u), o, l

        for i in range(steps * 2):  # the refolder is the hardest model; 2x
            fparams, fopt, fl = fstep(fparams, fopt)
        log(f"[refolder] {steps * 2} steps, loss {float(fl):.3f}")

    @jax.jit
    def refold(seq_idx):
        f = featurize_from_sequence(seq_idx, n_dist_bins=tcfg.n_dist_bins)
        out = fold.apply({"params": fparams}, f, n_recycle=2)
        return out["xyz"]  # (B, L, 4, 3)

    def sc_metrics(seq_idx, ref_bb):
        """scRMSD / scTM of refolded CA vs a reference backbone's CA."""
        pred = refold(seq_idx)
        r = rmsd(pred[:, :, 1], ref_bb[:, :, 1], align=True)
        t = tm_score(pred[:, :, 1], ref_bb[:, :, 1], align=True,
                     l_target=jnp.full((seq_idx.shape[0],), float(frag_len)))
        return np.asarray(r), np.asarray(t)

    # control: native sequences vs native fragments (memorization bound)
    nat_r, nat_t = sc_metrics(seqs, frags)
    # control: random sequences (floor)
    rnd = jax.random.randint(jax.random.PRNGKey(9), seqs.shape, 0, 20)
    rnd_r, rnd_t = sc_metrics(rnd, frags)

    # ------------------------------------------------------- 4. the sc loop
    r_samp, x_samp = jax.jit(
        lambda p, k: framediff_sample(p, denoiser, k, (n_samples, frag_len),
                                      cfg)
    )(dparams, jax.random.PRNGKey(7))
    bb = backbone_xyz_from_frames(r_samp, x_samp * cfg.trans_scale)

    # 15-slot layout: N/CA/C in 0-2, ideal O in slot 3, generated CB in 4
    from protstruc_tpu import geometry as geom

    o = geom.ideal_carbonyl_oxygen(bb[:, :, 0], bb[:, :, 1], bb[:, :, 2])
    gen = ps.StructureBatch.from_xyz(
        jnp.concatenate(
            [bb[:, :, :3], o[:, :, None], bb[:, :, 3:4],
             jnp.full(bb.shape[:2] + (10, 3), jnp.nan)], axis=2))
    gf = featurize_backbone(gen)
    gf["target_seq"] = jnp.zeros(bb.shape[:2], jnp.int32)
    designed = ar_sample_sequence(if_params, if_model, gf,
                                  jax.random.PRNGKey(8), temperature=0.2)
    sc_r, sc_t = sc_metrics(designed, bb)

    recov = float((designed[:, None] == seqs[None]).mean())
    log(f"[design] mean naive seq overlap vs training frags: {recov:.2f}")

    dt = time.perf_counter() - t_start
    rows = [("native-seq control", nat_r, nat_t),
            ("designed (self-consistency)", sc_r, sc_t),
            ("random-seq floor", rnd_r, rnd_t)]
    for name, r, t in rows:
        log(f"[sc] {name:>28}: scRMSD {r.mean():.2f} A "
            f"(min {r.min():.2f}, max {r.max():.2f})  "
            f"scTM {t.mean():.3f} (max {t.max():.3f})")
    print('{"sc_rmsd_mean": %.3f, "sc_tm_mean": %.4f, '
          '"native_rmsd_mean": %.3f, "random_rmsd_mean": %.3f, '
          '"n_samples": %d, "seconds": %.0f}'
          % (sc_r.mean(), sc_t.mean(), nat_r.mean(), rnd_r.mean(),
             n_samples, dt))


if __name__ == "__main__":
    main()
