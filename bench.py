"""Benchmark harness: full geometric featurization throughput.

North-star metric (BASELINE.md): structures/sec of full geometric
featurization — trRosetta 6D inter-residue maps + backbone dihedrals +
orientation frames — at B=256, L=512, A=15 on one TPU chip.
Baseline target: >= 256 structures/s/chip (1 batch/s).

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "structures/s", "vs_baseline": N}

Run with the default environment (axon TPU). Extra diagnostics go to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

B, L, A = 256, 512, 15
BASELINE = 256.0  # structures/s north star
WARMUP, ITERS, ROUNDS = 2, 10, 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_inputs(key):
    kx, km = jax.random.split(key)
    xyz = jax.random.normal(kx, (B, L, A, 3), dtype=jnp.float32) * 10.0
    atom_mask = jnp.ones((B, L, A), dtype=bool)
    chain_idx = jnp.zeros((B, L), dtype=jnp.int32)
    return xyz, atom_mask, chain_idx


def featurize_jnp(xyz, atom_mask, chain_idx):
    from protstruc_tpu.batch import _backbone_dihedrals, _inter_residue_geometry
    from protstruc_tpu import geometry as geom

    g = _inter_residue_geometry(xyz, atom_mask)
    d, m = _backbone_dihedrals(xyz, chain_idx, atom_mask)
    frames = geom.gram_schmidt(xyz[:, :, 0], xyz[:, :, 1], xyz[:, :, 2])
    return g, d, m, frames


def featurize_pallas(xyz, atom_mask, chain_idx):
    from protstruc_tpu.batch import _backbone_dihedrals
    from protstruc_tpu.ops.pallas_pairwise import trrosetta_features
    from protstruc_tpu import geometry as geom

    g = trrosetta_features(xyz, atom_mask, interpret=jax.default_backend() != "tpu")
    d, m = _backbone_dihedrals(xyz, chain_idx, atom_mask)
    frames = geom.gram_schmidt(xyz[:, :, 0], xyz[:, :, 1], xyz[:, :, 2])
    return g, d, m, frames


def featurize_pallas_bf16(xyz, atom_mask, chain_idx):
    """bf16 map outputs: halves HBM write traffic (not parity-grade;
    reported to stderr only, never as the headline JSON)."""
    from protstruc_tpu.batch import _backbone_dihedrals
    from protstruc_tpu.ops.pallas_pairwise import pairwise_maps_pallas
    from protstruc_tpu.vocab import ATOM
    from protstruc_tpu import geometry as geom

    g = dict(pairwise_maps_pallas(
        xyz, interpret=jax.default_backend() != "tpu", out_dtype=jnp.bfloat16
    ))
    for key, (ai, aj) in {
        "d_ca_mask": ("CA", "CA"), "d_cb_mask": ("CB", "CB"), "d_no_mask": ("N", "O"),
    }.items():
        mi = atom_mask[:, :, int(ATOM[ai])]
        mj = atom_mask[:, :, int(ATOM[aj])]
        g[key] = mi[:, :, None] & mj[:, None, :]
    d, m = _backbone_dihedrals(xyz, chain_idx, atom_mask)
    frames = geom.gram_schmidt(xyz[:, :, 0], xyz[:, :, 1], xyz[:, :, 2])
    return g, d, m, frames


def time_variant(fn, args, name, rtt):
    """Time with a scalar-checksum fetch.

    Over the remote-TPU relay, ``block_until_ready`` does not reliably wait
    and bulk host transfers are tunnel-bound, so: the jitted function returns
    the full feature maps (forcing HBM materialization) PLUS a 4-byte
    checksum; we enqueue ITERS executions back-to-back and fetch only the
    last checksum.  total ~= ITERS * exec + RTT.
    """

    @jax.jit
    def with_checksum(*a):
        g, d, m, f = fn(*a)
        chk = (
            g["d_ca"][0, 0, 1]
            + g["omega"][-1, 5, 9]
            + g["phi"][1, 3, 4]
            + d[0, 1, 0]
            + f[0, 0, 0, 0]
        )
        return g, d, m, f, chk

    t0 = time.perf_counter()
    out = with_checksum(*args)
    float(out[-1])
    log(f"[{name}] first call (compile+run): {time.perf_counter() - t0:.2f}s")

    for _ in range(WARMUP):
        float(with_checksum(*args)[-1])

    # best-of-ROUNDS: the relay adds sporadic multi-ms stalls; min-of-N is
    # the standard way to see through scheduler/tunnel noise
    best_dt = None
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = with_checksum(*args)
        float(out[-1])  # one small fetch drains the queue
        total = time.perf_counter() - t0
        dt = max(total - rtt, 1e-9) / ITERS
        if best_dt is None or dt < best_dt:
            best_dt = dt
    sps = B / best_dt
    log(f"[{name}] {best_dt*1e3:.1f} ms/batch -> {sps:.0f} structures/s "
        f"(best of {ROUNDS}x{ITERS}, rtt {rtt*1e3:.0f} ms)")
    return sps


def parity_check(rtt):
    """On-TPU kernel parity gate, run before every timing (VERDICT r1 item 2).

    Every unit test runs the kernel with interpret=True on CPU, so the bench
    is where Mosaic lowering gets certified.  Two tiers on a small batch,
    scalar-only fetches:

    1. Mosaic vs interpret-mode kernel (identical formulation, only the
       lowering differs): max|Δ| ≤ 1e-5 per map — the Mosaic-drift detector.
    2. Kernel vs the jnp-fused oracle, split by map class (the documented
       waiver in BASELINE.md): **distance maps ≤ 1e-5** (identical
       norm-of-difference formulation — no excuse for drift), **angle maps
       ≤ 2e-4** (tests/test_pallas_pairwise.py:25) — on random coordinates
       the arccos-form jnp path is itself only ~2e-5-accurate near
       degenerate angles, so 1e-5 is not achievable *between formulations*;
       the ≤1e-5 BASELINE bar is vs the reference on bundled PDBs
       (tests/test_parity_reference.py, CPU).

    NaN sets must match exactly and masks must be bitwise-equal in both
    tiers.  Aborts the bench loudly on any violation.
    """
    from protstruc_tpu.batch import _inter_residue_geometry
    from protstruc_tpu.ops.pallas_pairwise import trrosetta_features

    on_tpu = jax.default_backend() == "tpu"
    kx = jax.random.PRNGKey(7)
    xyz = jax.random.normal(kx, (2, 128, 15, 3), dtype=jnp.float32) * 8.0
    atom_mask = jnp.ones((2, 128, 15), dtype=bool)

    def _diffs(ref, ker):
        out = {}
        for k in ["d_ca", "d_cb", "d_no", "omega", "theta", "phi"]:
            a, b = ref[k], ker[k]
            both_nan = jnp.isnan(a) & jnp.isnan(b)
            d = jnp.where(both_nan, 0.0, jnp.abs(a - b))
            out[k] = (
                jnp.max(jnp.nan_to_num(d, nan=jnp.inf)),
                jnp.sum(jnp.isnan(a) != jnp.isnan(b)).astype(jnp.float32),
            )
        for k in ["d_ca_mask", "d_cb_mask", "d_no_mask"]:
            out[k] = (jnp.sum(ref[k] != ker[k]).astype(jnp.float32),
                      jnp.zeros((), jnp.float32))
        return out

    @jax.jit
    def tiers(xyz, am):
        ker = trrosetta_features(xyz, am, interpret=not on_tpu)
        vs_jnp = _diffs(_inter_residue_geometry(xyz, am), ker)
        vs_interp = None
        if on_tpu:  # trace-time constant: compare lowered vs interpret kernel
            interp = trrosetta_features(xyz, am, interpret=True)
            vs_interp = _diffs(interp, ker)
        return vs_jnp, vs_interp

    dist_maps = ("d_ca", "d_cb", "d_no", "d_ca_mask", "d_cb_mask", "d_no_mask")
    vs_jnp, vs_interp = tiers(xyz, atom_mask)
    for name, res, tol_fn in [
        ("mosaic-vs-interpret", vs_interp, lambda k: 1e-5),
        # BASELINE.md waiver: angle maps 2e-4 (formulation difference),
        # distance maps pinned to the global 1e-5 bar
        ("kernel-vs-jnp", vs_jnp,
         lambda k: 1e-5 if k in dist_maps else 2e-4),
    ]:
        if res is None:
            log(f"[parity] {name}: skipped (backend={jax.default_backend()})")
            continue
        res = {k: (float(v[0]), float(v[1])) for k, v in res.items()}
        worst = max(v[0] for v in res.values())
        bad = {k: v for k, v in res.items()
               if v[0] > tol_fn(k) or v[1] != 0}
        log(f"[parity] {name}: max|d| = {worst:.2e} "
            f"(tol dist 1e-05 / angle {tol_fn('omega'):.0e}) "
            + " ".join(f"{k}={v[0]:.1e}" for k, v in res.items()))
        if bad:
            raise SystemExit(f"PARITY FAILURE ({name}): {bad}")


def model_parity_check(rtt):
    """On-TPU parity gate for the fused model-featurization kernel.

    ``model_features_pallas`` is *the* training-ingest path
    (``featurize_for_model(fused=True)``) and the fastest number this bench
    quotes, so its Mosaic lowering gets certified every run (VERDICT r2
    item 2).  Three tiers, scalar-only fetches:

    1. f32-mode kernel vs the jnp oracle: ``bins`` int-equal away from bin
       edges (float reassociation may legitimately flip a bin whose distance
       sits within 1e-3 of an edge), sincos planes <= 2e-4 off-diagonal
       (same formulation bound as the raw-map gate), and the degenerate
       diagonal pinned to its documented convention [0, 1, 0, 1, 0, 0].
    2. f32 Mosaic vs interpret: bins int-equal, sincos <= 1e-5.
    3. bf16 production mode Mosaic vs interpret: bitwise equal.
    """
    from protstruc_tpu.ops.histogram import distogram_bins
    from protstruc_tpu.ops.pallas_pairwise import _maps_jnp, model_features_pallas

    on_tpu = jax.default_backend() == "tpu"
    n_bins, max_dist = 36, 20.0
    xyz = jax.random.normal(jax.random.PRNGKey(11), (2, 128, 15, 3),
                            dtype=jnp.float32) * 8.0

    @jax.jit
    def tiers(xyz):
        g = _maps_jnp(xyz)
        bins_ref = distogram_bins(g["d_cb"], n_bins, max_dist)
        ang_ref = jnp.stack(
            [jnp.sin(g["omega"]), jnp.cos(g["omega"]),
             jnp.sin(g["theta"]), jnp.cos(g["theta"]),
             jnp.sin(g["phi"]), jnp.cos(g["phi"])], axis=1)

        bins, ang = model_features_pallas(
            xyz, n_bins=n_bins, max_dist=max_dist, interpret=not on_tpu,
            ang_dtype=jnp.float32)

        L = xyz.shape[1]
        eye = jnp.eye(L, dtype=bool)[None]
        # bins: distance of each pair to its nearest bin edge
        edge_frac = g["d_cb"] / max_dist * n_bins
        near_edge = jnp.abs(edge_frac - jnp.round(edge_frac)) < 1e-3
        bins_bad = jnp.sum((bins != bins_ref) & ~near_edge)
        ang_off = jnp.max(jnp.where(eye[:, None], 0.0, jnp.abs(ang - ang_ref)))
        diag_conv = jnp.asarray([0.0, 1.0, 0.0, 1.0, 0.0, 0.0])
        diag_bad = jnp.max(jnp.abs(
            jnp.where(eye[:, None], ang, diag_conv[None, :, None, None])
            - diag_conv[None, :, None, None]))

        res = {"bins_mismatch": bins_bad.astype(jnp.float32),
               "ang_vs_jnp": ang_off, "diag_convention": diag_bad}

        if on_tpu:  # trace-time constant
            bins_i, ang_i = model_features_pallas(
                xyz, n_bins=n_bins, max_dist=max_dist, interpret=True,
                ang_dtype=jnp.float32)
            res["mosaic_bins_mismatch"] = jnp.sum(bins != bins_i).astype(
                jnp.float32)
            res["mosaic_ang"] = jnp.max(jnp.abs(ang - ang_i))
            bb, ab = model_features_pallas(
                xyz, n_bins=n_bins, max_dist=max_dist, interpret=False)
            bi, ai = model_features_pallas(
                xyz, n_bins=n_bins, max_dist=max_dist, interpret=True)
            res["bf16_bits_mismatch"] = (
                jnp.sum(bb != bi) + jnp.sum(ab != ai)).astype(jnp.float32)
        return res

    res = {k: float(v) for k, v in tiers(xyz).items()}
    tol = {"bins_mismatch": 0.0, "ang_vs_jnp": 2e-4, "diag_convention": 0.0,
           "mosaic_bins_mismatch": 0.0, "mosaic_ang": 1e-5,
           "bf16_bits_mismatch": 0.0}
    bad = {k: v for k, v in res.items() if v > tol[k]}
    log("[parity] model-features: "
        + " ".join(f"{k}={v:.1e}" for k, v in res.items()))
    if bad:
        raise SystemExit(f"PARITY FAILURE (model-features): {bad}")


def run_ingest():
    """PDB ingest throughput: python scanner vs the C++ fast path.

    Host-side parse of every bundled PDB (the reference's ingest hot loop is
    the per-atom Python scatter, pdb.py:140-151; ours is a vectorized
    byte-buffer scan with an optional native scanner).  stderr diagnostic so
    regressions are visible round-over-round (VERDICT r2 item 7).
    """
    import glob
    import os

    from protstruc_tpu.pdbio import native
    from protstruc_tpu.pdbio.parser import parse_pdb

    files = sorted(glob.glob("tests/data/*.pdb"))
    total_mb = sum(os.path.getsize(f) for f in files) / 1e6
    variants = [("python", False)]
    if native.native_available():
        variants.append(("native", True))
    for name, use_native in variants:
        for f in files:  # warm the page cache / lazy imports
            parse_pdb(f, use_native=use_native)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            for f in files:
                parse_pdb(f, use_native=use_native)
        dt = (time.perf_counter() - t0) / reps
        log(f"[ingest] {name}: {len(files)} PDBs ({total_mb:.1f} MB) in "
            f"{dt*1e3:.0f} ms -> {len(files)/dt:.0f} structures/s, "
            f"{total_mb/dt:.0f} MB/s")


def run_mfu(rtt):
    """[mfu] pinned train-step efficiency lines (VERDICT r3 items 2-3).

    One bf16 TrFold train step (value_and_grad + adamw update) per pinned
    config; FLOPs from XLA's own cost analysis of the compiled step;
    reported as achieved TFLOP/s and % of the v5e bf16 MXU peak
    (197 TFLOP/s).  Two points of the MFU-vs-width curve
    (docs/guides/performance.md) are certified round-over-round: the
    small [mfu] config tracked since r3, and a wide production config
    [mfu-peak] (triangle pair updates + remat_policy=tri_dots) that pins
    the >50%-of-peak regime in the driver artifact.
    """
    _mfu_point("mfu", dict(node_dim=256, pair_dim=128, n_heads=8,
                           n_blocks=4), B=4, L=512, rtt=rtt)
    # the same width on the PRODUCTION path (triangle pair updates + the
    # fused Pallas triangle kernels + remat).  XLA cost analysis cannot
    # count FLOPs inside Pallas kernels, so the FLOP numerator comes from
    # compiling (never running) the identical-math unfused variant — the
    # printed pct-of-peak is true MFU (docs/guides/performance.md
    # "Fused triangle-multiplication kernels")
    try:
        _mfu_point("mfu-fused", dict(node_dim=256, pair_dim=128, n_heads=8,
                                     n_blocks=4, pair_update="triangle",
                                     remat=True, fused_tri=True),
                   B=4, L=512, rtt=rtt,
                   flops_cfg_kwargs=dict(node_dim=256, pair_dim=128,
                                         n_heads=8, n_blocks=4,
                                         pair_update="triangle", remat=True,
                                         fused_tri=False))
    except Exception as e:
        log(f"[mfu-fused] FAILED: {type(e).__name__}: {e}")
    try:
        _mfu_point("mfu-peak", dict(node_dim=2048, pair_dim=1024, n_heads=8,
                                    n_blocks=3, pair_update="triangle",
                                    remat=True, remat_policy="tri_dots"),
                   B=2, L=256, rtt=rtt, iters=4)
    except Exception as e:
        log(f"[mfu-peak] FAILED: {type(e).__name__}: {e}")


def _mfu_point(label, cfg_kwargs, B, L, rtt, iters=8, flops_cfg_kwargs=None):
    import numpy as np
    import optax

    import protstruc_tpu as ps
    from protstruc_tpu.models.trfold import (
        TrFold, TrFoldConfig, featurize_for_model, loss_fn, make_train_state)

    PEAK_BF16 = 197e12
    Bm, Lm = B, L
    cfg = TrFoldConfig(dtype=jnp.bfloat16, **cfg_kwargs)
    model = TrFold(cfg)

    rng = np.random.RandomState(0)
    sb = ps.StructureBatch.from_xyz(
        rng.randn(Bm, Lm, 15, 3).astype(np.float32) * 5.0)
    feats = featurize_for_model(sb)
    params, opt_state, tx = make_train_state(model, feats,
                                             jax.random.PRNGKey(0))

    def make_step(m):
        def step(params, opt_state, feats):
            loss, grads = jax.value_and_grad(loss_fn)(params, m, feats)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        return step

    jstep = jax.jit(make_step(model), donate_argnums=(0, 1))
    compiled = jstep.lower(params, opt_state, feats).compile()
    try:
        if flops_cfg_kwargs is not None:
            # Pallas kernels are opaque to XLA cost analysis: take the FLOP
            # numerator from the identical-math variant (same param tree),
            # compiled but never executed, so pct-of-peak is true MFU.
            fmodel = TrFold(TrFoldConfig(dtype=jnp.bfloat16,
                                         **flops_cfg_kwargs))
            fcompiled = jax.jit(make_step(fmodel)).lower(
                params, opt_state, feats).compile()
            flops = float(fcompiled.cost_analysis()["flops"])
        else:
            flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")

    params, opt_state, loss = jstep(params, opt_state, feats)
    float(loss)  # compile+first step done
    for _ in range(2):
        params, opt_state, loss = jstep(params, opt_state, feats)
    float(loss)
    # min of 2 timed rounds: a relay stall (tunnel RTT swings of ms,
    # docs/guides/performance.md) must not land in the round-over-round
    # MFU line the driver artifact certifies
    dt = float("inf")
    for _round in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = jstep(params, opt_state, feats)
        float(loss)
        dt = min(dt, max(time.perf_counter() - t0 - rtt, 1e-9) / iters)
    log(f"[{label}] TrFold bf16 D={cfg.node_dim} P={cfg.pair_dim} "
        f"blocks={cfg.n_blocks} B={Bm} L={Lm}: {dt*1e3:.1f} ms/step, "
        f"{flops/1e9:.1f} GFLOP -> {flops/dt/1e12:.2f} TFLOP/s = "
        f"{100*flops/dt/PEAK_BF16:.1f}% of bf16 peak")


def run_pallas_bwd(rtt):
    """[pallas-bwd] fused Pallas backward for the six pair maps vs the jnp
    VJP replay (VERDICT r4 item 3).

    Parity gate first (rel <= 2e-5 vs the jnp VJP: both f32 legs sit ~1e-5
    from f64 ground truth — measured on v5e, the Mosaic kernel at 5.4e-6 is
    CLOSER to truth than the on-chip jnp VJP at 1.04e-5; the 1.6e-5
    leg-to-leg gap is two valid f32 roundings diverging, documented in
    ops/pallas_pairwise._maps_bwd_pallas), including a degenerate batch
    (duplicated residues + glycine-like CB==CA) that must stay finite.
    Then the timing A/B at the north-star shape.
    """
    import numpy as np

    from protstruc_tpu.ops import pallas_pairwise as pp
    from protstruc_tpu.vocab import ATOM

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(2, 192, 15, 3).astype("float32") * 5)
    g = {k: jnp.asarray(rng.randn(2, 192, 192).astype("float32"))
         for k in pp._MAP_NAMES}
    _, jvjp = jax.vjp(pp._maps_jnp, xyz)
    want = np.asarray(jvjp(g)[0])
    got = np.asarray(pp._maps_bwd_pallas(xyz, g, 128, 256, interp))
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1.0)

    xyz2 = np.asarray(xyz).copy()
    xyz2[:, ::3, int(ATOM.CB)] = xyz2[:, ::3, int(ATOM.CA)]
    xyz2[:, 7] = xyz2[:, 3]
    _, jvjp2 = jax.vjp(pp._maps_jnp, jnp.asarray(xyz2))
    want2 = np.asarray(jvjp2(g)[0])
    got2 = np.asarray(pp._maps_bwd_pallas(jnp.asarray(xyz2), g, 128, 256,
                                          interp))
    assert np.isfinite(got2).all(), "non-finite degenerate gradients"
    err2 = np.abs(got2 - want2).max() / max(np.abs(want2).max(), 1.0)
    log(f"[pallas-bwd] parity vs jnp VJP: rel {err:.1e} "
        f"(degenerate batch {err2:.1e})")
    if max(err, err2) > 2e-5:
        raise SystemExit(f"PARITY FAILURE (pallas-bwd): {err:.2e}/{err2:.2e}")

    kx, kg = jax.random.split(jax.random.PRNGKey(0))
    xyzb = jax.random.normal(kx, (B, L, A, 3)) * 10.0
    gk = jax.random.split(kg, 6)
    gb = {k: jax.random.normal(gk[i], (B, L, L))
          for i, k in enumerate(pp._MAP_NAMES)}

    @jax.jit
    def fwd(x):
        d = pp.pairwise_maps_pallas(x, interpret=interp)
        return d, d["d_cb"][0, 0, 1] + d["omega"][1, 2, 3]

    @jax.jit
    def bwd_pallas(x, gg):
        d = pp._maps_bwd_pallas(x, gg, 128, 256, interp)
        return d, d[0, 0, 1, 0]

    @jax.jit
    def bwd_jnp(x, gg):
        _, vjp = jax.vjp(pp._maps_jnp, x)
        d = vjp(dict(gg))[0]
        return d, d[0, 0, 1, 0]

    t_f = _time_call(fwd, xyzb, rtt=rtt)
    t_bp = _time_call(bwd_pallas, xyzb, gb, rtt=rtt)
    t_bj = _time_call(bwd_jnp, xyzb, gb, rtt=rtt)
    log(f"[pallas-bwd] B={B} L={L}: fwd {t_f*1e3:.1f} ms, "
        f"bwd pallas {t_bp*1e3:.1f} ms ({t_bp/t_f:.2f}x fwd), "
        f"bwd jnp {t_bj*1e3:.1f} ms -> {t_bj/t_bp:.2f}x speedup")


def run_attn(rtt):
    """[attn] fused flash pair-bias attention vs the jnp path (fwd+bwd).

    The trunk's node attention at production head dims (dh = 32) is
    HBM-bound: the jnp path writes + reads the (B, H, L, L) logits and
    probabilities; the flash kernel (ops/flash_attn.py) keeps the online
    softmax in VMEM.  Pinned op-level A/B: fwd+bwd of a scalar loss
    through the attention op, bf16 inputs, B=1 H=8 dh=32 L=4096.

    Timing: these ops are sub-ms while the relay RTT is ~36 ms, so each
    measurement jits a lax.fori_loop CHAINING n steps (grads perturb the
    next iterate — XLA can't elide or overlap) and differences two inner
    counts; the constant dispatch/RTT/fetch cost cancels exactly
    (experiments/attn_sweep.py is the full tile sweep with this method).
    """
    import time as _time

    from protstruc_tpu.ops.flash_attn import (
        flash_pair_bias_attention, pair_bias_attention_reference)

    B, L, H, dh = 1, 4096, 8, 32
    n1, n2 = 4, 16
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (B, L, H, dh), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, L, H, dh), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, L, H, dh), jnp.bfloat16)
    bias = jax.random.normal(ks[3], (B, H, L, L), jnp.bfloat16)
    kmask = jnp.ones((B, L), bool).at[:, -100:].set(False)

    def chained(attn, n):
        def loss(q, k, v, bias):
            o = attn(q, k, v, bias, kmask)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        @jax.jit
        def run(q, k, v, bias):
            def body(_, carry):
                q, k, v, bias = carry
                g = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
                eps = jnp.asarray(1e-6, q.dtype)
                return (q + eps * g[0].astype(q.dtype),
                        k + eps * g[1].astype(k.dtype),
                        v + eps * g[2].astype(v.dtype),
                        bias + eps * g[3].astype(bias.dtype))

            q2, _, _, _ = jax.lax.fori_loop(0, n, body, (q, k, v, bias))
            return jnp.sum(q2.astype(jnp.float32))

        return run

    def wall(fn):
        float(fn(q, k, v, bias))  # compile + settle
        best = float("inf")
        for _ in range(3):
            t0 = _time.perf_counter()
            float(fn(q, k, v, bias))
            best = min(best, _time.perf_counter() - t0)
        return best

    results = {}
    for name, fn in (("jnp", pair_bias_attention_reference),
                     ("flash", flash_pair_bias_attention)):
        dt = (wall(chained(fn, n2)) - wall(chained(fn, n1))) / (n2 - n1)
        results[name] = dt
        log(f"[attn] {name}: B={B} H={H} dh={dh} L={L} bf16 fwd+bwd: "
            f"{dt*1e3:.2f} ms")
    if results.get("flash") and results.get("jnp"):
        log(f"[attn] flash speedup: {results['jnp']/results['flash']:.2f}x")


def run_long_l(rtt):
    """[config6] long-context wall (VERDICT r3 item 7): B=1, L=8192.

    The six-map output at L=8192 is 1.6 GB and the full-atom pair tensor
    (B,L,L,A,A) would be 60 TB — the kernel's map-subset mode emits only
    d_cb (268 MB).  Also times the sequence-parallel shard_map variant
    (rectangular kernel over the local row shard + all-gathered columns)
    on the 1-device mesh.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from protstruc_tpu.ops.pallas_pairwise import pairwise_maps_pallas
    from protstruc_tpu.parallel.mesh import make_mesh

    interp = jax.default_backend() != "tpu"
    L6 = 8192
    xyz = jax.random.normal(jax.random.PRNGKey(4), (1, L6, 15, 3),
                            jnp.float32) * 10.0

    @jax.jit
    def plain(xyz):
        d = pairwise_maps_pallas(xyz, interpret=interp, maps=("d_cb",))["d_cb"]
        return d, d[0, 0, 1]

    dt = _time_call(plain, xyz, rtt=rtt)
    log(f"[config6] B=1 L={L6} d_cb-only pallas: {dt*1e3:.1f} ms "
        f"-> {L6 * L6 / dt / 1e9:.2f} Gpair/s")

    mesh = make_mesh(1, axis_shapes=(1, 1, 1))

    def local(xyz_l):
        xyz_full = jax.lax.all_gather(xyz_l, "sp", axis=1, tiled=True)
        return pairwise_maps_pallas(
            xyz_l, interpret=interp, xyz_j=xyz_full, maps=("d_cb",))["d_cb"]

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=P(("dp", "tp"), "sp", None, None),
        out_specs=P(("dp", "tp"), "sp", None), check_vma=False)

    @jax.jit
    def sp_fn(xyz):
        d = sharded(xyz)
        return d, d[0, 0, 1]

    dt = _time_call(sp_fn, xyz, rtt=rtt)
    log(f"[config6] B=1 L={L6} d_cb-only sp-shard_map: {dt*1e3:.1f} ms")


def run_ingest_sustained():
    """[ingest-sustained] sustained host-ingest throughput (VERDICT r3
    item 8): the 14-file corpus looped 50x (politely cache-warm — that is
    the production steady state too) for python vs native scanners, plus
    the streaming dataset's bucket-dispatcher compile economy (unique
    jit shapes vs batches served).
    """
    import glob
    import os

    from protstruc_tpu.pdbio import native
    from protstruc_tpu.pdbio.parser import parse_pdb

    files = sorted(glob.glob("tests/data/*.pdb"))
    reps = 50
    total_mb = sum(os.path.getsize(f) for f in files) / 1e6
    variants = [("python", False)]
    if native.native_available():
        variants.append(("native", True))
    for name, use_native in variants:
        for f in files:
            parse_pdb(f, use_native=use_native)
        t0 = time.perf_counter()
        for _ in range(reps):
            for f in files:
                parse_pdb(f, use_native=use_native)
        dt = time.perf_counter() - t0
        n = reps * len(files)
        log(f"[ingest-sustained] {name}: {n} parses ({total_mb * reps:.0f} MB)"
            f" in {dt:.1f} s -> {n / dt:.0f} structures/s, "
            f"{total_mb * reps / dt:.0f} MB/s")

    # bucket-dispatcher economy: how many distinct (batch, bucket) shapes
    # the jitted consumer would compile for vs batches served.  Run twice:
    # cold (parsed-structure cache empty) and warm (the epoch-2+ steady
    # state, where assembly is pad-and-stack-bound — VERDICT r4 item 5).
    from protstruc_tpu.pdbio.dataset import (
        StructureDataset, clear_parsed_cache, parsed_cache_stats)

    clear_parsed_cache()
    for lane in ("cold", "warm"):
        ds = StructureDataset(files * 10, batch_size=4, shuffle=False)
        shapes, batches = set(), 0
        t0 = time.perf_counter()
        for batch in ds:
            shapes.add((batch.batch_size, batch.n_residues))
            batches += 1
        dt = time.perf_counter() - t0
        cs = parsed_cache_stats()
        log(f"[ingest-sustained] dataset {lane}: {batches} batches in "
            f"{dt:.1f} s ({batches * 4 / dt:.0f} structures/s), "
            f"{len(shapes)} unique jit shapes -> dispatcher hit rate "
            f"{100 * (1 - len(shapes) / max(batches, 1)):.0f}%, "
            f"parse-cache hit rate {100 * cs['hit_rate']:.0f}% "
            f"({cs['entries']} entries, {cs['bytes'] / 1e6:.0f} MB)")


def measure_rtt():
    @jax.jit
    def tiny(x):
        return jnp.sum(x[:2, :2, 0, 0])

    x = jnp.ones((4, 4, 1, 1))
    float(tiny(x))
    vals = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(tiny(x))
        vals.append(time.perf_counter() - t0)
    rtt = min(vals)
    log(f"tunnel RTT: {rtt*1e3:.1f} ms")
    return rtt


def _time_call(fn, *args, iters=3, rtt=0.0):
    """Time a jitted fn returning (outputs..., scalar checksum)."""
    out = fn(*args)
    float(out[-1])
    for _ in range(1):
        float(fn(*args)[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out[-1])
    return max(time.perf_counter() - t0 - rtt, 1e-9) / iters


def run_configs(rtt):
    """The five BASELINE.md config workloads (diagnostics, stderr only)."""
    import numpy as np

    import protstruc_tpu as ps
    from protstruc_tpu.ops.diffusion import cosine_variance_schedule, diffusion_trajectory
    from protstruc_tpu.ops.nerf import backbone_from_dihedrals
    from protstruc_tpu.utils.buckets import pad_batch_to_bucket

    data = "tests/data"

    # 1. single antibody PDB: CA-CA distmat + backbone dihedrals
    sb = ps.StructureBatch.from_pdb(f"{data}/15c8_HL.pdb")

    @jax.jit
    def cfg1(xyz, am, ci):
        from protstruc_tpu.batch import _backbone_dihedrals
        from protstruc_tpu.ops.pairwise import pairwise_atom_distance

        d, m = pairwise_atom_distance(xyz, am, "CA", "CA")
        dih, dm = _backbone_dihedrals(xyz, ci, am)
        return d, m, dih, dm, d[0, 0, 1] + dih[0, 1, 0]

    dt = _time_call(cfg1, sb.xyz, sb.atom_mask, sb.chain_idx, rtt=rtt)
    log(f"[config1] 15c8 CA distmat+dihedrals: {dt*1e3:.2f} ms")

    # 2. batch of 8 PDBs: full-atom distmat + masks + orientations/translations
    files = ["15c8_HL.pdb", "1a3r_HL.pdb", "1a6v_HL.pdb", "1a6v_JN.pdb",
             "1ad0_DC.pdb", "5cjx_HL.pdb", "6dc4.pdb", "1REX.pdb"]
    sb8 = pad_batch_to_bucket(ps.StructureBatch.from_pdb([f"{data}/{f}" for f in files]))

    @jax.jit
    def cfg2(xyz, am):
        from protstruc_tpu import geometry as geom
        from protstruc_tpu.ops.pairwise import full_pairwise_distance_matrix

        d, m = full_pairwise_distance_matrix(xyz, am)
        r = geom.gram_schmidt(xyz[:, :, 0], xyz[:, :, 1], xyz[:, :, 2])
        t = xyz[:, :, 1]
        return d, m, r, t, jnp.nan_to_num(d[0, 0, 1, 1, 1], nan=0.0) + r[0, 0, 0, 0]

    dt = _time_call(cfg2, sb8.xyz, sb8.atom_mask, rtt=rtt)
    log(f"[config2] 8-PDB full-atom distmat (B=8, L={sb8.n_residues}): {dt*1e3:.2f} ms")

    # 3. AntibodyStructureBatch B=64: pair dihedrals/planar + chain masking
    ab = ps.AntibodyStructureBatch.from_pdb(
        [f"{data}/6dc4.pdb"] * 8, heavy_chain_id=["H"] * 8, light_chain_id=["L"] * 8
    )
    ab = pad_batch_to_bucket(ab)
    rep = 64 // 8
    xyz64 = jnp.tile(ab.xyz, (rep, 1, 1, 1))
    am64 = jnp.tile(ab.atom_mask, (rep, 1, 1))
    hmask = jnp.tile(ab.get_heavy_chain_mask(), (rep, 1))

    @jax.jit
    def cfg3(xyz, am, h):
        from protstruc_tpu.ops.pairwise import (
            pairwise_dihedral_maps, pairwise_planar_angle_maps)

        omega = pairwise_dihedral_maps(xyz, ("CA", "CB"), ("CA", "CB"))
        theta = pairwise_dihedral_maps(xyz, ("N", "CA", "CB"), ("CB",))
        phi = pairwise_planar_angle_maps(xyz, ("CA", "CB"), ("CB",))
        pairm = h[:, :, None] & h[:, None, :]
        return omega, theta, phi, pairm, jnp.nan_to_num(omega[0, 1, 2], nan=0.0)

    dt = _time_call(cfg3, xyz64, am64, hmask, rtt=rtt)
    log(f"[config3] antibody B=64 pair dihedrals+masks: {dt*1e3:.2f} ms "
        f"-> {64/dt:.0f} structures/s")

    # 4. diffusion loop B=256, T=300 cosine schedule on a REAL PDB batch:
    # standardize + diffuse_xyz under lax.scan, all on-device (BASELINE.md
    # config 4: "standardize + diffuse_xyz under lax.scan")
    from protstruc_tpu.batch import _standardize

    key = jax.random.PRNGKey(1)
    rep4 = 256 // sb8.batch_size
    xyz4_in = jnp.tile(jnp.nan_to_num(sb8.xyz, nan=0.0), (rep4, 1, 1, 1))
    am4 = jnp.tile(sb8.atom_mask, (rep4, 1, 1))
    betas = cosine_variance_schedule(300)

    @jax.jit
    def cfg4(xyz, am, key):
        std_xyz, mu, std = _standardize(xyz, am)
        out = diffusion_trajectory(std_xyz, key, betas)
        return out, out[0, 0, 0, 0] + mu[0, 0]

    dt = _time_call(cfg4, xyz4_in, am4, key, rtt=rtt)
    log(f"[config4] standardize+diffuse B=256 (8 PDBs x{rep4}, L={sb8.n_residues}) "
        f"T=300: {dt*1e3:.2f} ms ({dt/300*1e6:.1f} us/step)")

    # 5. B=1024 x L=1024 full-atom (A=15): frame reconstruction from torsions
    # -> bucketed A=15 tensor -> actual-CB d_cb map via the Pallas kernel.
    # (The six-map output at this size exceeds HBM — d_cb alone is 4.3 GB —
    # so the kernel's map-subset mode emits only d_cb.)
    from protstruc_tpu.ops.pallas_pairwise import pairwise_maps_pallas
    from protstruc_tpu.utils.buckets import bucket_length

    L5 = bucket_length(1024)  # 1024 is itself a bucket boundary
    big_tor = jax.random.uniform(key, (1024, L5, 3), minval=-3.1, maxval=3.1)

    @jax.jit
    def cfg5(tor):
        xyz4 = backbone_from_dihedrals(tor)  # (B, L, 4, 3) N/CA/C/O
        n, ca, c = xyz4[:, :, 0], xyz4[:, :, 1], xyz4[:, :, 2]
        # actual CB from the folded backbone (AlphaFold literal combination,
        # reference geometry.py:221)
        b_v, c_v = ca - n, c - ca
        a_v = jnp.cross(b_v, c_v)
        cb = -0.58273431 * a_v + 0.56802827 * b_v - 0.54067466 * c_v + ca
        # full-atom A=15 layout: slots N/CA/C/O/CB, remaining sidechain
        # slots zero (bucketed padding)
        xyz15 = jnp.zeros(tor.shape[:2] + (15, 3), jnp.float32)
        xyz15 = xyz15.at[:, :, :4].set(xyz4).at[:, :, 4].set(cb)
        d_cb = pairwise_maps_pallas(
            xyz15, interpret=jax.default_backend() != "tpu", maps=("d_cb",)
        )["d_cb"]
        return xyz15, d_cb, d_cb[0, 0, 1]

    dt = _time_call(cfg5, big_tor, rtt=rtt)
    log(f"[config5] B=1024 L={L5} A=15 fold+pallas d_cb: {dt*1e3:.2f} ms "
        f"-> {1024/dt:.0f} structures/s")


def run_model_fused_diag(rtt):
    """Time the fused model-featurization kernel (bins + angle sincos).

    Not the headline (different outputs — it's the training-ingest fast
    path: 16 B/pair vs the raw maps' 24 B/pair, no atan2, no second
    sin/cos pass); stderr diagnostic only.
    """
    from protstruc_tpu.ops.pallas_pairwise import model_features_pallas

    xyz, _, _ = make_inputs(jax.random.PRNGKey(0))
    interp = jax.default_backend() != "tpu"

    @jax.jit
    def fn(xyz):
        bins, ang = model_features_pallas(xyz, interpret=interp)
        return bins, ang, ang[0, 0, 0, 1].astype(jnp.float32) + bins[0, 0, 1]

    dt = _time_call(fn, xyz, rtt=rtt)
    log(f"[model-fused] bins+sincos featurization: {dt*1e3:.1f} ms/batch "
        f"-> {B/dt:.0f} structures/s")


def run_sharded_diag(rtt):
    """Time the sequence-parallel shard_map+Pallas path on the live backend.

    On the single real chip this runs the rectangular-kernel shard_map path
    (xyz_j = all-gathered full axis) on a 1-device (dp,sp,tp)=(1,1,1) mesh —
    on-hardware evidence that the sp-sharded kernel compiles and performs
    (VERDICT r1 item 4); multi-device behavior is covered by the CPU-mesh
    tests and the driver's dryrun.
    """
    from protstruc_tpu.parallel.mesh import make_mesh, _pair_maps_shardmap

    mesh = make_mesh(1, axis_shapes=(1, 1, 1))
    fn = _pair_maps_shardmap(mesh)
    xyz, atom_mask, _ = make_inputs(jax.random.PRNGKey(0))

    def wrapped(xyz, am):
        g = fn(xyz, am)
        return g, g["d_cb"][0, 0, 1] + g["omega"][-1, 5, 9]

    jfn = jax.jit(wrapped)
    dt = _time_call(jfn, xyz, atom_mask, rtt=rtt)
    log(f"[sp-shard] shard_map pallas pair maps, 1-device mesh: "
        f"{dt*1e3:.1f} ms/batch -> {B/dt:.0f} structures/s")


def run_smoke(rtt):
    """On-TPU functional smoke lane (VERDICT r2 item 5).

    The 334-test suite runs on CPU with interpret-mode kernels; this lane
    drives ~10 critical product paths against the LIVE backend so "works on
    my interpreter" regressions fail the bench.  Tiny shapes to bound remote
    compile time; any failure aborts loudly.
    """
    import tempfile

    import numpy as np
    import optax

    import protstruc_tpu as ps
    from protstruc_tpu.models.ipa import FoldModel, IPAConfig, fold_loss_fn
    from protstruc_tpu.models.trfold import (
        TrFold, TrFoldConfig, featurize_for_model, train_step)
    from protstruc_tpu.ops.pallas_pairwise import pairwise_maps

    failures = []

    def stage(name):
        def deco(fn):
            t0 = time.perf_counter()
            try:
                fn()
                log(f"[smoke] {name}: ok ({time.perf_counter() - t0:.1f}s)")
            except Exception as e:
                failures.append(name)
                log(f"[smoke] {name}: FAILED {type(e).__name__}: {e}")
            return fn
        return deco

    sb = ps.StructureBatch.from_pdb("tests/data/15c8_HL.pdb")

    @stage("featurize-real-pdb")
    def _():
        g = sb.inter_residue_geometry(use_pallas=True)
        d, m = sb.backbone_dihedrals()
        assert np.isfinite(float(jnp.nansum(g["d_cb"]))), "d_cb all-NaN"
        assert np.isfinite(float(jnp.nansum(d)))

    @stage("pallas-backward")
    def _():
        xyz = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 15, 3)) * 8.0

        interp = jax.default_backend() != "tpu"

        @jax.jit
        def loss(x):
            g = dict(pairwise_maps(x, interpret=interp))
            return jnp.nansum(g["d_cb"]) + jnp.nansum(g["omega"])

        gval = jax.grad(loss)(xyz)
        assert np.isfinite(np.asarray(gval)).all(), "NaN in kernel gradient"

    feats = featurize_for_model(sb, fused=True)
    tcfg = TrFoldConfig(node_dim=32, pair_dim=16, n_heads=2, n_blocks=1)

    @stage("trfold-train-3steps")
    def _():
        model = TrFold(tcfg)
        params = model.init(jax.random.PRNGKey(0), feats)["params"]
        tx = optax.adam(1e-3)
        opt = tx.init(params)
        step = jax.jit(lambda p, o, f: train_step(p, o, f, model, tx))
        losses = []
        for _ in range(3):
            params, opt, l = step(params, opt, feats)
            losses.append(float(l))
        assert all(np.isfinite(losses)), f"non-finite loss {losses}"
        assert losses[-1] < losses[0], f"loss not decreasing {losses}"

    @stage("foldmodel-train-3steps")
    def _():
        model = FoldModel(trunk_cfg=tcfg,
                          ipa_cfg=IPAConfig(n_heads=2, n_iter=2))
        params = model.init(jax.random.PRNGKey(0), feats)["params"]
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def fstep(p, o):
            l, g = jax.value_and_grad(fold_loss_fn)(p, model, feats, sb.xyz)
            u, o = tx.update(g, o, p)
            return optax.apply_updates(p, u), o, l

        losses = []
        for _ in range(3):
            params, opt, l = fstep(params, opt)
            losses.append(float(l))
        assert all(np.isfinite(losses)), f"non-finite loss {losses}"
        assert losses[-1] < losses[0], f"loss not decreasing {losses}"

    @stage("flash-attn-parity")
    def _():
        from protstruc_tpu.ops.flash_attn import (
            flash_pair_bias_attention, pair_bias_attention_reference)

        # compiled Mosaic path (interpret=None -> mosaic on-chip) vs jnp,
        # across head depths: the models pin dh=32 but wider heads (64/128)
        # must stay correct on chip too (tests only cover interpret mode).
        # The kernel pins HIGHEST matmul precision internally; the jnp
        # oracle must run at the same precision or the comparison measures
        # the DEFAULT-precision (bf16-mantissa) einsum error (~3e-3), not
        # the kernel (measured: fwd 3.0e-7 / dbias 1.4e-4 on v5e).
        for dh in (16, 64, 128):
            ks = jax.random.split(jax.random.PRNGKey(3), 4)
            q = jax.random.normal(ks[0], (1, 96, 2, dh))
            k = jax.random.normal(ks[1], (1, 96, 2, dh))
            v = jax.random.normal(ks[2], (1, 96, 2, dh))
            bias = jax.random.normal(ks[3], (1, 2, 96, 96))
            kmask = jnp.ones((1, 96), bool).at[0, -8:].set(False)
            with jax.default_matmul_precision("highest"):
                out = flash_pair_bias_attention(q, k, v, bias, kmask)
                ref = pair_bias_attention_reference(q, k, v, bias, kmask)
                err = float(jnp.abs(out - ref).max())
                assert err < 2e-5, f"flash fwd parity dh={dh} {err:.2e}"

                def loss(fn):
                    return lambda b: jnp.sum(jnp.sin(fn(q, k, v, b, kmask)))

                gf = jax.grad(loss(flash_pair_bias_attention))(bias)
                gr = jax.grad(loss(pair_bias_attention_reference))(bias)
                gerr = float(jnp.abs(gf - gr).max())
                assert gerr < 5e-4, f"flash bwd parity dh={dh} {gerr:.2e}"

        # VMEM-fit proof for the widest head at the DEFAULT tiles: L=2048
        # exercises the uncapped 512x2048 fwd block and the dh-aware bwd
        # cap with dh=128 operand/accumulator buffers (the worst case the
        # tile table must fit) — compile + one fwd/bwd, finiteness only
        ksw = jax.random.split(jax.random.PRNGKey(7), 4)
        qw = jax.random.normal(ksw[0], (1, 2048, 1, 128), jnp.bfloat16)
        kw = jax.random.normal(ksw[1], (1, 2048, 1, 128), jnp.bfloat16)
        vw = jax.random.normal(ksw[2], (1, 2048, 1, 128), jnp.bfloat16)
        bw = jax.random.normal(ksw[3], (1, 1, 2048, 2048), jnp.bfloat16)
        kmw = jnp.ones((1, 2048), bool)
        gw = jax.grad(lambda b: jnp.sum(flash_pair_bias_attention(
            qw, kw, vw, b, kmw).astype(jnp.float32)))(bw)
        assert bool(jnp.isfinite(gw.astype(jnp.float32)).all()), \
            "dh=128 default-tile backward produced non-finite grads"

        # backward key strips (in-kernel fori_loop, ops/flash_attn.py):
        # at smoke L the default tiles clamp to a single strip, so force
        # narrow strips via the bwd_tiles 3-tuple and pin them against
        # the whole-block backward — identical schedule arithmetic, so
        # the match is exact
        from protstruc_tpu.ops.flash_attn import (
            flash_pair_bias_attention as _flash)

        ks = jax.random.split(jax.random.PRNGKey(5), 4)
        q = jax.random.normal(ks[0], (1, 520, 2, 16))
        k = jax.random.normal(ks[1], (1, 520, 2, 16))
        v = jax.random.normal(ks[2], (1, 520, 2, 16))
        bias = jax.random.normal(ks[3], (1, 2, 520, 520))
        kmask = jnp.ones((1, 520), bool).at[0, -9:].set(False)

        def gradb(sub_k):
            def loss(b):
                o = _flash(q, k, v, b, kmask, tile_q=64, tile_k=512,
                           bwd_tiles=(64, 512, sub_k))
                return jnp.sum(jnp.sin(o))
            return jax.grad(loss)(bias)

        g_whole = gradb(512)   # one whole strip
        g_strip = gradb(128)   # 4 strips
        serr = float(jnp.abs(g_strip - g_whole).max())
        assert serr < 1e-6, f"bwd strip-vs-whole parity {serr:.2e}"

    @stage("ring-attn-parity")
    def _():
        # the ring construction on a 1-device mesh: sp=1 degenerates to a
        # single (no-op ppermute) step, but still drives the lse-returning
        # Mosaic kernel + the online-softmax merge on the live chip — the
        # pieces tests/test_ring_attn.py can only run in interpret mode
        from jax.sharding import Mesh

        from protstruc_tpu.ops.flash_attn import pair_bias_attention_reference
        from protstruc_tpu.ops.ring_attn import ring_attention_sharded

        ks = jax.random.split(jax.random.PRNGKey(5), 4)
        q = jax.random.normal(ks[0], (1, 96, 2, 16))
        k = jax.random.normal(ks[1], (1, 96, 2, 16))
        v = jax.random.normal(ks[2], (1, 96, 2, 16))
        bias = jax.random.normal(ks[3], (1, 2, 96, 96))
        kmask = jnp.ones((1, 96), bool).at[0, -8:].set(False)
        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1, 1),
                    ("dp", "sp", "tp"))
        with jax.default_matmul_precision("highest"):
            out = ring_attention_sharded(q, k, v, bias, kmask, mesh,
                                         local="flash")
            ref = pair_bias_attention_reference(q, k, v, bias, kmask)
            err = float(jnp.abs(out - ref).max())
            assert err < 2e-5, f"ring parity {err:.2e}"

    @stage("aot-dispatcher")
    def _():
        from protstruc_tpu.utils.aot import precompile_featurizer

        feat = precompile_featurizer(batch_sizes=(1,), buckets=(256,))
        g, d, m, frames = feat(sb)
        assert d.shape[0] == 1 and np.isfinite(float(jnp.nansum(g["d_cb"])))

    @stage("checkpoint-roundtrip")
    def _():
        from protstruc_tpu.models.checkpoint import (
            restore_train_state, save_train_state)

        model = TrFold(tcfg)
        params = model.init(jax.random.PRNGKey(0), feats)["params"]
        opt = optax.adam(1e-3).init(params)
        with tempfile.TemporaryDirectory() as td:
            save_train_state(td, 0, params, opt)
            restored, _, step0 = restore_train_state(
                td, params_like=params, opt_state_like=opt)
        a = jax.tree_util.tree_leaves(params)
        b = jax.tree_util.tree_leaves(restored)
        assert step0 == 0 and all(
            np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))

    @stage("cli-featurize")
    def _():
        from protstruc_tpu.__main__ import main as cli_main

        with tempfile.TemporaryDirectory() as td:
            rc = cli_main(["featurize", "tests/data/15c8_HL.pdb",
                           "--out", f"{td}/f.npz", "--pallas"])
            assert rc == 0
            dat = np.load(f"{td}/f.npz")
            assert np.isfinite(np.nansum(dat["d_cb"]))

    @stage("diffusion-scan")
    def _():
        from protstruc_tpu.ops.diffusion import (
            cosine_variance_schedule, diffusion_trajectory)

        out = diffusion_trajectory(
            jnp.nan_to_num(sb.xyz, nan=0.0), jax.random.PRNGKey(0),
            cosine_variance_schedule(10))
        assert np.isfinite(float(out.sum()))

    @stage("align-kabsch")
    def _():
        moved = sb.rotate(jnp.asarray(
            [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
        )).translate(jnp.ones((1, sb.n_residues, 3)))
        back, _rt = moved.align(sb)
        rms = float(jnp.sqrt(jnp.nanmean((back.xyz - sb.xyz) ** 2)))
        assert rms < 1e-3, f"align rms {rms}"

    if failures:
        raise SystemExit(f"SMOKE FAILURES: {failures}")
    log("[smoke] all stages green")


def main():
    import sys as _sys

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    args = make_inputs(jax.random.PRNGKey(0))
    try:
        rtt = measure_rtt()
    except Exception as e:  # remote relay hiccup: assume typical RTT
        log(f"RTT measurement failed ({type(e).__name__}); assuming 30 ms")
        rtt = 0.03

    parity_check(rtt)
    model_parity_check(rtt)

    # the smoke lane runs by DEFAULT (VERDICT r3 item 2: the driver artifact
    # must certify the functional surface on the live chip every round);
    # --no-smoke / --headline-only skip it for quick local iterations
    if "--no-smoke" not in _sys.argv and "--headline-only" not in _sys.argv:
        run_smoke(rtt)

    # the six BASELINE.md configs + ingest + mfu + diagnostics run on every
    # bench so the driver-captured artifact certifies them round-over-round
    # (VERDICT r2 items 3+7, r3 items 2/7/8); --headline-only skips them
    if "--headline-only" not in _sys.argv:
        stages = [(run_ingest, "ingest"),
                  (run_ingest_sustained, "ingest-sustained"),
                  (lambda: run_configs(rtt), "configs"),
                  (lambda: run_long_l(rtt), "config6"),
                  (lambda: run_mfu(rtt), "mfu"),
                  (lambda: run_pallas_bwd(rtt), "pallas-bwd"),
                  (lambda: run_attn(rtt), "attn"),
                  (lambda: run_sharded_diag(rtt), "sp-shard"),
                  (lambda: run_model_fused_diag(rtt), "model-fused")]
        for fn, name in stages:
            try:
                fn()
            except Exception as e:
                log(f"[{name}] FAILED: {type(e).__name__}: {e}")

    results = {}
    for name, fn in [
        ("jnp-fused", featurize_jnp),
        ("pallas", featurize_pallas),
        ("pallas-bf16", featurize_pallas_bf16),  # diagnostics only
    ]:
        for attempt in (1, 2):  # the remote relay occasionally drops a call
            try:
                results[name] = time_variant(fn, args, name, rtt)
                break
            except Exception as e:  # report but don't fail the whole bench
                log(f"[{name}] attempt {attempt} FAILED: {type(e).__name__}: {e}")

    # headline = best parity-grade (f32) variant; bf16 is stderr-only
    parity = {k: v for k, v in results.items() if not k.endswith("bf16")}
    if not parity:
        raise SystemExit("all benchmark variants failed")

    best_name = max(parity, key=parity.get)
    best = parity[best_name]
    log(f"best (parity-grade): {best_name}")

    print(
        json.dumps(
            {
                "metric": "full_featurization_B256_L512_structures_per_s",
                "value": round(best, 1),
                "unit": "structures/s",
                "vs_baseline": round(best / BASELINE, 2),
            }
        )
    )


def run_cpu_lanes():
    """Degraded certification lanes that need no TPU (relay-outage mode).

    Everything host-side or interpret-mode verifiable still gets certified
    into the round artifact when the relay is down: kernel/model parity
    (interpret vs jnp oracle; the Mosaic tiers log themselves as skipped),
    and the python/native ingest lanes (pure host work).  Timings here are
    CPU numbers — the [cpu-fallback] banner keeps them from being read as
    chip throughput.
    """
    jax.config.update("jax_platforms", "cpu")
    log("[cpu-fallback] TPU relay down — running host/interpret lanes only; "
        "all timings below are CPU, NOT chip numbers")
    for fn, name in [(lambda: parity_check(0.0), "parity"),
                     (lambda: model_parity_check(0.0), "model-parity"),
                     (run_ingest, "ingest"),
                     (run_ingest_sustained, "ingest-sustained")]:
        # the parity gates abort via SystemExit (not an Exception
        # subclass); in degraded mode one failing lane must not take the
        # remaining certification lanes with it
        try:
            fn()
        except (Exception, SystemExit) as e:
            log(f"[cpu-fallback][{name}] FAILED: {type(e).__name__}: {e}")
    log("[cpu-fallback] lanes done")


def _relay_guard():
    """Fail fast with an honest JSON line when the TPU relay is down.

    The axon backend init has no timeout — with the relay unreachable the
    in-process jax call can hang indefinitely (observed 6+ h outages,
    2026-08-18).  Probe in a subprocess with a hard timeout BEFORE any
    in-process jax initialization so the driver gets a diagnostic line
    instead of a silent hang.  Before emitting the diagnostic, run the
    CPU-certifiable lanes in a forced-CPU subprocess so an outage at
    round end still leaves parity + ingest evidence in the artifact.
    """
    import os
    import subprocess
    import sys as _sys

    try:
        r = subprocess.run(
            [_sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=420)
        ok = r.returncode == 0
        backend = r.stdout.strip()
    except subprocess.TimeoutExpired:
        ok, backend = False, "timeout"
    if not ok:
        try:  # stderr inherited: the [cpu-fallback] lines land in the artifact
            env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
            subprocess.run([_sys.executable, __file__, "--cpu-lanes"],
                           env=env, stdout=subprocess.DEVNULL, timeout=2400)
        except Exception as e:
            log(f"[cpu-fallback] lanes failed to run: {type(e).__name__}: {e}")
        print(json.dumps({
            "metric": "full_featurization_B256_L512_structures_per_s",
            "value": None,
            "unit": "structures/s",
            "vs_baseline": None,
            "error": f"TPU relay unavailable (probe: {backend or 'init failed'});"
                     " CPU-certifiable lanes logged to stderr",
        }))
        raise SystemExit(3)
    log(f"relay probe ok: backend={backend}")


if __name__ == "__main__":
    if "--cpu-lanes" in sys.argv:
        run_cpu_lanes()
    else:
        _relay_guard()
        main()
