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
    2. Kernel vs the jnp-fused oracle: max|Δ| ≤ 2e-4 (the unit-test bound,
       tests/test_pallas_pairwise.py:25) — on random coordinates the
       arccos-form jnp path is itself only ~2e-5-accurate near degenerate
       angles, so 1e-5 is not achievable *between formulations*; the ≤1e-5
       BASELINE bar is vs the reference on bundled PDBs
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

    vs_jnp, vs_interp = tiers(xyz, atom_mask)
    for name, res, tol in [
        ("mosaic-vs-interpret", vs_interp, 1e-5),
        ("kernel-vs-jnp", vs_jnp, 2e-4),
    ]:
        if res is None:
            log(f"[parity] {name}: skipped (backend={jax.default_backend()})")
            continue
        res = {k: (float(v[0]), float(v[1])) for k, v in res.items()}
        worst = max(v[0] for v in res.values())
        bad = {k: v for k, v in res.items() if v[0] > tol or v[1] != 0}
        log(f"[parity] {name}: max|d| = {worst:.2e} (tol {tol:.0e}) "
            + " ".join(f"{k}={v[0]:.1e}" for k, v in res.items()))
        if bad:
            raise SystemExit(f"PARITY FAILURE ({name}): {bad}")


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

    if "--configs" in _sys.argv:
        run_configs(rtt)
        for diag, name in [(run_sharded_diag, "sp-shard"),
                           (run_model_fused_diag, "model-fused")]:
            try:
                diag(rtt)
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


if __name__ == "__main__":
    main()
