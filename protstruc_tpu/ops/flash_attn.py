"""Fused flash pair-bias attention — Pallas TPU kernel, forward + backward.

The node-track attention in TrFold / InverseFold (models/trfold.py
``PairBiasAttention``) is softmax(q·kᵀ/√dh + bias(pair)) · v with a key
validity mask.  The jnp path materializes the ``(B, H, L, L)`` logits and
probabilities in HBM (written + read twice in the forward alone); at the
head dims used here (dh = 32) the op is entirely HBM-bound, so fusing the
softmax into the q·kᵀ / p·v matmuls is worth ~the whole logits/probs
round-trip.  This kernel is the flash-attention formulation on L-tiles:

* forward: online softmax over key tiles — running row-max ``m``, running
  denominator ``l`` and an f32 output accumulator live in VMEM scratch and
  survive across the innermost (key-tile) grid axis; only the ``(L, dh)``
  output and an ``(L, 1)`` logsumexp ever reach HBM.
* backward: one kernel re-computes the probabilities tile-by-tile from the
  saved logsumexp and accumulates dk/dv in VMEM across query tiles while
  streaming ds (= dbias) out; dq is a plain batched matmul of ds·k done by
  XLA outside the kernel (reads ds once — already optimal).

Semantics match the jnp path in models/trfold.py exactly, including the
fully-masked-query convention: a query row whose every key is masked
outputs **zeros** (the jnp path zeroes probabilities post-softmax), not a
uniform average; its logsumexp is pinned to +1e30 so the backward
recomputes p = 0 there and every gradient through such a row is 0.

Mesh / GSPMD: a ``pallas_call`` is opaque to the SPMD partitioner, so both
kernels are wrapped in :func:`jax.experimental.custom_partitioning` — the
op shards over the batch (dp) and head (tp) axes exactly like the jnp
einsum path would, with the residue axes declared ``need_replication`` (a
flash kernel needs every key for its online softmax; under sequence
parallelism the partitioner inserts the all-gathers, which for the
``(B, H, L, L)`` bias defeats the point — under sp>1 use ring attention,
ops/ring_attn.py, which keeps everything sharded and rotates k/v blocks).

The reference package has no attention / model stack at all (this module
serves the model families the rebuild adds on top of protstruc's
featurization — see SURVEY.md §2 model rows); numerics are validated
against the jnp formulation in tests/test_flash_attn.py.
"""

from __future__ import annotations

import functools
import numbers

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["flash_pair_bias_attention", "flash_pair_bias_attention_lse",
           "pair_bias_attention_reference"]

_NEG = -1e30          # masked-logit sentinel (finite: keeps exp() exact zeroes)
_LSE_MASKED = 1e30    # logsumexp pin for fully-masked query rows


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _prec(dtype):
    """HIGHEST (exact 6-pass f32) for f32 operands — the parity-gate path.

    Mosaic rejects an fp32 contract precision on bf16 operands ("Bad lhs
    type"), and bf16 inputs already run the full-rate MXU path, so bf16
    keeps DEFAULT.
    """
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, kmask_ref,
                out_ref, lse_ref, acc_ref, m_ref, l_ref, *, scale):
    """Grid (BH, nq, nk), nk innermost.  Scratch persists across nk."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # MXU dots run on the operands' native dtype (bf16 stays bf16 — full-
    # rate MXU passes) with f32 accumulation; HIGHEST only matters for f32
    # operands, where it forces the exact 6-pass f32 matmul the parity
    # gates rely on.
    q = q_ref[0]                                         # (TQ, dh)
    k = k_ref[0]                                         # (TK, dh)
    allowed = kmask_ref[0] > 0.0                         # (1, TK)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(q.dtype),
    ) * scale + bias_ref[0].astype(jnp.float32)          # (TQ, TK)
    s = jnp.where(allowed, s, _NEG)

    m_prev = m_ref[:]                                    # (TQ, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.where(allowed, jnp.exp(s - m_new), 0.0)      # (TQ, TK)
    alpha = jnp.exp(m_prev - m_new)                      # (TQ, 1)

    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        # p in the value dtype: bf16 inputs get full-rate MXU p·v (the
        # standard flash trade; f32 accumulate keeps the sum exact-ish)
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(v_ref.dtype),
    )
    m_ref[:] = m_new

    @pl.when(ik == nk - 1)
    def _():
        l = l_ref[:]
        has_keys = l > 0.0
        safe_l = jnp.where(has_keys, l, 1.0)
        out_ref[0] = jnp.where(has_keys, acc_ref[:] / safe_l,
                               0.0).astype(out_ref.dtype)
        lse_ref[0] = jnp.where(has_keys, m_ref[:] + jnp.log(safe_l),
                               _LSE_MASKED)


def _fwd_call(q, k, v, bias, kmask, tile_q, tile_k, interpret):
    """q/k/v: (BH, L, dh); bias: (BH, L, L); kmask: (B, 1, L) f32.

    Returns (out (BH, L, dh) in q.dtype, lse (BH, L, 1) f32).  Inputs must
    already be padded to the tile grid (padded keys masked out).
    """
    BH, L, dh = q.shape
    B = kmask.shape[0]
    H = BH // B
    nq, nk = L // tile_q, L // tile_k
    scale = 1.0 / (dh ** 0.5)

    kern = functools.partial(_fwd_kernel, scale=scale)
    return pl.pallas_call(
        kern,
        name="flash_pair_bias_attn_fwd",
        grid=(BH, nq, nk),
        in_specs=[
            pl.BlockSpec((1, tile_q, dh), lambda bh, iq, ik: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k, dh), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k, dh), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, tile_k), lambda bh, iq, ik: (bh, iq, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_k), lambda bh, iq, ik: (bh // H, 0, ik),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, dh), lambda bh, iq, ik: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, 1), lambda bh, iq, ik: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, L, dh), q.dtype),
            jax.ShapeDtypeStruct((BH, L, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, dh), jnp.float32),   # output accumulator
            pltpu.VMEM((tile_q, 1), jnp.float32),    # running max
            pltpu.VMEM((tile_q, 1), jnp.float32),    # running denominator
        ],
        interpret=interpret,
    )(q, k, v, bias, kmask)


# ---------------------------------------------------------------------------
# backward kernel: ds (= dbias) streamed out; dk/dv accumulated over q tiles
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, kmask_ref, do_ref,
                lse_ref, delta_ref,
                ds_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, scale, sub_k):
    """Grid (BH, nk, nq), nq innermost (dk/dv accumulate across queries).

    The (tile_q, tile_k) block is processed in (tile_q, sub_k) key STRIPS
    inside a fori_loop: the four f32 score-sized temporaries (s, p, dp, ds)
    then occupy tile_q*sub_k*16 bytes instead of tile_q*tile_k*16.  Note
    the measured scoped-vmem saving is modest (18.05M unsplit vs 17.07M
    stripped at 512x2048/dh=16 — the pipelined BLOCK buffers dominate the
    budget), so the strip is a temporaries bound, not the fit lever: the
    dtype/dh-aware block cap in :func:`_bwd_tiles` is what keeps the
    kernel inside Mosaic's ~16M limit.  The BLOCK — and hence the
    per-grid-step DMA amortization the on-chip sweep showed matters —
    stays full-size; only the in-VMEM compute is stripped."""
    iq = pl.program_id(2)
    nq = pl.num_programs(2)
    tile_k = k_ref.shape[1]

    @pl.when(iq == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]                                         # (TQ, dh)
    do = do_ref[0]                                       # (TQ, dh)
    lse = lse_ref[0]                                     # (TQ, 1)
    delta = delta_ref[0]                                 # (TQ, 1)

    def strip(jk, carry):
        sl = pl.ds(jk * sub_k, sub_k)
        k = k_ref[0, sl, :]                              # (SK, dh)
        v = v_ref[0, sl, :]                              # (SK, dh)
        allowed = kmask_ref[0, :, sl] > 0.0              # (1, SK)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(q.dtype),
        ) * scale + bias_ref[0, :, sl].astype(jnp.float32)
        # lse is +1e30 on fully-masked rows -> p underflows to exactly 0
        p = jnp.where(allowed, jnp.exp(s - lse), 0.0)     # (TQ, SK)

        dv_acc[sl, :] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(do.dtype))                    # (SK, dh)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(v.dtype))                     # (TQ, SK)
        ds = p * (dp - delta)                             # (TQ, SK)
        ds_ref[0, :, sl] = ds.astype(ds_ref.dtype)
        dk_acc[sl, :] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(q.dtype)) * scale             # (SK, dh)
        return carry

    if sub_k == tile_k:
        strip(0, None)
    else:
        jax.lax.fori_loop(0, tile_k // sub_k, strip, None)

    @pl.when(iq == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


# Default strip width: bounds the bwd kernel's four f32 (tile_q, sub_k)
# temporaries to 4 * tile_q * 512 * 4 bytes (4 MiB at tile_q=512).  On-chip,
# strip-width variations at a fixed block shape measured within session
# noise (experiments/attn_strips_ab.py) — the strip exists as a scoped-vmem
# bound, not a tuning axis; the BLOCK shape (below) is what moves timing.
_BWD_SUB_K = 512


def _pow2_floor(x: int) -> int:
    return 1 << (x.bit_length() - 1)


def _bwd_tiles(tile_q: int, tile_k: int, small: bool = False) -> tuple:
    """Backward BLOCK cap.  The f32 score-sized temporaries are bounded
    separately by the in-kernel key strips (see :func:`_bwd_kernel`), so
    the block area drives the pipelined bias/ds buffers and the dh-padded
    operand/accumulator buffers.  ``small=False`` (16-bit q and bias,
    dh >= 32) allows the full 1M area (= the 512x2048 forward default);
    ``small`` (f32 bias doubles the L^2 buffer bytes, f32 q/k/v doubles
    the operand/accumulator buffers, dh < 32 pads every (*, dh) buffer
    8x to the 128-lane tile) halves it to 512K.  The caps are sized for
    compile-time FIT: at dh=16 the 512x2048 block allocated 17.07-18.05M
    scoped vmem vs Mosaic's 16.00M limit inside a remat'd train step,
    and the 256x2048 block restored it; on-chip timing differences
    between fitting schedules are inside process noise
    (experiments/attn_strips_ab.py; docs/guides/performance.md).  Beyond
    the cap, shrink the QUERY tile first — large KEY tiles amortize the
    per-grid-step overhead.  Any power-of-two reduction still divides
    the forward-padded Lp."""
    cap = 512 * 1024 if small else 1024 * 1024
    while tile_q * tile_k > cap:
        if tile_q > 256:
            tile_q //= 2
        elif tile_k > 128:
            tile_k //= 2
        else:
            break
    return tile_q, tile_k


def _bwd_call(q, k, v, bias, kmask, do, lse, delta,
              tile_q, tile_k, sub_k, interpret):
    """Returns (ds (BH, L, L) in bias dtype, dk/dv (BH, L, dh) in q dtype).

    Tiles and the strip width arrive already resolved — the public entry
    points apply the :func:`_bwd_tiles` scoped-vmem cap (or the caller's
    explicit ``bwd_tiles`` override) before the core is traced."""
    BH, L, dh = q.shape
    B = kmask.shape[0]
    H = BH // B
    nq, nk = L // tile_q, L // tile_k
    scale = 1.0 / (dh ** 0.5)

    kern = functools.partial(_bwd_kernel, scale=scale,
                             sub_k=min(tile_k, sub_k))
    return pl.pallas_call(
        kern,
        name="flash_pair_bias_attn_bwd",
        grid=(BH, nk, nq),
        in_specs=[
            pl.BlockSpec((1, tile_q, dh), lambda bh, ik, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k, dh), lambda bh, ik, iq: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k, dh), lambda bh, ik, iq: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, tile_k), lambda bh, ik, iq: (bh, iq, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_k), lambda bh, ik, iq: (bh // H, 0, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, dh), lambda bh, ik, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, 1), lambda bh, ik, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, 1), lambda bh, ik, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, tile_k), lambda bh, ik, iq: (bh, iq, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k, dh), lambda bh, ik, iq: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k, dh), lambda bh, ik, iq: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # ds in the bias dtype: halves the one unavoidable L^2 write in
            # bf16 training; f32 inputs keep the exact f32 ds
            jax.ShapeDtypeStruct((BH, L, L), bias.dtype),
            jax.ShapeDtypeStruct((BH, L, dh), q.dtype),
            jax.ShapeDtypeStruct((BH, L, dh), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_k, dh), jnp.float32),
            pltpu.VMEM((tile_k, dh), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias, kmask, do, lse, delta)


# ---------------------------------------------------------------------------
# GSPMD partitioning: shard over batch (dp) and heads (tp); the residue
# axes and head depth are need_replication (the kernel streams ALL keys)
# ---------------------------------------------------------------------------

def _dim_spec(shaped, i):
    """The PartitionSpec entry for dim i of an arg/result ShapeDtypeStruct."""
    sharding = getattr(shaped, "sharding", None)
    spec = getattr(sharding, "spec", None)
    if spec is None:
        return None
    return spec[i] if i < len(spec) else None


def _bh_axes(arg_shapes):
    """Mesh axes bound to the batch / head dims across q, bias, kmask."""
    q, bias, kmask = arg_shapes[0], arg_shapes[3], arg_shapes[4]
    b = _dim_spec(q, 0) or _dim_spec(bias, 0) or _dim_spec(kmask, 0)
    h = _dim_spec(q, 2) or _dim_spec(bias, 1)
    return b, h


def _fwd_public(q, k, v, bias, kmaskf, tile_q, tile_k, interpret):
    """(B, L, H, dh)-layout forward; also the per-shard GSPMD lowering.

    Returns (out (B, L, H, dh) in q.dtype, lse (B, H, L) f32).  Inputs are
    already padded to the tile grid; kmaskf is the f32 key-validity mask.
    """
    B, L, H, dh = q.shape
    qf = jnp.moveaxis(q, 2, 1).reshape(B * H, L, dh)
    kf = jnp.moveaxis(k, 2, 1).reshape(B * H, L, dh)
    vf = jnp.moveaxis(v, 2, 1).reshape(B * H, L, dh)
    bf = bias.reshape(B * H, L, L)
    out, lse = _fwd_call(qf, kf, vf, bf, kmaskf[:, None, :],
                         tile_q, tile_k, interpret)
    out = jnp.moveaxis(out.reshape(B, H, L, dh), 1, 2)
    return out, lse.reshape(B, H, L)


def _bwd_public(q, k, v, bias, kmaskf, do, lse, delta,
                tile_q, tile_k, sub_k, interpret):
    """(B, L, H, dh)-layout backward; also the per-shard GSPMD lowering.

    Returns (ds (B, H, L, L) in bias dtype, dk / dv (B, L, H, dh))."""
    B, L, H, dh = q.shape

    def flat(x):
        return jnp.moveaxis(x, 2, 1).reshape(B * H, L, dh)

    ds, dk, dv = _bwd_call(
        flat(q), flat(k), flat(v), bias.reshape(B * H, L, L),
        kmaskf[:, None, :], flat(do),
        lse.reshape(B * H, L, 1), delta.reshape(B * H, L, 1),
        tile_q, tile_k, sub_k, interpret)
    unflat = lambda x: jnp.moveaxis(x.reshape(B, H, L, dh), 1, 2)
    return ds.reshape(B, H, L, L), unflat(dk), unflat(dv)


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(tile_q, tile_k, interpret):
    def impl(q, k, v, bias, kmaskf):
        return _fwd_public(q, k, v, bias, kmaskf, tile_q, tile_k, interpret)

    fn = custom_partitioning(impl)

    def shardings(mesh, arg_shapes):
        b, h = _bh_axes(arg_shapes)
        args = (P(b, None, h, None),) * 3 + (P(b, h, None, None), P(b, None))
        outs = (P(b, None, h, None), P(b, h, None))
        ns = lambda spec: NamedSharding(mesh, spec)
        return tuple(map(ns, args)), tuple(map(ns, outs))

    def infer(mesh, arg_shapes, result_shape):
        return shardings(mesh, arg_shapes)[1]

    def partition(mesh, arg_shapes, result_shape):
        args, outs = shardings(mesh, arg_shapes)
        return mesh, impl, outs, args

    fn.def_partition(
        partition=partition, infer_sharding_from_operands=infer,
        sharding_rule="b l h dq, b s h dq, b s h dv, b h l s, b s "
                      "-> b l h dv, b h l",
        need_replication_factors=("l", "dq", "s", "dv"))
    return fn


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(tile_q, tile_k, sub_k, interpret):
    def impl(q, k, v, bias, kmaskf, do, lse, delta):
        return _bwd_public(q, k, v, bias, kmaskf, do, lse, delta,
                           tile_q, tile_k, sub_k, interpret)

    fn = custom_partitioning(impl)

    def shardings(mesh, arg_shapes):
        b, h = _bh_axes(arg_shapes)
        qspec = P(b, None, h, None)
        args = (qspec,) * 3 + (P(b, h, None, None), P(b, None), qspec,
                               P(b, h, None), P(b, h, None))
        outs = (P(b, h, None, None), qspec, qspec)
        ns = lambda spec: NamedSharding(mesh, spec)
        return tuple(map(ns, args)), tuple(map(ns, outs))

    def infer(mesh, arg_shapes, result_shape):
        return shardings(mesh, arg_shapes)[1]

    def partition(mesh, arg_shapes, result_shape):
        args, outs = shardings(mesh, arg_shapes)
        return mesh, impl, outs, args

    fn.def_partition(
        partition=partition, infer_sharding_from_operands=infer,
        sharding_rule="b l h dq, b s h dq, b s h dv, b h l s, b s, "
                      "b l h dv, b h l, b h l "
                      "-> b h l s, b s h dq, b s h dv",
        need_replication_factors=("l", "dq", "s", "dv"))
    return fn


# ---------------------------------------------------------------------------
# public differentiable entry point
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash_core(q, k, v, bias, kmaskf, tile_q, tile_k,
                bwd_tq, bwd_tk, bwd_sk, interpret):
    out, _ = _fwd_partitioned(tile_q, tile_k, interpret)(
        q, k, v, bias, kmaskf)
    return out


def _flash_core_fwd(q, k, v, bias, kmaskf, tile_q, tile_k,
                    bwd_tq, bwd_tk, bwd_sk, interpret):
    out, lse = _fwd_partitioned(tile_q, tile_k, interpret)(
        q, k, v, bias, kmaskf)
    return out, (q, k, v, bias, kmaskf, out, lse)


def _flash_core_bwd(tile_q, tile_k, bwd_tq, bwd_tk, bwd_sk, interpret,
                    res, g):
    q, k, v, bias, kmaskf, out, lse = res
    do = g.astype(jnp.float32)
    # delta_i = sum_d dO_id * O_id  (rowwise) — cheap O(L dh) prologue
    delta = jnp.moveaxis(
        jnp.sum(do * out.astype(jnp.float32), axis=-1), 2, 1)   # (B, H, L)
    ds, dk, dv = _bwd_partitioned(bwd_tq, bwd_tk, bwd_sk, interpret)(
        q, k, v, bias, kmaskf, g, lse, delta)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    # dq = ds @ k: one batched MXU matmul reading ds once — XLA-optimal,
    # and it keeps the Pallas kernel free of a second (transposed) dq loop.
    dq = (jnp.einsum("bhqk,bkhd->bqhd", ds, k,
                     preferred_element_type=jnp.float32,
                     precision=_prec(k.dtype)) * scale)
    return (dq.astype(q.dtype), dk, dv, ds.astype(bias.dtype),
            jnp.zeros_like(kmaskf))


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def pair_bias_attention_reference(q, k, v, bias, kmask):
    """jnp reference semantics (mirrors models/trfold.py PairBiasAttention).

    q/k/v: ``(B, L, H, dh)``; bias: ``(B, H, L, L)``; kmask: ``(B, L)`` bool.
    Returns ``(B, L, H, dh)``.
    """
    dh = q.shape[-1]
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k) / jnp.sqrt(
        jnp.asarray(dh, q.dtype))
    logits = logits + bias
    allowed = kmask[:, None, None, :]
    logits = jnp.where(allowed, logits, jnp.asarray(-1e9, logits.dtype))
    attn = jax.nn.softmax(logits, axis=-1)
    attn = jnp.where(allowed, attn, 0.0)
    return jnp.einsum("bhlm,bmhd->blhd", attn, v)


def flash_pair_bias_attention(q, k, v, bias, kmask, *,
                              tile_q: int = 512, tile_k: int = 2048,
                              bwd_tiles: tuple | None = None,
                              interpret: bool | None = None):
    """Fused flash attention with additive pair bias and key masking.

    Args:
      q, k, v: ``(B, L, H, dh)`` float arrays (f32 or bf16).
      bias: ``(B, H, L, L)`` additive logit bias (pair projection).
      kmask: ``(B, L)`` bool — True where the key position is valid.
      tile_q / tile_k: forward L-tile sizes; non-powers-of-two are rounded
        down so the padded L stays <= 2x.  Defaults from the on-chip sweep
        (experiments/attn_sweep.py): large key tiles amortize the per-
        grid-step overhead; 512x2048 is the fastest measured forward
        shape at L=4096 on v5e (5.8x the XLA fused jnp path).
      bwd_tiles: optional ``(tile_q, tile_k)`` or ``(tile_q, tile_k,
        sub_k)`` schedule for the BACKWARD kernel; default = the forward
        tiles capped by :func:`_bwd_tiles` — 512x2048 for 16-bit inputs
        at dh >= 32, 256x2048 otherwise (f32 doubles the pipelined
        buffer bytes; dh < 32 pads every (*, dh) buffer to 128 lanes —
        both exhaust Mosaic's ~16M scoped-vmem budget at the full
        block: measured 17.07-18.05M vs the 16.00M limit at dh=16).
        Inside the block the kernel computes in (tile_q, sub_k = 512)
        key strips to bound its f32 temporaries.  The caps are for
        compile-time FIT; on-chip, every schedule in the measured matrix
        lands at 1.5-1.9x the jnp path fwd+bwd at L=4096 bf16, with
        schedule-to-schedule differences inside the 15-25% process noise
        (experiments/attn_strips_ab.py).
      interpret: run the Pallas interpreter (defaults to True off-TPU).

    Returns ``(B, L, H, dh)`` in the dtype of ``q``.  Differentiable wrt
    q/k/v/bias (flash backward); fully-masked query rows return zeros and
    carry zero gradients, matching the jnp path.  Under a device mesh the
    op shards over batch/head axes (custom_partitioning); residue axes are
    replicated per shard.
    """
    q, k, v, bias, kmaskf, tile_q, tile_k, L, interpret = _pad_and_tiles(
        q, k, v, bias, kmask, tile_q, tile_k, interpret)
    bwd_tq, bwd_tk, bwd_sk = _resolve_bwd_tiles(
        bwd_tiles, tile_q, tile_k, q, bias)
    out = _flash_core(q, k, v, bias, kmaskf, tile_q, tile_k,
                      bwd_tq, bwd_tk, bwd_sk, interpret)
    return out[:, :L]


def _resolve_bwd_tiles(bwd_tiles, tile_q: int, tile_k: int,
                       q, bias) -> tuple:
    """Resolve the backward schedule: ``(block_tq, block_tk, sub_k)``.

    ``bwd_tiles=None`` applies the :func:`_bwd_tiles` scoped-vmem block
    cap (halved when any operand is 32-bit or dh < 32) with the default
    :data:`_BWD_SUB_K` strip.  An explicit ``(tq, tk)`` or
    ``(tq, tk, sub_k)`` is clamped to powers of two that divide the
    forward-padded Lp (any power of two <= max(fwd tiles) does)."""
    if bwd_tiles is None:
        small = (jnp.dtype(bias.dtype).itemsize >= 4
                 or jnp.dtype(q.dtype).itemsize >= 4
                 or q.shape[-1] < 32)
        return _bwd_tiles(tile_q, tile_k, small) + (_BWD_SUB_K,)
    if len(bwd_tiles) not in (2, 3) or any(
            not isinstance(t, numbers.Integral) or t <= 0
            for t in bwd_tiles):
        raise ValueError(
            f"bwd_tiles must be 2-3 positive ints (tile_q, tile_k[, "
            f"sub_k]), got {bwd_tiles!r}")
    # plain ints: np integer types lack bit_length and would poison the
    # lru_cache keys downstream
    bwd_tiles = tuple(int(t) for t in bwd_tiles)
    cap = max(tile_q, tile_k)
    btq, btk = bwd_tiles[:2]
    bsk = bwd_tiles[2] if len(bwd_tiles) == 3 else _BWD_SUB_K
    btk = max(min(_pow2_floor(btk), cap), 128)
    return (max(min(_pow2_floor(btq), cap), 16), btk,
            max(min(_pow2_floor(bsk), btk), 128))


def _pad_and_tiles(q, k, v, bias, kmask, tile_q, tile_k, interpret):
    """Shared input validation, tile clamping and padding for the public
    entry points.  Returns the padded operands plus the resolved tiles,
    the original L (for un-padding) and the resolved interpret flag."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, L, H, dh = q.shape
    if bias.shape != (B, H, L, L):
        raise ValueError(f"bias must be (B, H, L, L), got {bias.shape}")
    if kmask.shape != (B, L):
        raise ValueError(f"kmask must be (B, L), got {kmask.shape}")

    # Clamp tiles to powers of two <= the padded L so the smaller always
    # divides the larger: Lp = ceil(L, max tile) keeps padding under 2x
    # (an lcm of ragged tiles can blow padding up 10x+).
    pow2_floor = _pow2_floor
    pow2_ceil = lambda x: 1 << ((x - 1).bit_length())
    # floor 16: bf16 sublane tiling is (16, 128) on TPU; 16 also satisfies
    # f32.  The floors bind explicitly-passed tiny tiles too, not just the
    # L-derived cap (tile_q=8 would fall off the Mosaic fast path).
    tile_q = max(min(pow2_floor(tile_q), max(pow2_ceil(L), 16)), 16)
    tile_k = max(min(pow2_floor(tile_k), max(pow2_ceil(L), 128)), 128)
    Lp = _ceil_to(L, max(tile_q, tile_k))

    pad = Lp - L
    if pad:
        pad_l = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = (jnp.pad(x, pad_l) for x in (q, k, v))
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad), (0, pad)))
    kmaskf = jnp.pad(kmask.astype(jnp.float32), ((0, 0), (0, pad)))
    return q, k, v, bias, kmaskf, tile_q, tile_k, L, interpret


# ---------------------------------------------------------------------------
# lse-returning variant: the mergeable building block for ring attention
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash_core_lse(q, k, v, bias, kmaskf, tile_q, tile_k,
                    bwd_tq, bwd_tk, bwd_sk, interpret):
    out, lse = _fwd_public(q, k, v, bias, kmaskf, tile_q, tile_k, interpret)
    return out, jnp.where(lse >= _LSE_MASKED, -jnp.inf, lse)


def _flash_core_lse_fwd(q, k, v, bias, kmaskf, tile_q, tile_k,
                        bwd_tq, bwd_tk, bwd_sk, interpret):
    out, lse = _fwd_public(q, k, v, bias, kmaskf, tile_q, tile_k, interpret)
    # external convention: -inf on fully-masked rows (neutral in the
    # logaddexp merge ops/ring_attn.py does), vs the kernel's +1e30 pin
    ext = jnp.where(lse >= _LSE_MASKED, -jnp.inf, lse)
    return (out, ext), (q, k, v, bias, kmaskf, out, lse)


def _flash_core_lse_bwd(tile_q, tile_k, bwd_tq, bwd_tk, bwd_sk, interpret,
                        res, g):
    q, k, v, bias, kmaskf, out, lse = res
    g_out, g_lse = g
    do = g_out.astype(jnp.float32)
    delta = jnp.moveaxis(
        jnp.sum(do * out.astype(jnp.float32), axis=-1), 2, 1)   # (B, H, L)
    # d lse_i / d s_ij = p_ij, and the kernel computes ds = p * (dp - delta)
    # — so folding the lse cotangent into delta (delta - g_lse) adds
    # g_lse * p exactly.  Fully-masked rows have p = 0 identically (their
    # saved lse stays at the kernel's +1e30 pin), so sanitizing a non-finite
    # cotangent there to 0 changes nothing.
    g_lse = jnp.nan_to_num(g_lse.astype(jnp.float32),
                           nan=0.0, posinf=0.0, neginf=0.0)
    ds, dk, dv = _bwd_public(q, k, v, bias, kmaskf, g_out, lse,
                             delta - g_lse, bwd_tq, bwd_tk, bwd_sk,
                             interpret)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    dq = (jnp.einsum("bhqk,bkhd->bqhd", ds, k,
                     preferred_element_type=jnp.float32,
                     precision=_prec(k.dtype)) * scale)
    return (dq.astype(q.dtype), dk, dv, ds.astype(bias.dtype),
            jnp.zeros_like(kmaskf))


_flash_core_lse.defvjp(_flash_core_lse_fwd, _flash_core_lse_bwd)


def flash_pair_bias_attention_lse(q, k, v, bias, kmask, *,
                                  tile_q: int = 512, tile_k: int = 2048,
                                  bwd_tiles: tuple | None = None,
                                  interpret: bool | None = None):
    """Fused flash attention that also returns the per-row logsumexp.

    Same semantics and arguments as :func:`flash_pair_bias_attention`, plus
    a second output ``lse (B, H, L)`` float32 — the softmax denominator in
    log space, ``-inf`` on fully-masked query rows.  ``(out, lse)`` is the
    mergeable representation blockwise/ring attention needs: two partial
    results over disjoint key sets combine as
    ``w_a, w_b = exp(lse_a - lse), exp(lse_b - lse)`` with
    ``lse = logaddexp(lse_a, lse_b)`` and ``out = w_a out_a + w_b out_b``
    (see ops/ring_attn.py).  Differentiable wrt q/k/v/bias for cotangents
    of BOTH outputs.  Unlike the single-output entry point this one is NOT
    GSPMD-partitioned — it is meant to run on local shards inside
    ``shard_map``, where every operand is already device-local.
    """
    q, k, v, bias, kmaskf, tile_q, tile_k, L, interpret = _pad_and_tiles(
        q, k, v, bias, kmask, tile_q, tile_k, interpret)
    bwd_tq, bwd_tk, bwd_sk = _resolve_bwd_tiles(
        bwd_tiles, tile_q, tile_k, q, bias)
    out, lse = _flash_core_lse(q, k, v, bias, kmaskf, tile_q, tile_k,
                               bwd_tq, bwd_tk, bwd_sk, interpret)
    return out[:, :L], lse[:, :, :L]
