"""Fused Pallas kernels for AF2-style triangle multiplicative updates.

The trunk's production-width bottleneck is NOT the O(L^3 C) triangle
contraction — it is the ~15 elementwise/Dense passes streaming the
(B, L, L, C) pair tensor around it (measured: at B=4, L=512, C=128 bf16 the
whole TriangleMultiplication forward is 11.9 ms of which the contraction is
2.3 ms; the LayerNorm+gate prologue alone is 6.0 ms and XLA's fused Dense
passes run at only ~250 GB/s — experiments/r5_tri_probe.py).  This module
fuses the streaming into two Pallas kernels around an XLA einsum:

* **prologue**: one pass reading the pair rows once and emitting the two
  gated/masked projections ``a = sigmoid(src @ Wag + bag) * (src @ Wap +
  bap) * m`` and ``b = ...`` with ``src = LayerNorm(pair)`` computed
  in-register (f32 statistics, matching flax) — HBM traffic 1 read + 2
  writes instead of ~10 passes.
* **contraction**: ``einsum('bikc,bjkc->bijc')`` stays XLA — it is already
  MXU-bound and the (B, C)-batched layout probe showed no transpose win.
* **epilogue**: one pass reading pair + prod once and emitting
  ``sigmoid(src @ Wog + bog) * (LayerNorm(prod) @ Wo + bo)``.

Both kernels have **fused Pallas backwards** (custom_vjp): the backward
recomputes the forward intermediates in-register from the saved inputs and
emits the streamed dpair/dprod tiles plus f32 weight-gradient accumulators
(same-block revisiting across the sequential TPU grid).  The two ops
compose through JAX AD — the shared input LayerNorm's backward is linear in
the cotangent, so each op independently contributing ``LN_bwd(its dsrc)``
and partial scale/bias sums is exact.

Parity: values match the flax path (models/trfold.TriangleMultiplication)
to f32 exactness / bf16 rounding; the param tree is identical (the module
declares twin params — see trfold._DenseParams) so checkpoints load across
the ``fused_tri`` flag.  Reference semantics: AF2 Algorithms 11/12, same as
the unfused module (SURVEY §2; the reference library has no model stack —
this is additive framework surface).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_triangle_multiplication"]

_EPS = 1e-6  # flax.linen.LayerNorm default


def _prec(dtype):
    # exact 6-pass matmul for f32 operands (parity); native-rate for bf16
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)


def _ln_f32(x, scale_ref, bias_ref):
    """f32 LayerNorm over the last axis; returns (y_f32, xhat, inv_sigma).

    Fast-variance form (E[x^2] - mu^2) matching flax's default
    ``use_fast_variance=True``; statistics in f32 like flax's half-precision
    promotion."""
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(x * x, -1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(var + _EPS)
    xhat = (x - mu) * inv
    y = xhat * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32)
    return y, xhat, inv


def _ln_bwd(dsrc, xhat, inv, scale_ref):
    """d LayerNorm / d x given the cotangent of its OUTPUT (dsrc)."""
    dxh = dsrc * scale_ref[...].astype(jnp.float32)
    mean_dxh = jnp.mean(dxh, -1, keepdims=True)
    mean_dxh_xh = jnp.mean(dxh * xhat, -1, keepdims=True)
    return inv * (dxh - mean_dxh - xhat * mean_dxh_xh)


def _dot(a, w_ref, b_ref):
    """(TR, C) @ (C, C) + (1, C) with f32 accumulation."""
    out = jax.lax.dot_general(
        a, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(a.dtype))
    return out + b_ref[...].astype(jnp.float32)


def _dot_t(dpre, w_ref, cd):
    """(TR, C) @ (C, C)^T — the dsrc back-projection."""
    return jax.lax.dot_general(
        dpre.astype(cd), w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(cd))


def _dot_acc(s, dpre, cd):
    """(C, C) = s^T @ dpre — per-tile weight-gradient contribution."""
    return jax.lax.dot_general(
        s, dpre.astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(cd))


# ---------------------------------------------------------------------------
# prologue: pair rows -> (a, b)
# ---------------------------------------------------------------------------


def _prologue_fwd_kernel(x_ref, m_ref, lns_ref, lnb_ref,
                         wag_ref, bag_ref, wap_ref, bap_ref,
                         wbg_ref, bbg_ref, wbp_ref, bbp_ref,
                         a_ref, b_ref):
    x = x_ref[...].astype(jnp.float32)
    src, _, _ = _ln_f32(x, lns_ref, lnb_ref)
    s = src.astype(x_ref.dtype)
    m = m_ref[...].astype(jnp.float32)  # (TR, 1)
    a = jax.nn.sigmoid(_dot(s, wag_ref, bag_ref)) * _dot(s, wap_ref, bap_ref)
    b = jax.nn.sigmoid(_dot(s, wbg_ref, bbg_ref)) * _dot(s, wbp_ref, bbp_ref)
    a_ref[...] = (a * m).astype(a_ref.dtype)
    b_ref[...] = (b * m).astype(b_ref.dtype)


def _prologue_bwd_kernel(x_ref, m_ref, lns_ref, lnb_ref,
                         wag_ref, bag_ref, wap_ref, bap_ref,
                         wbg_ref, bbg_ref, wbp_ref, bbp_ref,
                         da_ref, db_ref,
                         dx_ref, dlns_ref, dlnb_ref,
                         dwag_ref, dbag_ref, dwap_ref, dbap_ref,
                         dwbg_ref, dbbg_ref, dwbp_ref, dbbp_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in (dlns_ref, dlnb_ref, dwag_ref, dbag_ref, dwap_ref, dbap_ref,
                  dwbg_ref, dbbg_ref, dwbp_ref, dbbp_ref):
            r[...] = jnp.zeros_like(r)

    cd = x_ref.dtype
    x = x_ref[...].astype(jnp.float32)
    src, xhat, inv = _ln_f32(x, lns_ref, lnb_ref)
    s = src.astype(cd)
    m = m_ref[...].astype(jnp.float32)

    ag = _dot(s, wag_ref, bag_ref)
    ap = _dot(s, wap_ref, bap_ref)
    bg = _dot(s, wbg_ref, bbg_ref)
    bp = _dot(s, wbp_ref, bbp_ref)
    sa = jax.nn.sigmoid(ag)
    sb = jax.nn.sigmoid(bg)

    da = da_ref[...].astype(jnp.float32) * m
    db = db_ref[...].astype(jnp.float32) * m
    dap = da * sa
    dag = da * ap * sa * (1.0 - sa)
    dbp = db * sb
    dbg = db * bp * sb * (1.0 - sb)

    dsrc = (_dot_t(dag, wag_ref, cd) + _dot_t(dap, wap_ref, cd)
            + _dot_t(dbg, wbg_ref, cd) + _dot_t(dbp, wbp_ref, cd))
    dx_ref[...] = _ln_bwd(dsrc, xhat, inv, lns_ref).astype(dx_ref.dtype)

    dlns_ref[...] += jnp.sum(dsrc * xhat, 0, keepdims=True)
    dlnb_ref[...] += jnp.sum(dsrc, 0, keepdims=True)
    dwag_ref[...] += _dot_acc(s, dag, cd)
    dbag_ref[...] += jnp.sum(dag, 0, keepdims=True)
    dwap_ref[...] += _dot_acc(s, dap, cd)
    dbap_ref[...] += jnp.sum(dap, 0, keepdims=True)
    dwbg_ref[...] += _dot_acc(s, dbg, cd)
    dbbg_ref[...] += jnp.sum(dbg, 0, keepdims=True)
    dwbp_ref[...] += _dot_acc(s, dbp, cd)
    dbbp_ref[...] += jnp.sum(dbp, 0, keepdims=True)


def _row_specs(tr, C, n_stream_in, n_weights_in):
    """(streamed row inputs, weight inputs) BlockSpecs in declared order."""
    row = pl.BlockSpec((tr, C), lambda r: (r, 0), memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((tr, 1), lambda r: (r, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((C, C), lambda r: (0, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, C), lambda r: (0, 0), memory_space=pltpu.VMEM)
    return row, mask, mat, vec


def _pad_rows(arr, npad):
    n = arr.shape[0]
    return arr if n == npad else jnp.pad(arr, ((0, npad - n), (0, 0)))


def _tile_rows(C: int, dtype=jnp.bfloat16) -> int:
    # VMEM budget: the backward holds ~12 f32 (TR, C) intermediates plus
    # the pipelined (TR, C) stream blocks in the INPUT dtype; 2^17 elements
    # per tile fits Mosaic's 16M scoped limit for 16-bit streams, but f32
    # streams double the pipelined buffers and must halve the tile
    # (measured: the epilogue backward at C=64/TR=2048/f32 allocated
    # 19.96M vs the 16.00M limit inside the remat'd FoldModel train step —
    # the r5 LOO smoke gate caught it; bf16 at the same element count fits)
    budget = (1 << 17) if jnp.dtype(dtype).itemsize <= 2 else (1 << 16)
    return max(128, min(2048, budget // max(C, 1) // 8 * 8))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _prologue_op(tr, interpret, x, m, lns, lnb,
                 wag, bag, wap, bap, wbg, bbg, wbp, bbp):
    """(N, C) pair rows + (N, 1) mask -> gated/masked (a, b) rows."""
    return _prologue_fwd_call(tr, interpret, x, m, lns, lnb,
                              wag, bag, wap, bap, wbg, bbg, wbp, bbp)


def _prologue_fwd_call(tr, interpret, x, m, *weights):
    N, C = x.shape
    npad = pl.cdiv(N, tr) * tr
    xp = _pad_rows(x, npad)
    mp = _pad_rows(m, npad)
    row, mask, mat, vec = _row_specs(tr, C, 2, 12)
    # lns, lnb are (1, C); then 4 x (kernel (C, C), bias (1, C))
    wspecs = [vec, vec] + [mat, vec] * 4
    a, b = pl.pallas_call(
        _prologue_fwd_kernel,
        name="tri_mul_prologue_fwd",
        grid=(npad // tr,),
        in_specs=[row, mask] + wspecs,
        out_specs=[row, row],
        out_shape=[jax.ShapeDtypeStruct((npad, C), x.dtype)] * 2,
        interpret=interpret,
    )(xp, mp, *weights)
    return a[:N], b[:N]


def _prologue_vjp_fwd(tr, interpret, x, m, *weights):
    out = _prologue_fwd_call(tr, interpret, x, m, *weights)
    return out, (x, m) + weights


def _prologue_vjp_bwd(tr, interpret, res, ct):
    x, m = res[0], res[1]
    weights = res[2:]
    da, db = ct
    N, C = x.shape
    npad = pl.cdiv(N, tr) * tr
    row, mask, mat, vec = _row_specs(tr, C, 4, 12)
    wspecs = [vec, vec] + [mat, vec] * 4
    acc_mat = pl.BlockSpec((C, C), lambda r: (0, 0), memory_space=pltpu.VMEM)
    acc_vec = pl.BlockSpec((1, C), lambda r: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _prologue_bwd_kernel,
        name="tri_mul_prologue_bwd",
        grid=(npad // tr,),
        in_specs=[row, mask] + wspecs + [row, row],
        out_specs=[row, acc_vec, acc_vec]
        + [acc_mat, acc_vec] * 4,
        out_shape=[jax.ShapeDtypeStruct((npad, C), x.dtype)]
        + [jax.ShapeDtypeStruct((1, C), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((C, C), jnp.float32),
           jax.ShapeDtypeStruct((1, C), jnp.float32)] * 4,
        interpret=interpret,
    )(_pad_rows(x, npad), _pad_rows(m, npad), *weights,
      _pad_rows(da, npad), _pad_rows(db, npad))
    dx = outs[0][:N]
    grads = [g.astype(w.dtype).reshape(w.shape)
             for g, w in zip(outs[1:], weights)]
    return (dx, jnp.zeros_like(m), *grads)


_prologue_op.defvjp(_prologue_vjp_fwd, _prologue_vjp_bwd)


# ---------------------------------------------------------------------------
# epilogue: (pair rows, prod rows) -> gate(pair) * proj(LN(prod))
# ---------------------------------------------------------------------------


def _epilogue_fwd_kernel(x_ref, p_ref, ln1s_ref, ln1b_ref, wog_ref, bog_ref,
                         ln2s_ref, ln2b_ref, wo_ref, bo_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)
    src, _, _ = _ln_f32(x, ln1s_ref, ln1b_ref)
    s = src.astype(x_ref.dtype)
    g = jax.nn.sigmoid(_dot(s, wog_ref, bog_ref))
    p = p_ref[...].astype(jnp.float32)
    t, _, _ = _ln_f32(p, ln2s_ref, ln2b_ref)
    u = _dot(t.astype(p_ref.dtype), wo_ref, bo_ref)
    out_ref[...] = (g * u).astype(out_ref.dtype)


def _epilogue_bwd_kernel(x_ref, p_ref, ln1s_ref, ln1b_ref, wog_ref, bog_ref,
                         ln2s_ref, ln2b_ref, wo_ref, bo_ref, do_ref,
                         dx_ref, dp_ref, dln1s_ref, dln1b_ref,
                         dwog_ref, dbog_ref, dln2s_ref, dln2b_ref,
                         dwo_ref, dbo_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in (dln1s_ref, dln1b_ref, dwog_ref, dbog_ref,
                  dln2s_ref, dln2b_ref, dwo_ref, dbo_ref):
            r[...] = jnp.zeros_like(r)

    cd = x_ref.dtype
    x = x_ref[...].astype(jnp.float32)
    src, xhat1, inv1 = _ln_f32(x, ln1s_ref, ln1b_ref)
    s = src.astype(cd)
    pre_g = _dot(s, wog_ref, bog_ref)
    g = jax.nn.sigmoid(pre_g)
    p = p_ref[...].astype(jnp.float32)
    t, xhat2, inv2 = _ln_f32(p, ln2s_ref, ln2b_ref)
    tc = t.astype(cd)
    u = _dot(tc, wo_ref, bo_ref)

    do = do_ref[...].astype(jnp.float32)
    du = do * g
    dpre = do * u * g * (1.0 - g)

    dsrc = _dot_t(dpre, wog_ref, cd)
    dx_ref[...] = _ln_bwd(dsrc, xhat1, inv1, ln1s_ref).astype(dx_ref.dtype)
    dln1s_ref[...] += jnp.sum(dsrc * xhat1, 0, keepdims=True)
    dln1b_ref[...] += jnp.sum(dsrc, 0, keepdims=True)
    dwog_ref[...] += _dot_acc(s, dpre, cd)
    dbog_ref[...] += jnp.sum(dpre, 0, keepdims=True)

    dt = _dot_t(du, wo_ref, cd)
    dp_ref[...] = _ln_bwd(dt, xhat2, inv2, ln2s_ref).astype(dp_ref.dtype)
    dln2s_ref[...] += jnp.sum(dt * xhat2, 0, keepdims=True)
    dln2b_ref[...] += jnp.sum(dt, 0, keepdims=True)
    dwo_ref[...] += _dot_acc(tc, du, cd)
    dbo_ref[...] += jnp.sum(du, 0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _epilogue_op(tr, interpret, x, p, ln1s, ln1b, wog, bog,
                 ln2s, ln2b, wo, bo):
    return _epilogue_fwd_call(tr, interpret, x, p, ln1s, ln1b, wog, bog,
                              ln2s, ln2b, wo, bo)


def _epilogue_fwd_call(tr, interpret, x, p, *weights):
    N, C = x.shape
    npad = pl.cdiv(N, tr) * tr
    row, mask, mat, vec = _row_specs(tr, C, 2, 10)
    wspecs = [vec, vec, mat, vec, vec, vec, mat, vec]
    out = pl.pallas_call(
        _epilogue_fwd_kernel,
        name="tri_mul_epilogue_fwd",
        grid=(npad // tr,),
        in_specs=[row, row] + wspecs,
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((npad, C), x.dtype),
        interpret=interpret,
    )(_pad_rows(x, npad), _pad_rows(p, npad), *weights)
    return out[:N]


def _epilogue_vjp_fwd(tr, interpret, x, p, *weights):
    return _epilogue_fwd_call(tr, interpret, x, p, *weights), (x, p) + weights


def _epilogue_vjp_bwd(tr, interpret, res, do):
    x, p = res[0], res[1]
    weights = res[2:]
    N, C = x.shape
    npad = pl.cdiv(N, tr) * tr
    row, mask, mat, vec = _row_specs(tr, C, 3, 10)
    wspecs = [vec, vec, mat, vec, vec, vec, mat, vec]
    acc_mat = pl.BlockSpec((C, C), lambda r: (0, 0), memory_space=pltpu.VMEM)
    acc_vec = pl.BlockSpec((1, C), lambda r: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _epilogue_bwd_kernel,
        name="tri_mul_epilogue_bwd",
        grid=(npad // tr,),
        in_specs=[row, row] + wspecs + [row],
        out_specs=[row, row, acc_vec, acc_vec, acc_mat, acc_vec,
                   acc_vec, acc_vec, acc_mat, acc_vec],
        out_shape=[jax.ShapeDtypeStruct((npad, C), x.dtype)] * 2
        + [jax.ShapeDtypeStruct((1, C), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((C, C), jnp.float32),
           jax.ShapeDtypeStruct((1, C), jnp.float32)]
        + [jax.ShapeDtypeStruct((1, C), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((C, C), jnp.float32),
           jax.ShapeDtypeStruct((1, C), jnp.float32)],
        interpret=interpret,
    )(_pad_rows(x, npad), _pad_rows(p, npad), *weights, _pad_rows(do, npad))
    dx, dp = outs[0][:N], outs[1][:N]
    grads = [g.astype(w.dtype).reshape(w.shape)
             for g, w in zip(outs[2:], weights)]
    return (dx, dp, *grads)


_epilogue_op.defvjp(_epilogue_vjp_fwd, _epilogue_vjp_bwd)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def fused_triangle_multiplication(pair, mask, params, outgoing=True,
                                  interpret=None, tile_rows=None):
    """AF2 triangle multiplicative update with fused streaming kernels.

    ``pair``: (B, L, L, C) in the compute dtype; ``mask``: (B, L) bool;
    ``params``: dict with the flax TriangleMultiplication leaves —
    ``ln_in``/``ln_out``: (scale, bias); ``a_gate``/``a_proj``/``b_gate``/
    ``b_proj``/``out_gate``/``out_proj``: (kernel, bias) — already cast to
    the compute dtype (mirroring flax Dense/LayerNorm's internal casts).

    Returns ``g * update`` of pair's shape/dtype (the caller adds the
    residual, exactly like the unfused module).  Differentiable end-to-end:
    both kernels carry fused Pallas backwards; the contraction between them
    is a plain XLA einsum (named "tri_prod" for remat_policy="tri_dots").
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, L, L2, C = pair.shape
    tr = tile_rows or _tile_rows(C, pair.dtype)
    N = B * L * L2

    def v(w):  # (C,) vectors -> (1, C) blocks
        return w.reshape(1, -1)

    ln_in_s, ln_in_b = params["ln_in"]
    x = pair.reshape(N, C)
    m2 = (mask[:, :, None] & mask[:, None, :]).astype(pair.dtype)
    a, b = _prologue_op(
        tr, interpret, x, m2.reshape(N, 1), v(ln_in_s), v(ln_in_b),
        params["a_gate"][0], v(params["a_gate"][1]),
        params["a_proj"][0], v(params["a_proj"][1]),
        params["b_gate"][0], v(params["b_gate"][1]),
        params["b_proj"][0], v(params["b_proj"][1]))
    a = a.reshape(B, L, L2, C)
    b = b.reshape(B, L, L2, C)
    eq = "bikc,bjkc->bijc" if outgoing else "bkic,bkjc->bijc"
    prod = checkpoint_name(jnp.einsum(eq, a, b), "tri_prod")

    ln_out_s, ln_out_b = params["ln_out"]
    out = _epilogue_op(
        tr, interpret, x, prod.reshape(N, C), v(ln_in_s), v(ln_in_b),
        params["out_gate"][0], v(params["out_gate"][1]),
        v(ln_out_s), v(ln_out_b),
        params["out_proj"][0], v(params["out_proj"][1]))
    return out.reshape(B, L, L2, C)
