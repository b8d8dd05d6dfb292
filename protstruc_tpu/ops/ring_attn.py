"""Ring flash attention — sequence-parallel fused pair-bias attention.

Extends the fused flash kernel (ops/flash_attn.py) past one device's
residue axis.  Under a mesh with a sequence-parallel axis, a flash kernel
needs every key for each query row's online softmax, so naive sp sharding
would all-gather k/v *and* the ``(B, H, L, L)`` bias — defeating the
point.  Ring attention keeps everything sharded:

* q / k / v shard their residue axis (each device holds an ``L/sp``
  block); the bias shards its QUERY axis, so each device holds the full
  key row-block for its own queries — ``O(L^2/sp)`` HBM per device, the
  same scaling as the sp-sharded jnp path but without ever materializing
  the ``(B, H, Lq, L)`` probabilities;
* k/v (and the key-validity mask) rotate around the ring via
  ``lax.ppermute`` over ICI — ``sp`` steps of ``(B, L/sp, H, dh)``
  exchanges, negligible next to the attention FLOPs;
* each visiting block is attended with the lse-returning flash kernel
  (:func:`flash_pair_bias_attention_lse`) and merged into a running
  ``(out, logsumexp)`` pair — the standard online-softmax merge, so the
  result is bitwise-independent of the visit order up to float
  reassociation.

This is the Ring Attention construction (Liu et al. 2023, arXiv
2310.01889) rebuilt TPU-first on shard_map + the Pallas flash kernel.
The reference package has no attention or distributed runtime at all
(SURVEY.md §2/§5) — this serves the rebuild's model stack under sequence
parallelism, closing the documented "flash rejects sp>1" gap
(ops/flash_attn.py module docstring, train.py mesh guard).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from protstruc_tpu.ops.flash_attn import flash_pair_bias_attention_lse

__all__ = ["ring_pair_bias_attention", "ring_attention_sharded"]


def _local_attention_lse(q, k_s, v_s, b_s, kmask_s, local,
                         tile_q, tile_k, interpret):
    """One (queries x visiting-key-block) attention -> (out, lse).

    ``local="flash"`` runs the Pallas kernel; ``local="jnp"`` is the plain
    formulation (materializes only the (B, H, Lq, Lk_block) logits — 1/sp
    of the full map, freed every ring step).  Both return lse = -inf on
    rows with no valid key in this block.
    """
    kmask_b = kmask_s > 0  # carried as f32 (ppermute-friendly) -> bool
    if local == "flash":
        return flash_pair_bias_attention_lse(
            q, k_s, v_s, b_s, kmask_b, tile_q=tile_q, tile_k=tile_k,
            interpret=interpret)

    dh = q.shape[-1]
    logits = jnp.einsum(
        "blhd,bmhd->bhlm", q, k_s,
        preferred_element_type=jnp.float32,
    ) / (dh ** 0.5) + b_s.astype(jnp.float32)
    allowed = kmask_b[:, None, None, :]
    s = jnp.where(allowed, logits, -1e30)
    m = jnp.max(s, axis=-1)                                   # (B, H, Lq)
    p = jnp.where(allowed, jnp.exp(s - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)                                   # (B, H, Lq)
    has = l > 0.0
    out = jnp.einsum(
        "bhlm,bmhd->blhd", p, v_s.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) / jnp.moveaxis(jnp.where(has, l, 1.0), 1, 2)[..., None]
    out = jnp.where(jnp.moveaxis(has, 1, 2)[..., None], out, 0.0)
    lse = jnp.where(has, m + jnp.log(jnp.where(has, l, 1.0)), -jnp.inf)
    return out.astype(q.dtype), lse


def ring_pair_bias_attention(q, k, v, bias, kmask, *,
                             axis_name: str = "sp",
                             local: Optional[str] = None,
                             tile_q: int = 512, tile_k: int = 2048,
                             interpret: Optional[bool] = None):
    """Per-shard ring attention — call INSIDE ``shard_map``.

    Args (all device-local blocks of the globally sharded operands):
      q, k, v: ``(B, Lq, H, dh)`` — this device's residue block
        (``Lq = L / sp``); q stays put, k/v rotate.
      bias: ``(B, H, Lq, L)`` — the full key rows for the local queries
        (the global ``(B, H, L, L)`` bias sharded over its query axis).
      kmask: ``(B, Lq)`` bool — validity of the LOCAL key block.
      axis_name: the mesh axis to ring over.
      local: ``"flash"`` (Pallas kernel) or ``"jnp"``; default flash on
        TPU, jnp elsewhere.
      tile_q / tile_k / interpret: forwarded to the flash kernel.

    Returns ``(B, Lq, H, dh)`` in the dtype of ``q``.  Fully-masked query
    rows (no valid key anywhere in the ring) return zeros with zero
    gradients, matching flash_pair_bias_attention.  Differentiable; the
    backward pass re-runs the ring in reverse (scan transpose) with
    ``ppermute`` transposed automatically.
    """
    B, Lq, H, dh = q.shape
    L = bias.shape[-1]
    if L % Lq:
        raise ValueError(
            f"global key length {L} must be a multiple of the local block "
            f"{Lq} (pad L to the sp axis before sharding)")
    n = L // Lq
    if local is None:
        local = "flash" if jax.default_backend() == "tpu" else "jnp"

    idx = jax.lax.axis_index(axis_name)
    # receive from the right neighbor: after t steps device i holds the
    # k/v block originally sharded onto device (i + t) mod n
    perm = [(j, (j - 1) % n) for j in range(n)]

    def attend_merge(acc, lse_tot, k_s, v_s, km_s, t):
        src = (idx + t) % n
        b_s = jax.lax.dynamic_slice(
            bias, (0, 0, 0, src * Lq), (B, H, Lq, Lq))
        out_s, lse_s = _local_attention_lse(
            q, k_s, v_s, b_s, km_s, local, tile_q, tile_k, interpret)

        # online-softmax merge of (acc, lse_tot) with the new block.
        # -inf is the empty element: logaddexp(-inf, x) = x, and the
        # where-guarded `safe` keeps exp() arguments finite (-inf - -inf
        # would be NaN) — exp(-inf - 0) = 0 re-derives the empty weight.
        new = jnp.logaddexp(lse_tot, lse_s)
        safe = jnp.where(jnp.isfinite(new), new, 0.0)
        w_prev = jnp.moveaxis(jnp.exp(lse_tot - safe), 1, 2)[..., None]
        w_new = jnp.moveaxis(jnp.exp(lse_s - safe), 1, 2)[..., None]
        return acc * w_prev + out_s.astype(jnp.float32) * w_new, new

    def step(carry, t):
        acc, lse_tot, k_s, v_s, km_s = carry
        # Issue the rotation BEFORE the attend: the ppermutes and the
        # attention read the same k/v block but neither depends on the
        # other's result, so XLA legally splits each collective-permute
        # into an async start/done pair and the latency-hiding scheduler
        # overlaps the ICI transfer with the flash kernel on block t —
        # the standard compute/communication double-buffer, expressed
        # through the scan carry (next block arrives while the current
        # one is attended).  Putting the starts first in program order
        # makes that schedule the natural one instead of asking the
        # scheduler to hoist them over the kernel call.  The pipeline
        # depth is inherently one hop: ppermute(t+1) consumes
        # ppermute(t)'s output, so deeper prefetch would need split
        # blocks, paying merge complexity for the same ICI bytes.
        # (Design-correctness structure — single-chip hardware here
        # cannot measure the overlap; values are order-independent.)
        k_n = jax.lax.ppermute(k_s, axis_name, perm)
        v_n = jax.lax.ppermute(v_s, axis_name, perm)
        km_n = jax.lax.ppermute(km_s, axis_name, perm)
        acc, lse_tot = attend_merge(acc, lse_tot, k_s, v_s, km_s, t)
        return (acc, lse_tot, k_n, v_n, km_n), None

    acc0 = jnp.zeros((B, Lq, H, dh), jnp.float32)
    lse0 = jnp.full((B, H, Lq), -jnp.inf, jnp.float32)
    kmaskf = kmask.astype(jnp.float32)  # bools don't ride ppermute
    carry = (acc0, lse0, k, v, kmaskf)
    if n > 1:
        # scan covers steps 0..n-2 (each ends with a rotation); the last
        # visiting block is attended outside so its rotation — whose
        # result nobody reads, forward or transposed backward — is never
        # emitted (n-1 ICI exchanges per call, not n)
        carry, _ = jax.lax.scan(step, carry, jnp.arange(n - 1))
    acc, lse_tot, k_s, v_s, km_s = carry
    acc, _ = attend_merge(acc, lse_tot, k_s, v_s, km_s, n - 1)
    return acc.astype(q.dtype)


@functools.lru_cache(maxsize=None)
def _ring_sharded_fn(mesh: Mesh, axis: str, batch_axis: Optional[str],
                     head_axis: Optional[str], local: Optional[str],
                     tile_q: int, tile_k: int, interpret: Optional[bool]):
    qspec = P(batch_axis, axis, head_axis, None)
    fn = shard_map(
        functools.partial(
            ring_pair_bias_attention, axis_name=axis, local=local,
            tile_q=tile_q, tile_k=tile_k, interpret=interpret),
        mesh=mesh,
        in_specs=(qspec, qspec, qspec,
                  P(batch_axis, head_axis, axis, None),  # bias: query rows
                  P(batch_axis, axis)),                  # kmask: key blocks
        out_specs=qspec,
        check_vma=False,
    )
    return fn


def ring_attention_sharded(q, k, v, bias, kmask, mesh: Mesh, *,
                           axis: str = "sp",
                           batch_axis: Optional[str] = "dp",
                           head_axis: Optional[str] = "tp",
                           local: Optional[str] = None,
                           tile_q: int = 512, tile_k: int = 2048,
                           interpret: Optional[bool] = None):
    """Ring attention over GLOBAL arrays: the shard_map wrapper.

    Same argument shapes/semantics as
    :func:`~protstruc_tpu.ops.flash_attn.flash_pair_bias_attention`
    (q/k/v ``(B, L, H, dh)``, bias ``(B, H, L, L)``, kmask ``(B, L)``)
    but sharded over ``mesh``: batch over ``batch_axis``, heads over
    ``head_axis``, the residue axis ringed over ``axis``.  ``L`` must be
    divisible by the ``axis`` size (the training buckets already enforce
    this), ``B`` by ``batch_axis`` and ``H`` by ``head_axis``.  Composes
    with an enclosing ``jit``: GSPMD reshards operands to the declared
    specs at the shard_map boundary.
    """
    fn = _ring_sharded_fn(mesh, axis, batch_axis, head_axis, local,
                          tile_q, tile_k, interpret)
    return fn(q, k, v, bias, kmask)
