"""Ring attention (ops/ring_attn.py) vs the global jnp reference.

Runs on the 8-virtual-device CPU mesh (tests/conftest.py).  Both local
modes are exercised: "jnp" (plain per-block math) and "flash" (the
lse-returning Pallas kernel in interpret mode).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from protstruc_tpu.ops.flash_attn import (
    flash_pair_bias_attention_lse,
    pair_bias_attention_reference,
)
from protstruc_tpu.ops.ring_attn import ring_attention_sharded


def _inputs(B=2, L=64, H=2, dh=8, seed=0, dtype=jnp.float32, n_valid=None):
    rng = np.random.default_rng(seed)
    q, k, v = (jnp.asarray(rng.normal(size=(B, L, H, dh)), dtype)
               for _ in range(3))
    bias = jnp.asarray(rng.normal(size=(B, H, L, L)), dtype)
    valid = np.ones((B, L), bool)
    if n_valid is not None:
        valid[:] = np.arange(L) < n_valid
    return q, k, v, bias, jnp.asarray(valid)


def _sp_mesh(sp=4):
    devs = np.array(jax.devices()[: 2 * sp]).reshape(2, sp, 1)
    return Mesh(devs, ("dp", "sp", "tp"))


class TestLseEntryPoint:
    def test_lse_matches_manual(self):
        q, k, v, bias, kmask = _inputs(n_valid=50)
        out, lse = flash_pair_bias_attention_lse(q, k, v, bias, kmask,
                                                 interpret=True)
        ref = pair_bias_attention_reference(q, k, v, bias, kmask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=2e-5)
        dh = q.shape[-1]
        logits = (jnp.einsum("blhd,bmhd->bhlm", q, k) / np.sqrt(dh) + bias)
        logits = jnp.where(kmask[:, None, None, :], logits, -jnp.inf)
        want = jax.nn.logsumexp(logits, axis=-1)
        np.testing.assert_allclose(np.asarray(lse), np.asarray(want),
                                   rtol=0, atol=2e-5)

    def test_fully_masked_rows_lse_neg_inf(self):
        q, k, v, bias, kmask = _inputs(B=1)
        kmask = jnp.zeros_like(kmask)
        out, lse = flash_pair_bias_attention_lse(q, k, v, bias, kmask,
                                                 interpret=True)
        assert np.all(np.asarray(out) == 0.0)
        assert np.all(np.isneginf(np.asarray(lse)))

    def test_lse_cotangent_flows(self):
        """The merge weights differentiate through lse: grads of a function
        of BOTH outputs must match the autodiff of the plain formulation."""
        q, k, v, bias, kmask = _inputs(B=1, L=32, n_valid=30)

        def f_flash(q, k, v, bias):
            out, lse = flash_pair_bias_attention_lse(q, k, v, bias, kmask,
                                                     interpret=True)
            return jnp.sum(out ** 2) + jnp.sum(
                jnp.where(jnp.isfinite(lse), lse, 0.0) ** 2)

        def f_ref(q, k, v, bias):
            dh = q.shape[-1]
            logits = (jnp.einsum("blhd,bmhd->bhlm", q, k) / np.sqrt(dh)
                      + bias)
            logits = jnp.where(kmask[:, None, None, :], logits, -jnp.inf)
            lse = jax.nn.logsumexp(logits, axis=-1)
            out = pair_bias_attention_reference(q, k, v, bias, kmask)
            return jnp.sum(out ** 2) + jnp.sum(
                jnp.where(jnp.isfinite(lse), lse, 0.0) ** 2)

        g_flash = jax.grad(f_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for name, a, b in zip("qkvb", g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=5e-5,
                                       err_msg=f"d{name}")


@pytest.mark.parametrize("local", ["jnp", "flash"])
class TestRingAttention:
    def test_matches_global_reference(self, local):
        q, k, v, bias, kmask = _inputs(n_valid=57)
        mesh = _sp_mesh(sp=4)
        out = ring_attention_sharded(q, k, v, bias, kmask, mesh,
                                     local=local, interpret=True)
        ref = pair_bias_attention_reference(q, k, v, bias, kmask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=3e-5)

    def test_gradients_match_global(self, local):
        q, k, v, bias, kmask = _inputs(B=2, L=32, n_valid=29)
        mesh = _sp_mesh(sp=4)

        def loss_ring(q, k, v, bias):
            o = ring_attention_sharded(q, k, v, bias, kmask, mesh,
                                       local=local, interpret=True)
            return jnp.sum(o ** 2)

        def loss_ref(q, k, v, bias):
            o = pair_bias_attention_reference(q, k, v, bias, kmask)
            return jnp.sum(o ** 2)

        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for name, a, b in zip("qkvb", g_ring, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=5e-5,
                                       err_msg=f"d{name}")

    def test_fully_masked_rows_zero(self, local):
        q, k, v, bias, kmask = _inputs(B=2, L=32)
        kmask = jnp.zeros_like(kmask)
        mesh = _sp_mesh(sp=4)
        out = ring_attention_sharded(q, k, v, bias, kmask, mesh,
                                     local=local, interpret=True)
        assert np.all(np.asarray(out) == 0.0)

    def test_one_shard_fully_masked(self, local):
        """A ring block with zero valid keys must be a no-op in the merge
        (its lse = -inf), not a NaN source."""
        q, k, v, bias, kmask = _inputs(B=2, L=64)
        valid = np.ones((2, 64), bool)
        valid[:, 16:32] = False  # exactly shard 1 of sp=4
        kmask = jnp.asarray(valid)
        mesh = _sp_mesh(sp=4)
        out = ring_attention_sharded(q, k, v, bias, kmask, mesh,
                                     local=local, interpret=True)
        ref = pair_bias_attention_reference(q, k, v, bias, kmask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=3e-5)

    def test_under_jit(self, local):
        q, k, v, bias, kmask = _inputs(B=2, L=32)
        mesh = _sp_mesh(sp=4)

        @jax.jit
        def f(q, k, v, bias):
            return ring_attention_sharded(q, k, v, bias, kmask, mesh,
                                          local=local, interpret=True)

        out = f(q, k, v, bias)
        ref = pair_bias_attention_reference(q, k, v, bias, kmask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=3e-5)


def test_ring_bfloat16():
    q, k, v, bias, kmask = _inputs(L=32, dtype=jnp.bfloat16)
    mesh = _sp_mesh(sp=4)
    out = ring_attention_sharded(q, k, v, bias, kmask, mesh,
                                 local="jnp", interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = pair_bias_attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), bias.astype(jnp.float32), kmask)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), rtol=0, atol=3e-2)


def test_ring_with_folded_extra_mask_matches_jnp():
    """The AR decoder folds its causal mask into the bias as -1e9 (see
    models/trfold.py PairBiasAttention): the ring path must reproduce the
    jnp extra-mask semantics through the same folding, including the
    post-zeroed rows whose every key is causally disallowed."""
    import jax.numpy as jnp

    q, k, v, bias, kmask = _inputs(B=2, L=32, n_valid=None)
    L = 32
    causal = jnp.tril(jnp.ones((L, L), bool), k=-1)[None]  # row 0: no keys
    fbias = bias + jnp.where(causal[:, None], 0.0, -1e9)
    mesh = _sp_mesh(sp=4)
    out = ring_attention_sharded(q, k, v, fbias, kmask, mesh,
                                 local="jnp", interpret=True)
    row_ok = jnp.any(causal & kmask[:, None, :], axis=-1)
    out = jnp.where(row_ok[:, :, None, None], out, 0.0)

    # jnp reference with the explicit extra mask
    dh = q.shape[-1]
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k) / np.sqrt(dh) + bias
    allowed = kmask[:, None, None, :] & causal[:, None]
    logits = jnp.where(allowed, logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    attn = jnp.where(allowed, attn, 0.0)
    ref = jnp.einsum("bhlm,bmhd->blhd", attn, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=3e-5)
