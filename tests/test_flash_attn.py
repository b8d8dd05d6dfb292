"""Flash pair-bias attention kernel vs the jnp path.

Runs in interpreter mode on CPU (tests/conftest.py forces the cpu backend);
the compiled Mosaic path is exercised on-chip by the bench smoke lane
(bench.py) and the [attn] bench line.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protstruc_tpu.ops.flash_attn import (
    flash_pair_bias_attention,
    pair_bias_attention_reference,
)


def _inputs(B=2, L=100, H=4, dh=32, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (B, L, H, dh), dtype)
    k = jax.random.normal(ks[1], (B, L, H, dh), dtype)
    v = jax.random.normal(ks[2], (B, L, H, dh), dtype)
    bias = jax.random.normal(ks[3], (B, H, L, L), dtype)
    kmask = jax.random.bernoulli(ks[4], 0.8, (B, L))
    return q, k, v, bias, kmask


@pytest.mark.parametrize("dh", [16, 32, 64, 128])
def test_forward_matches_reference(dh):
    """Parity across head depths, incl. the wide heads (dh=64/128) users
    will try even though the bundled models pin dh=32 (VERDICT r4 #8)."""
    q, k, v, bias, kmask = _inputs(dh=dh)
    ref = pair_bias_attention_reference(q, k, v, bias, kmask)
    out = flash_pair_bias_attention(q, k, v, bias, kmask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_fully_masked_rows_are_exact_zeros():
    q, k, v, bias, kmask = _inputs()
    kmask = kmask.at[1].set(False)  # structure 1: every key invalid
    out = flash_pair_bias_attention(q, k, v, bias, kmask, interpret=True)
    assert np.all(np.asarray(out[1]) == 0.0)
    # ... and matches the jnp path's post-softmax zeroing convention
    ref = pair_bias_attention_reference(q, k, v, bias, kmask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


@pytest.mark.parametrize("dh", [16, 32, 64, 128])
def test_gradients_match_reference(dh):
    q, k, v, bias, kmask = _inputs(L=70, dh=dh)
    kmask = kmask.at[0, :3].set(False)

    def loss(fn, q, k, v, bias):
        o = fn(q, k, v, bias, kmask)
        return jnp.sum(jnp.sin(o))

    flash = lambda *a: flash_pair_bias_attention(*a, interpret=True)
    g_f = jax.grad(lambda *a: loss(flash, *a), argnums=(0, 1, 2, 3))(
        q, k, v, bias)
    g_r = jax.grad(lambda *a: loss(pair_bias_attention_reference, *a),
                   argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkvb", g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=5e-5,
            err_msg=f"grad d{name}")


def test_fully_masked_rows_have_zero_gradients():
    q, k, v, bias, kmask = _inputs(B=1, L=40)
    kmask = kmask.at[0].set(False)

    def loss(q, k, v, bias):
        o = flash_pair_bias_attention(q, k, v, bias, kmask, interpret=True)
        return jnp.sum(o * o)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a in zip("qkvb", g):
        assert np.all(np.asarray(a) == 0.0), f"grad d{name} not zero"


@pytest.mark.parametrize("tile_q,tile_k", [(64, 128), (128, 256), (8, 128)])
def test_tile_shapes(tile_q, tile_k):
    q, k, v, bias, kmask = _inputs(B=1, L=130, H=2)
    ref = pair_bias_attention_reference(q, k, v, bias, kmask)
    out = flash_pair_bias_attention(q, k, v, bias, kmask,
                                    tile_q=tile_q, tile_k=tile_k,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_explicit_bwd_tiles_override():
    """bwd_tiles= changes only the backward schedule, never the values."""
    q, k, v, bias, kmask = _inputs(L=70)

    def loss(q, k, v, bias, bwd_tiles):
        o = flash_pair_bias_attention(q, k, v, bias, kmask,
                                      bwd_tiles=bwd_tiles, interpret=True)
        return jnp.sum(jnp.sin(o))

    g_def = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias, None)
    # explicit override (clamped to pow2 <= max fwd tile, floors 16/128)
    g_ovr = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias, (48, 300))
    for name, a, b in zip("qkvb", g_def, g_ovr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=5e-6,
            err_msg=f"grad d{name}")


def test_bwd_tile_cap_shrinks_query_tile_first():
    from protstruc_tpu.ops.flash_attn import _bwd_tiles

    assert _bwd_tiles(512, 2048) == (512, 2048)   # fwd default: untouched
    assert _bwd_tiles(512, 4096) == (256, 4096)   # over cap: halve tq first
    assert _bwd_tiles(1024, 4096) == (256, 4096)  # tq to its 256 floor
    assert _bwd_tiles(256, 8192) == (256, 4096)   # ... then the key tile
    assert _bwd_tiles(128, 1024) == (128, 1024)   # under cap: untouched


def test_bwd_key_strips_match_unstripped():
    """Narrowing the in-kernel key strips changes no gradient value."""
    q, k, v, bias, kmask = _inputs(B=1, L=300, H=2, dh=16)
    kmask = kmask.at[0, -7:].set(False)

    def grads(sub_k):
        def loss(q, k, v, bias):
            o = flash_pair_bias_attention(
                q, k, v, bias, kmask, tile_q=64, tile_k=512,
                bwd_tiles=(64, 512, sub_k), interpret=True)
            return jnp.sum(jnp.sin(o))
        return jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)

    g_whole = grads(512)   # one whole strip
    g_strip = grads(128)   # 4 strips
    for name, a, b in zip("qkvb", g_whole, g_strip):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6,
            err_msg=f"grad d{name}")


def test_bwd_tiles_validation():
    q, k, v, bias, kmask = _inputs(B=1, L=40, H=2)
    for bad in [(0, 512), (64,), (64, 512, 128, 1), (64, -512), (64, 2.0)]:
        with pytest.raises(ValueError, match="bwd_tiles"):
            flash_pair_bias_attention(q, k, v, bias, kmask,
                                      bwd_tiles=bad, interpret=True)
    # numpy integer types are accepted and coerced (np ints lack
    # bit_length and would poison the lru_cache keys)
    out = flash_pair_bias_attention(
        q, k, v, bias, kmask,
        bwd_tiles=(np.int64(64), np.int32(512)), interpret=True)
    assert out.shape == q.shape


def test_bfloat16_inputs():
    q, k, v, bias, kmask = _inputs(dtype=jnp.bfloat16, L=64)
    out = flash_pair_bias_attention(q, k, v, bias, kmask, interpret=True)
    assert out.dtype == jnp.bfloat16
    # f32 in-kernel accumulation: compare against the f32 reference on the
    # upcast inputs at bf16 output resolution
    ref = pair_bias_attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), bias.astype(jnp.float32), kmask)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=0, atol=2e-2)


def test_trfold_flash_path_matches_jnp_path():
    """Model-level A/B: same params, flash on/off, same outputs.

    The flash path reuses the exact same qkv/pair_bias/out projections, so
    checkpoints trained either way load interchangeably — this test pins
    both the numerics and the param-tree invariance.
    """
    from protstruc_tpu.models.trfold import (
        TrFold, TrFoldConfig, featurize_from_sequence)

    kw = dict(node_dim=32, pair_dim=16, n_heads=2, n_blocks=1)
    cfg = TrFoldConfig(**kw)
    cfg_flash = TrFoldConfig(use_flash_attn=True, **kw)
    seq_idx = jax.random.randint(jax.random.PRNGKey(1), (1, 24), 0, 20)
    feats = featurize_from_sequence(seq_idx)
    params = TrFold(cfg).init(jax.random.PRNGKey(0), feats)
    params_flash = TrFold(cfg_flash).init(jax.random.PRNGKey(0), feats)
    assert jax.tree.structure(params) == jax.tree.structure(params_flash)
    out_jnp = TrFold(cfg).apply(params, feats)
    out_flash = TrFold(cfg_flash).apply(params, feats)
    for key in out_jnp:
        np.testing.assert_allclose(
            np.asarray(out_flash[key]), np.asarray(out_jnp[key]),
            rtol=0, atol=1e-4, err_msg=key)


def test_mesh_dp_tp_sharding():
    """custom_partitioning: the kernel shards over batch (dp) and heads
    (tp) under GSPMD — outputs match the jnp path and stay sharded (no
    silent all-gather onto one device)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from protstruc_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, axis_shapes=(4, 1, 2))
    B, L, H, dh = 4, 64, 4, 16
    q, k, v, bias, kmask = _inputs(B=B, L=L, H=H, dh=dh)

    qs = NamedSharding(mesh, P("dp", None, "tp", None))
    bs = NamedSharding(mesh, P("dp", "tp", None, None))
    ms = NamedSharding(mesh, P("dp", None))
    qd, kd, vd = (jax.device_put(x, qs) for x in (q, k, v))
    biasd = jax.device_put(bias, bs)
    kmaskd = jax.device_put(kmask, ms)

    @jax.jit
    def fwd(q, k, v, bias, kmask):
        return flash_pair_bias_attention(q, k, v, bias, kmask,
                                         interpret=True)

    out = fwd(qd, kd, vd, biasd, kmaskd)
    ref = pair_bias_attention_reference(q, k, v, bias, kmask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)
    # output keeps the dp/tp sharding the partition rule declares
    spec = out.sharding.spec
    assert tuple(spec)[:3] in ((("dp",), None, ("tp",)), ("dp", None, "tp")), spec

    # gradients flow through the partitioned backward kernel
    def loss(q, k, v, bias):
        o = flash_pair_bias_attention(q, k, v, bias, kmaskd, interpret=True)
        return jnp.sum(jnp.sin(o))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(qd, kd, vd, biasd)
    g_ref = jax.grad(
        lambda q, k, v, bias: jnp.sum(jnp.sin(
            pair_bias_attention_reference(q, k, v, bias, kmask))),
        argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkvb", g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5,
                                   err_msg=f"grad d{name}")


def test_extra_mask_flash_matches_jnp_path():
    """AR-decoder masking through the flash path: extra_mask folds into the
    bias; rows with no allowed key output zeros, like the jnp path."""
    from protstruc_tpu.models.trfold import PairBiasAttention, TrFoldConfig

    kw = dict(node_dim=32, pair_dim=16, n_heads=2, n_blocks=1)
    B, L = 1, 20
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    node = jax.random.normal(ks[0], (B, L, 32))
    pair = jax.random.normal(ks[1], (B, L, L, 16))
    mask = jnp.ones((B, L), bool).at[0, -2:].set(False)
    # causal decode-order mask; row 0 has NO allowed key (strict causal)
    order = jnp.arange(L)
    extra = (order[None, :, None] > order[None, None, :])

    attn = PairBiasAttention(TrFoldConfig(**kw))
    attn_flash = PairBiasAttention(TrFoldConfig(use_flash_attn=True, **kw))
    params = attn.init(jax.random.PRNGKey(0), node, pair, mask,
                       extra_mask=extra)

    def run(module, params, node, pair):
        return module.apply(params, node, pair, mask, extra_mask=extra)

    out_jnp = run(attn, params, node, pair)
    out_flash = run(attn_flash, params, node, pair)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_jnp),
                               rtol=0, atol=2e-5)

    # gradients agree too (incl. zero flow through the no-key row)
    g_jnp = jax.grad(lambda n: jnp.sum(jnp.sin(run(attn, params, n, pair))))(node)
    g_flash = jax.grad(
        lambda n: jnp.sum(jnp.sin(run(attn_flash, params, n, pair))))(node)
    np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_jnp),
                               rtol=0, atol=5e-5)
