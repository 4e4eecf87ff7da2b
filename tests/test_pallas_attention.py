import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu.ops.attention import causal_mask, dot_product_attention
from ofasys_tpu.ops.pallas_attention import (
    MASK_VALUE,
    flash_attention,
    flash_attention_with_lse,
    flash_supported,
)


def rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("with_bias", [False, True])
@pytest.mark.parametrize("with_mask", [False, True])
def test_flash_matches_xla(causal, with_bias, with_mask):
    B, Tq, Tk, H, D = 2, 128, 128, 4, 64
    q, k, v = rand((B, Tq, H, D), 0), rand((B, Tk, H, D), 1), rand((B, Tk, H, D), 2)
    bias = rand((1, H, Tq, Tk), 3) * 0.5 if with_bias else None
    mask = None
    keep = None
    if with_mask:
        keep = jnp.asarray(np.random.default_rng(0).random((B, Tk)) > 0.2)
        mask = keep[:, None, None, :]
    ref_mask = mask
    if causal:
        cm = causal_mask(Tq, Tk)
        ref_mask = cm if ref_mask is None else jnp.logical_and(ref_mask, cm)
    ref = dot_product_attention(q, k, v, bias=bias, mask=ref_mask, scale=0.125)
    out = flash_attention(q, k, v, bias=bias, mask=mask, scale=0.125, causal=causal)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=5e-3, atol=5e-3)


def test_flash_multiblock():
    B, T, H, D = 1, 384, 2, 64
    q, k, v = rand((B, T, H, D), 0), rand((B, T, H, D), 1), rand((B, T, H, D), 2)
    ref = dot_product_attention(q, k, v, scale=0.1, mask=causal_mask(T, T))
    out = flash_attention(q, k, v, scale=0.1, causal=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=5e-3, atol=5e-3)


def test_flash_gradients_match():
    B, T, H, D = 1, 128, 2, 32
    q, k, v = rand((B, T, H, D), 0), rand((B, T, H, D), 1), rand((B, T, H, D), 2)
    bias = rand((1, H, T, T), 3) * 0.1

    def loss_flash(q, k, v, bias):
        return flash_attention(q, k, v, bias=bias, scale=0.2, causal=True).sum()

    def loss_ref(q, k, v, bias):
        return dot_product_attention(q, k, v, bias=bias, mask=causal_mask(T, T), scale=0.2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("T", [640, 768])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_partial_final_kblock(T, causal):
    """Tk > block_k but not a multiple of it: the kernel must mask padded
    key columns of the partial final k-block (regression: padded garbage
    entered the online softmax and produced NaN)."""
    B, H, D = 2, 2, 64
    q, k, v = rand((B, T, H, D), 0), rand((B, T, H, D), 1), rand((B, T, H, D), 2)
    bias = rand((1, H, T, T), 3) * 0.5
    keep = jnp.asarray(np.random.default_rng(0).random((B, T)) > 0.2).at[:, 0].set(True)
    mask = keep[:, None, None, :]
    ref_mask = jnp.logical_and(mask, causal_mask(T, T)) if causal else mask
    ref = dot_product_attention(q, k, v, bias=bias, mask=ref_mask, scale=0.125)
    out = flash_attention(q, k, v, bias=bias, mask=mask, scale=0.125, causal=causal)
    assert not bool(jnp.any(jnp.isnan(out)))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=5e-3, atol=5e-3)


def test_flash_supported_gate():
    assert flash_supported(512, 512, 64, 0.0)
    assert not flash_supported(512, 512, 64, 0.1)   # dropout -> XLA path
    assert flash_supported(1000, 1000, 64, 0.0)     # ragged: pad/slice wrapper
    assert flash_supported(100, 300, 64, 0.0)
    assert not flash_supported(196, 196, 64, 0.0)   # short: XLA fwd+bwd wins


@pytest.mark.parametrize("shape", [(196, 196), (120, 120), (64, 64), (24, 196), (100, 130)])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_ragged_short_sequences(shape, causal):
    """The multi-task encoder mix runs T=196/120/64 (none tile-aligned):
    the pad/slice wrapper must tile-align queries/keys and mask the
    padding. Causal only applies to the square self-attention shapes."""
    Tq, Tk = shape
    if causal and Tq != Tk:
        pytest.skip("causal is self-attention only (start-aligned)")
    B, H, D = 2, 4, 64
    q, k, v = rand((B, Tq, H, D), 0), rand((B, Tk, H, D), 1), rand((B, Tk, H, D), 2)
    bias = rand((1, H, Tq, Tk), 3) * 0.5
    keep = jnp.asarray(np.random.default_rng(0).random((B, Tk)) > 0.2).at[:, 0].set(True)
    mask = keep[:, None, None, :]
    ref_mask = jnp.logical_and(mask, causal_mask(Tq, Tk)) if causal else mask
    ref = dot_product_attention(q, k, v, bias=bias, mask=ref_mask, scale=0.125)
    out = flash_attention(q, k, v, bias=bias, mask=mask, scale=0.125, causal=causal)
    assert out.shape == (B, Tq, H, D)
    assert not bool(jnp.any(jnp.isnan(out)))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=5e-3, atol=5e-3)


def test_flash_gradients_causal_multiblock_bias():
    """T > block size with causal: upper-diagonal tiles are skipped in the
    backward grid — their dS output blocks must still be zeroed or the
    bias gradient reads uninitialized memory."""
    B, T, H, D = 1, 640, 2, 32
    q, k, v = rand((B, T, H, D), 0), rand((B, T, H, D), 1), rand((B, T, H, D), 2)
    bias = rand((1, H, T, T), 3) * 0.1

    def loss_flash(q, k, v, bias):
        return (flash_attention(q, k, v, bias=bias, scale=0.2, causal=True) ** 2).sum()

    def loss_ref(q, k, v, bias):
        return (dot_product_attention(q, k, v, bias=bias, mask=causal_mask(T, T), scale=0.2) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gr):
        assert not bool(jnp.any(jnp.isnan(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_flash_gradients_shared_bias_batched():
    """B>1 with a (1,H,T,T) bias exercises the backward's dS batch-reduce
    (dbias = sum_b dS); plus a padding mask in the gradient path."""
    B, T, H, D = 3, 128, 2, 32
    q, k, v = rand((B, T, H, D), 0), rand((B, T, H, D), 1), rand((B, T, H, D), 2)
    bias = rand((1, H, T, T), 3) * 0.1
    keep = jnp.asarray(np.random.default_rng(1).random((B, T)) > 0.3).at[:, 0].set(True)
    mask = keep[:, None, None, :]

    def loss_flash(q, k, v, bias):
        return (flash_attention(q, k, v, bias=bias, mask=mask, scale=0.2) ** 2).sum()

    def loss_ref(q, k, v, bias):
        return (dot_product_attention(q, k, v, bias=bias, mask=mask, scale=0.2) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gr):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def _xla_out_lse(q, k, v, bias, mask, scale, causal):
    """fp32 (out, lse) reference on flat (BH, T, D) operands."""
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    if bias is not None:
        b = bias if bias.shape[0] == q.shape[0] else jnp.tile(bias, (q.shape[0] // bias.shape[0], 1, 1))
        s = s + b.astype(jnp.float32)
    if mask is not None:
        s = jnp.where(mask != 0, s, MASK_VALUE)
    if causal:
        Tq, Tk = s.shape[-2:]
        s = jnp.where(jnp.arange(Tk)[None, :] <= jnp.arange(Tq)[:, None] + (Tk - Tq), s, MASK_VALUE)
    lse = jax.nn.logsumexp(s, axis=-1, keepdims=True)
    o = jnp.einsum("bqk,bkd->bqd", jnp.exp(s - lse), v.astype(jnp.float32))
    return o.astype(q.dtype), lse


@pytest.mark.parametrize("causal", [False, True])
def test_flash_with_lse_forward_and_grads(causal):
    """flash_attention_with_lse must return the true logsumexp AND
    propagate the lse cotangent (ds += g_lse * p) — the contract ring
    attention's differentiable online merge depends on."""
    BH, T, D = 4, 128, 32
    H = 2
    q, k, v = rand((BH, T, D), 0), rand((BH, T, D), 1), rand((BH, T, D), 2)
    bias = rand((H, T, T), 3) * 0.3
    go, gl = rand((BH, T, D), 4), rand((BH, T, 1), 5)

    out, lse = flash_attention_with_lse(q, k, v, bias, None, 0.2, causal)
    ref_out, ref_lse = _xla_out_lse(q, k, v, bias, None, 0.2, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), rtol=1e-5, atol=1e-5)

    def loss(f):
        def inner(q, k, v, bias):
            o, l = f(q, k, v, bias, None, 0.2, causal)
            return (o.astype(jnp.float32) * go).sum() + (l * gl).sum()
        return inner

    gf = jax.grad(loss(flash_attention_with_lse), argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss(_xla_out_lse), argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_flash_ragged_gradients_match():
    B, Tq, H, D = 1, 100, 2, 32
    q, k, v = rand((B, Tq, H, D), 0), rand((B, Tq, H, D), 1), rand((B, Tq, H, D), 2)
    bias = rand((1, H, Tq, Tq), 3) * 0.1

    def loss_flash(q, k, v, bias):
        return flash_attention(q, k, v, bias=bias, scale=0.2, causal=True).sum()

    def loss_ref(q, k, v, bias):
        return dot_product_attention(q, k, v, bias=bias, mask=causal_mask(Tq, Tq), scale=0.2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_flash_causal_clamp_ragged_multiblock(monkeypatch):
    """Round-5 causal DMA clamp: with Bq != Bk and a ragged last q-block
    (T not a block multiple), the clamped k/v/bias index maps must stay in
    range (the n_k-1 bound) and preserve exact parity, fwd + grads."""
    monkeypatch.setenv("OFASYS_FLASH_BQ", "1024")
    monkeypatch.setenv("OFASYS_FLASH_BK", "512")
    monkeypatch.setenv("OFASYS_FLASH_BQ_BWD", "512")
    monkeypatch.setenv("OFASYS_FLASH_BK_BWD", "1024")
    B, T, H, D = 1, 1536, 1, 32
    q, k, v = rand((B, T, H, D), 0), rand((B, T, H, D), 1), rand((B, T, H, D), 2)
    mask = jnp.ones((B, 1, 1, T), bool).at[:, :, :, -17:].set(False)

    out = flash_attention(q, k, v, mask=mask, scale=0.2, causal=True)
    ref = dot_product_attention(
        q, k, v, mask=jnp.logical_and(mask, causal_mask(T, T)), scale=0.2
    )
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2)

    def loss(f):
        def g(q, k, v):
            return f(q, k, v).astype(jnp.float32).sum()
        return g

    gf = jax.grad(loss(lambda q, k, v: flash_attention(
        q, k, v, mask=mask, scale=0.2, causal=True)), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(lambda q, k, v: dot_product_attention(
        q, k, v, mask=jnp.logical_and(mask, causal_mask(T, T)), scale=0.2)),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_bhtd_layout_matches(causal):
    """layout='bhtd' (kernel-native (B,H,T,D) IO, no standalone relayout)
    is numerically identical to the default layout, fwd + grads, including
    the pad/slice path (ragged T)."""
    B, T, H, D = 2, 200, 3, 32     # ragged: exercises the bhtd pad path
    q, k, v = rand((B, T, H, D), 0), rand((B, T, H, D), 1), rand((B, T, H, D), 2)
    mask = jnp.ones((B, 1, 1, T), bool).at[:, :, :, -9:].set(False)

    ref = flash_attention(q, k, v, mask=mask, scale=0.2, causal=causal)
    out = flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        mask=mask, scale=0.2, causal=causal, layout="bhtd",
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda q, k, v: fn(q, k, v).astype(jnp.float32).sum()

    g_ref = jax.grad(loss(lambda q, k, v: flash_attention(
        q, k, v, mask=mask, scale=0.2, causal=causal)), argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss(lambda q, k, v: flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        mask=mask, scale=0.2, causal=causal, layout="bhtd",
    ).transpose(0, 2, 1, 3)), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-5)
