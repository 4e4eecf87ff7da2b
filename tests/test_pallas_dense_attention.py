"""Parity tests for the short-sequence fused attention kernel
(ofasys_tpu/ops/pallas_dense_attention.py) — interpret mode on CPU.

Forward AND gradients (dq/dk/dv and the batch-accumulated shared-bias
gradient) must match the XLA dense path, the same contract the flash
kernel is held to (test_pallas_attention.py). This is the kernel the
model's attn_kernel='auto' dispatches training-shape calls to on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu.ops.attention import causal_mask, dot_product_attention
from ofasys_tpu.ops.pallas_dense_attention import dense_attention, dense_supported


def rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def _ref(q, k, v, bias, mask, scale, causal):
    eff = mask
    if causal:
        cm = causal_mask(q.shape[1], k.shape[1])
        eff = cm if eff is None else jnp.logical_and(eff, cm)
    # the kernel adds a bf16-rounded bias (halved HBM reads); round the
    # reference's bias identically so comparisons isolate the kernel math
    b = bias.astype(jnp.bfloat16).astype(jnp.float32) if bias is not None else None
    return dot_product_attention(q, k, v, bias=b, mask=eff, scale=scale)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("with_bias", [False, True])
@pytest.mark.parametrize("with_mask", [False, True])
def test_forward_matches_xla(causal, with_bias, with_mask):
    B, Tq, Tk, H, D = 3, 48, 48, 4, 64
    q, k, v = rand((B, Tq, H, D), 0), rand((B, Tk, H, D), 1), rand((B, Tk, H, D), 2)
    bias = rand((1, H, Tq, Tk), 3) * 0.5 if with_bias else None
    mask = None
    if with_mask:
        keep = np.random.default_rng(0).random((B, Tk)) > 0.2
        keep[:, 0] = True  # no fully-masked rows
        mask = jnp.asarray(keep)[:, None, None, :]
    ref = _ref(q, k, v, bias, mask, 0.125, causal)
    out = dense_attention(q, k, v, bias=bias, mask=mask, scale=0.125, causal=causal)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-3, atol=2e-3)


def test_cross_attention_shapes():
    # Tq != Tk (decoder cross-attention) incl. non-tile-multiple lengths
    B, Tq, Tk, H, D = 2, 24, 196, 4, 64
    q, k, v = rand((B, Tq, H, D), 0), rand((B, Tk, H, D), 1), rand((B, Tk, H, D), 2)
    bias = rand((1, H, Tq, Tk), 3) * 0.3
    ref = _ref(q, k, v, bias, None, 0.1, False)
    out = dense_attention(q, k, v, bias=bias, scale=0.1)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("with_mask", [False, True])
def test_gradients_match_xla(causal, with_mask):
    B, Tq, Tk, H, D = 2, 40, 40, 3, 64
    q, k, v = rand((B, Tq, H, D), 0), rand((B, Tk, H, D), 1), rand((B, Tk, H, D), 2)
    bias = rand((1, H, Tq, Tk), 3) * 0.5
    mask = None
    if with_mask:
        keep = np.random.default_rng(1).random((B, Tk)) > 0.2
        keep[:, 0] = True
        mask = jnp.asarray(keep)[:, None, None, :]

    def loss_ker(q, k, v, bias):
        o = dense_attention(q, k, v, bias=bias, mask=mask, scale=0.125, causal=causal)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size, dtype=o.dtype).reshape(o.shape)))

    def loss_ref(q, k, v, bias):
        o = _ref(q, k, v, bias, mask, 0.125, causal)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size, dtype=o.dtype).reshape(o.shape)))

    gk = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(gk, gr, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3, err_msg=name
        )


def test_bias_gradient_accumulates_over_batch():
    # dbias must be the SUM over batch of per-sample softmax grads: compare
    # B=4 against the sum of four B=1 calls
    B, T, H, D = 4, 32, 2, 64
    q, k, v = rand((B, T, H, D), 0), rand((B, T, H, D), 1), rand((B, T, H, D), 2)
    bias = rand((1, H, T, T), 3) * 0.5

    def loss(bias, q, k, v):
        return jnp.sum(dense_attention(q, k, v, bias=bias, scale=0.125) ** 2)

    full = jax.grad(loss)(bias, q, k, v)
    parts = sum(
        jax.grad(loss)(bias, q[i:i + 1], k[i:i + 1], v[i:i + 1]) for i in range(B)
    )
    # the bias cotangent is rounded to bf16 (the kernel consumes a bf16
    # bias); full-batch rounds the sum, per-sample rounds each part —
    # additivity holds to bf16 precision, not fp32
    np.testing.assert_allclose(np.asarray(full), np.asarray(parts), rtol=2e-2, atol=2e-2)


def test_supported_gate():
    assert dense_supported(64, 196, 196, 64, 12, 0.0)
    assert dense_supported(128, 64, 64, 64, 12, 0.0)
    assert not dense_supported(1, 196, 196, 64, 12, 0.0)   # tiny serving call
    assert not dense_supported(64, 196, 196, 64, 12, 0.1)  # dropout
    assert not dense_supported(8, 2048, 2048, 64, 12, 0.0)  # long-T -> flash


def test_model_dispatch_interpret():
    """attn_kernel='pallas' routes MultiheadAttention through the kernel in
    interpret mode and matches attn_kernel='xla' numerics."""
    from ofasys_tpu.model.transformer import MultiheadAttention

    B, T, H, D = 4, 64, 4, 16
    x = rand((B, T, H * D), 0)
    bias = rand((1, H, T, T), 1) * 0.5
    outs = {}
    for impl in ("xla", "pallas"):
        mha = MultiheadAttention(
            embed_dim=H * D, num_heads=H, dtype=jnp.float32, attn_kernel=impl
        )
        params = mha.init(jax.random.PRNGKey(0), x, bias=bias, causal=True)
        outs[impl], _ = mha.apply(params, x, bias=bias, causal=True)
    np.testing.assert_allclose(
        np.asarray(outs["xla"]), np.asarray(outs["pallas"]), rtol=2e-3, atol=2e-3
    )


def test_pick_g_calibrated_production_shapes():
    """The r4 on-chip compile/speed sweep pinned these picks; a regression
    to smaller G loses the measured ~17% forward win at T~200, a larger G
    fails Mosaic compile (g*max(T) >= 960 failed everywhere in the sweep).
    See _pick_g's docstring for the calibration data."""
    from ofasys_tpu.ops.pallas_dense_attention import _pick_g

    E, H = 768, 12
    # forward: (shape) -> sweep-verified pick
    assert _pick_g(64, 196, 196, E, H, backward=False) == 4
    assert _pick_g(48, 212, 212, E, H, backward=False) == 4
    assert _pick_g(128, 64, 64, E, H, backward=False) == 8
    assert _pick_g(32, 120, 120, E, H, backward=False) == 4
    # the compile-failure boundary must stay excluded
    for B, T in ((64, 196), (48, 212), (32, 120)):
        g = _pick_g(B, T, T, E, H, backward=False)
        assert g * T <= 848, (B, T, g)
    # backward: G=2 at T~200 fails Mosaic scoped-VMEM — must stay 1
    assert _pick_g(64, 196, 196, E, H, backward=True) == 1
    assert _pick_g(48, 212, 212, E, H, backward=True) == 1
