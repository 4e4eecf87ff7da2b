"""Fused Pallas LayerNorm vs flax.linen.LayerNorm (forward, gradients,
module drop-in), interpret mode on CPU."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu.ops.pallas_layernorm import FusedLayerNorm, fused_layer_norm


def _ref_ln(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


@pytest.mark.parametrize("N,E", [(256, 256), (300, 128), (64, 384)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_ln_forward_matches(N, E, dtype):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (N, E), dtype) * 2.0 + 0.5
    g = jax.random.normal(jax.random.PRNGKey(1), (E,), jnp.float32) + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (E,), jnp.float32) * 0.1
    out = fused_layer_norm(x, g, b, 1e-5)
    ref = _ref_ln(x, g, b, 1e-5)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("N,E", [(200, 256), (64, 128)])
def test_fused_ln_gradients_match(N, E):
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (N, E), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(4), (E,), jnp.float32) + 1.0
    b = jnp.zeros((E,), jnp.float32)

    def loss_fused(x, g, b):
        return (fused_layer_norm(x, g, b, 1e-5) ** 2).sum()

    def loss_ref(x, g, b):
        return (_ref_ln(x, g, b, 1e-5) ** 2).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, g, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=2e-4, atol=2e-4)


def test_fused_ln_module_drop_in():
    """Same param names/shapes and same outputs as nn.LayerNorm."""
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 7, 256), jnp.float32)
    m_ref = nn.LayerNorm(epsilon=1e-5)
    m_fused = FusedLayerNorm(epsilon=1e-5)
    p_ref = m_ref.init(jax.random.PRNGKey(6), x)
    p_fused = m_fused.init(jax.random.PRNGKey(6), x)
    assert jax.tree.map(lambda a: a.shape, p_ref) == jax.tree.map(lambda a: a.shape, p_fused)
    # perturb params so the test is not trivially ones/zeros
    p = jax.tree.map(lambda a: a + 0.3, p_fused)
    np.testing.assert_allclose(
        np.asarray(m_fused.apply(p, x)), np.asarray(m_ref.apply(p, x)),
        rtol=2e-5, atol=2e-5,
    )


def test_hybrid_ln_matches_reference():
    """hybrid_layer_norm: XLA forward must equal the reference exactly;
    the Pallas backward must match reference gradients."""
    from ofasys_tpu.ops.pallas_layernorm import hybrid_layer_norm

    N, E = 200, 256
    x = jax.random.normal(jax.random.PRNGKey(7), (N, E), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(8), (E,), jnp.float32) + 1.0
    b = jax.random.normal(jax.random.PRNGKey(9), (E,), jnp.float32) * 0.1

    np.testing.assert_allclose(
        np.asarray(hybrid_layer_norm(x, g, b, 1e-5)),
        np.asarray(_ref_ln(x, g, b, 1e-5)), rtol=1e-6, atol=1e-6)

    gf = jax.grad(lambda x, g, b: (hybrid_layer_norm(x, g, b, 1e-5) ** 2).sum(),
                  argnums=(0, 1, 2))(x, g, b)
    gr = jax.grad(lambda x, g, b: (_ref_ln(x, g, b, 1e-5) ** 2).sum(),
                  argnums=(0, 1, 2))(x, g, b)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=2e-4, atol=2e-4)


def test_ln_impl_config_equivalence():
    """A tiny model forward is identical under ln_impl xla/hybrid (same
    params, same math) — the flag only changes the backward implementation."""
    from ofasys_tpu.model.config import GeneralistModelConfig
    from ofasys_tpu.model.transformer import TransformerEncoderLayer

    x = jax.random.normal(jax.random.PRNGKey(10), (2, 16, 256), jnp.float32)
    outs = {}
    params = None
    for impl in ("xla", "hybrid"):
        cfg = GeneralistModelConfig(arch="tiny", ln_impl=impl)
        layer = TransformerEncoderLayer(cfg, dtype=jnp.float32)
        if params is None:
            params = layer.init(jax.random.PRNGKey(11), x)
        outs[impl] = layer.apply(params, x)
    np.testing.assert_allclose(np.asarray(outs["xla"]), np.asarray(outs["hybrid"]),
                               rtol=2e-5, atol=2e-5)


def test_ln_impl_validation():
    from ofasys_tpu.model.config import GeneralistModelConfig
    from ofasys_tpu.model.transformer import make_ln

    cfg = GeneralistModelConfig(arch="tiny", ln_impl="hybird")  # typo
    with pytest.raises(ValueError, match="ln_impl"):
        make_ln(cfg, jnp.float32, "ln")
