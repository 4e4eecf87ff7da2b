"""Int8 quantized training (cfg.quant_training='fwd'): forward matmuls are
quantized with a straight-through backward (ops/quant.py int8_train_matmul).

Beyond-reference TPU addition; these tests pin the semantics:
  * the op's forward matches x @ dequant(quant(w)) within int8 error,
  * its VJP equals the EXACT matmul's VJP (straight-through),
  * a small model trains to a loss tracking the bf16 run,
  * eval/generation are untouched (deterministic calls never quantize).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ofasys_tpu import GeneralistModel, ModalityType
from ofasys_tpu.ops.quant import int8_train_matmul
from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.utils.pytree import SlotBatch


def test_int8_train_matmul_forward_and_vjp():
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((6, 32)), jnp.float32)
    w = jnp.asarray(r.standard_normal((32, 16)), jnp.float32)

    y = int8_train_matmul(x, w)
    exact = x @ w
    # symmetric int8: |err| bounded by ~(|x|max/127)*(|w|max/127)*K-ish;
    # relative tolerance of a couple percent is the expected regime
    rel = float(jnp.linalg.norm(y - exact) / jnp.linalg.norm(exact))
    assert rel < 0.03, rel

    # straight-through: VJP identical to the exact matmul's VJP
    g = jnp.asarray(r.standard_normal((6, 16)), jnp.float32)
    _, vjp_q = jax.vjp(int8_train_matmul, x, w)
    dxq, dwq = vjp_q(g)
    _, vjp_e = jax.vjp(lambda x, w: x @ w, x, w)
    dxe, dwe = vjp_e(g)
    np.testing.assert_allclose(np.asarray(dxq), np.asarray(dxe), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dwq), np.asarray(dwe), rtol=1e-5, atol=1e-5)


def _setup(quant_training="none"):
    d = Dictionary()
    for i in range(64):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)
    m = GeneralistModel(arch="tiny")
    m.cfg.encoder.layers = m.cfg.decoder.layers = 2
    m.cfg.dropout = 0.0
    m.cfg.quant_training = quant_training
    m.initialize(d, active_adaptors=("text",), dtype=jnp.float32)

    r = np.random.default_rng(1)
    toks = r.integers(d.nspecial, d.nspecial + 50, size=(4, 10)).astype(np.int32)
    tgt = r.integers(d.nspecial, d.nspecial + 50, size=(4, 6)).astype(np.int32)
    prev = np.concatenate([np.full((4, 1), d.bos(), np.int32), tgt[:, :-1]], 1)
    slots = [
        SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.asarray(toks)}, "src"),
        SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.asarray(prev)}, "tgt"),
    ]
    return m, d, slots, jnp.asarray(tgt)


def _train(m, d, slots, tgt, steps=30):
    params = m.init_params(jax.random.PRNGKey(0), slots)
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    def loss_fn(p, train):
        logits, _ = m.apply(p, slots, deterministic=not train)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.take_along_axis(lp, tgt[..., None], axis=-1).mean()

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(lambda p: loss_fn(p, True))(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    for _ in range(steps):
        params, ost, l = step(params, ost)
    return params, float(l), float(loss_fn(params, False))


def test_quant_training_loss_tracks_bf16():
    m_q, d, slots, tgt = _setup("fwd")
    _, train_l_q, eval_l_q = _train(m_q, d, slots, tgt)
    m_e, _, _, _ = _setup("none")
    _, train_l_e, eval_l_e = _train(m_e, d, slots, tgt)

    assert np.isfinite(train_l_q) and np.isfinite(eval_l_q)
    # quantized training must actually learn, tracking the exact run
    assert eval_l_q < eval_l_e * 1.25 + 0.25, (eval_l_q, eval_l_e)


def test_quant_training_eval_path_is_exact():
    """deterministic=True never quantizes: eval logits with
    quant_training='fwd' are bitwise those of the plain model."""
    m_q, d, slots, tgt = _setup("fwd")
    params = m_q.init_params(jax.random.PRNGKey(0), slots)
    m_e, _, _, _ = _setup("none")
    lq, _ = m_q.apply(params, slots, deterministic=True)
    le, _ = m_e.apply(params, slots, deterministic=True)
    np.testing.assert_array_equal(np.asarray(lq), np.asarray(le))
