"""Fused QKV projection (cfg.fuse_qkv): one GEMM over q/k/v kernels must be
numerically equivalent to three separate projections — forward loss,
gradients, and greedy decode tokens all agree with the unfused path."""

import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu import ModalityType
from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
    LabelSmoothedCrossEntropyCriterion,
    LabelSmoothedCrossEntropyCriterionConfig,
)
from ofasys_tpu.generator import SequenceGenerator
from ofasys_tpu.model.ofa import GeneralistModel
from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.utils.pytree import SlotBatch


def _model(fuse, dtype=jnp.float32):
    d = Dictionary()
    for i in range(60):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)
    m = GeneralistModel(arch="tiny")
    m.cfg.encoder.layers = m.cfg.decoder.layers = 2
    m.cfg.dropout = 0.0
    m.cfg.fuse_qkv = fuse
    m.initialize(d, active_adaptors=("text",), dtype=dtype)
    return m, d


def _batch(d, rng, B=4, T=8):
    toks = rng.integers(d.nspecial, d.nspecial + 50, size=(B, T - 1)).astype(np.int32)
    prev = np.concatenate([np.full((B, 1), d.bos(), np.int32), toks], axis=1)
    target = np.concatenate([toks, np.full((B, 1), d.eos(), np.int32)], axis=1)
    src = SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.asarray(toks)}, "src")
    tgt = SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.asarray(prev)}, "tgt")
    return {"net_input": {"slots": [src, tgt]}, "target": jnp.asarray(target)}


def test_fused_matches_unfused_loss_grads_and_decode():
    rng = np.random.default_rng(0)
    m_f, d = _model(True)
    m_u, _ = _model(False)
    batch = _batch(d, rng)
    # identical params: fuse_qkv never changes the param tree
    params = m_f.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    params_u = m_u.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), params, params_u)

    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(label_smoothing=0.1)
    )

    def loss_fn(model):
        def f(p):
            out = crit(model, p, batch, jax.random.PRNGKey(1), train=False)
            return out[0] / out[1]
        return f

    lf, gf = jax.value_and_grad(loss_fn(m_f))(params)
    lu, gu = jax.value_and_grad(loss_fn(m_u))(params)
    assert np.allclose(float(lf), float(lu), rtol=1e-6, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6), gf, gu
    )

    # greedy decode tokens identical (exercises the cached self-attn fused
    # projection and the cross-attn q-only path)
    slots = batch["net_input"]["slots"]
    gen_f = SequenceGenerator(m_f, d, beam_size=1, max_len_b=6)
    gen_u = SequenceGenerator(m_u, d, beam_size=1, max_len_b=6)
    out_f = gen_f.generate(params, {"net_input": {"slots": slots}})
    out_u = gen_u.generate(params, {"net_input": {"slots": slots}})
    for a, b in zip(out_f, out_u):
        np.testing.assert_array_equal(np.asarray(a[0].tokens), np.asarray(b[0].tokens))
