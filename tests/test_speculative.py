"""Speculative (draft-verify) decoding: greedy-token parity with the plain
generator, with any draft — the draft only changes how many target steps
are spent, never the emitted tokens (generator/speculative.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu import GeneralistModel, ModalityType
from ofasys_tpu.generator import SequenceGenerator, SpeculativeGenerator
from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.utils.pytree import SlotBatch


def _dict(n=60):
    d = Dictionary()
    for i in range(n):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)
    return d


def _model(d, layers):
    m = GeneralistModel(arch="tiny")
    m.cfg.encoder.layers = m.cfg.decoder.layers = layers
    m.cfg.dropout = 0.0
    m.initialize(d, active_adaptors=("text",), dtype=jnp.float32)
    return m


def _sample(d, B=2, Ts=9, seed=0):
    r = np.random.default_rng(seed)
    toks = r.integers(d.nspecial, d.nspecial + 50, size=(B, Ts)).astype(np.int32)
    slots = [
        SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.asarray(toks)}, "src"),
        SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.zeros((B, 4), jnp.int32)}, "tgt"),
    ]
    return {"net_input": {"slots": slots}}


@pytest.mark.parametrize("gamma", [1, 3])
def test_speculative_matches_greedy(gamma):
    d = _dict()
    target = _model(d, layers=2)
    draft = _model(d, layers=1)
    sample = _sample(d)
    slots = sample["net_input"]["slots"]
    params = target.init_params(jax.random.PRNGKey(0), slots)
    dparams = draft.init_params(jax.random.PRNGKey(7), slots)

    ref = SequenceGenerator(target, d, beam_size=1, max_len_b=12, min_len=2)
    out_ref = ref.generate(params, sample)

    spec = SpeculativeGenerator(target, draft, d, gamma=gamma, max_len_b=12, min_len=2)
    out_spec = spec.generate(params, dparams, sample)

    for b in range(len(out_ref)):
        assert list(out_spec[b][0].tokens) == list(out_ref[b][0].tokens), (
            b, out_spec[b][0].tokens, out_ref[b][0].tokens,
        )


def test_speculative_selfdraft_matches_greedy():
    """draft == target: every proposal is accepted; output still identical."""
    d = _dict()
    target = _model(d, layers=2)
    sample = _sample(d, B=1, seed=3)
    slots = sample["net_input"]["slots"]
    params = target.init_params(jax.random.PRNGKey(1), slots)

    ref = SequenceGenerator(target, d, beam_size=1, max_len_b=10, min_len=1)
    out_ref = ref.generate(params, sample)
    spec = SpeculativeGenerator(target, target, d, gamma=4, max_len_b=10, min_len=1)
    out_spec = spec.generate(params, params, sample)
    assert list(out_spec[0][0].tokens) == list(out_ref[0][0].tokens)


def test_multitoken_decode_step_is_causal():
    """decode_step with S>1 must equal S sequential single-token steps
    (the in-step causal mask added for speculative verification)."""
    import dataclasses

    from ofasys_tpu.model.ofa import EncoderOut

    d = _dict()
    m = _model(d, layers=2)
    sample = _sample(d, B=2, seed=5)
    slots = sample["net_input"]["slots"]
    params = m.init_params(jax.random.PRNGKey(2), slots)
    net = m.net
    src = [s for s in slots if s.is_src]
    tgt = [s for s in slots if not s.is_src][0]

    enc = net.apply({"params": params}, src, method=net.encode)
    T_buf = 8
    dummy = dataclasses.replace(tgt, value={"inputs": jnp.zeros((2, T_buf), jnp.int32)})
    r = np.random.default_rng(0)
    toks = jnp.asarray(
        r.integers(d.nspecial, d.nspecial + 50, size=(2, 5)).astype(np.int32)
    )

    bias, cb, cache = net.apply({"params": params}, [dummy], enc, T_buf, method=net.decode_prepare)
    multi, _, _ = net.apply(
        {"params": params}, toks, jnp.int32(0), enc, bias, cb, cache, tgt,
        method=net.decode_step,
    )

    bias, cb, cache = net.apply({"params": params}, [dummy], enc, T_buf, method=net.decode_prepare)
    singles = []
    for j in range(5):
        out, _, cache = net.apply(
            {"params": params}, toks[:, j : j + 1], jnp.int32(j), enc, bias, cb,
            cache, tgt, method=net.decode_step,
        )
        singles.append(out[:, 0])
    np.testing.assert_allclose(
        np.asarray(multi, np.float32),
        np.asarray(jnp.stack(singles, axis=1), np.float32),
        rtol=2e-5, atol=2e-5,
    )


def test_speculative_composes_with_int8_serving():
    """Speculative decode over a quantize_for_serving'd target matches the
    plain generator running the same quantized variables."""
    from ofasys_tpu.ops.quant import quantize_for_serving

    d = _dict()
    target = _model(d, layers=2)
    draft = _model(d, layers=1)
    sample = _sample(d, B=2, seed=9)
    slots = sample["net_input"]["slots"]
    params = target.init_params(jax.random.PRNGKey(4), slots)
    dparams = draft.init_params(jax.random.PRNGKey(11), slots)
    qvars = quantize_for_serving(params, quantize_logits=False)

    ref = SequenceGenerator(target, d, beam_size=1, max_len_b=8, min_len=1)
    out_ref = ref.generate(qvars, sample)
    spec = SpeculativeGenerator(target, draft, d, gamma=2, max_len_b=8, min_len=1)
    out_spec = spec.generate(qvars, dparams, sample)
    for b in range(2):
        assert list(out_spec[b][0].tokens) == list(out_ref[b][0].tokens)
