"""scan-over-layers + remat: numerical equality with the unrolled loop path
and traceability of the 10b arch (VERDICT round-1 item 6; reference
checkpoint_activations at module/checkpoint_activations.py:14)."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu import GeneralistModel, ModalityType
from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.utils.pytree import SlotBatch


def _dict(n=80):
    d = Dictionary()
    for i in range(n):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)
    return d


def _batch(d, B=2, Ts=10, Tt=6, seed=0):
    r = np.random.default_rng(seed)
    toks = r.integers(d.nspecial, d.nspecial + 60, size=(B, Ts)).astype(np.int32)
    tgt = r.integers(d.nspecial, d.nspecial + 60, size=(B, Tt)).astype(np.int32)
    prev = np.concatenate([np.full((B, 1), d.bos(), np.int32), tgt[:, :-1]], 1)
    src = SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.asarray(toks)}, "src")
    tgt_slot = SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.asarray(prev)}, "tgt")
    return [src, tgt_slot], jnp.asarray(tgt)


def _model(d, scan=False, remat="none", layers=3):
    m = GeneralistModel(arch="tiny")
    m.cfg.encoder.layers = m.cfg.decoder.layers = layers
    m.cfg.dropout = 0.0
    m.cfg.scan_layers = scan
    m.cfg.remat = remat
    m.initialize(d, active_adaptors=("text",), dtype=jnp.float32)
    return m


def _stack_layers(params, n):
    """Loop layout (layers_0..layers_{n-1}) -> scan layout
    (layers_scan/layer with leading layer axis)."""
    params = flax.core.unfreeze(params)
    for stack in ("encoder", "decoder"):
        sub = params[stack]
        layers = [sub.pop(f"layers_{i}") for i in range(n)]
        sub["layers_scan"] = {"layer": jax.tree.map(lambda *xs: jnp.stack(xs), *layers)}
    return params


@pytest.mark.parametrize("mode", ["full", "dots"])
def test_decoder_and_encoder_remat_equals_plain(mode):
    d = _dict()
    slots, tgt = _batch(d)
    m_plain = _model(d, remat="none")
    params = m_plain.init_params(jax.random.PRNGKey(0), slots)
    m_remat = _model(d, remat=mode)

    out_plain, _ = m_plain.apply(params, slots)
    out_remat, _ = m_remat.apply(params, slots)
    np.testing.assert_allclose(
        np.asarray(out_plain, np.float32), np.asarray(out_remat, np.float32),
        rtol=1e-6, atol=1e-6,
    )

    # gradients flow identically through the remat boundary
    def loss(model):
        def f(p):
            logits, _ = model.apply(p, slots)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32))
            return -jnp.take_along_axis(lp, tgt[..., None], axis=-1).mean()
        return f

    g1 = jax.grad(loss(m_plain))(params)
    g2 = jax.grad(loss(m_remat))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_scan_layers_equals_loop():
    d = _dict()
    slots, tgt = _batch(d)
    n = 3
    m_loop = _model(d, scan=False, layers=n)
    params = m_loop.init_params(jax.random.PRNGKey(0), slots)
    out_loop, _ = m_loop.apply(params, slots)

    m_scan = _model(d, scan=True, layers=n)
    scan_params = _stack_layers(params, n)
    out_scan, _ = m_scan.apply(scan_params, slots)
    np.testing.assert_allclose(
        np.asarray(out_loop, np.float32), np.asarray(out_scan, np.float32),
        rtol=1e-5, atol=1e-5,
    )


def test_scan_param_layout_and_init():
    """scan init produces stacked layer params and a runnable train step."""
    d = _dict()
    slots, tgt = _batch(d)
    m = _model(d, scan=True, remat="full", layers=2)
    params = m.init_params(jax.random.PRNGKey(0), slots)
    k = params["encoder"]["layers_scan"]["layer"]["self_attn"]["q_proj"]["kernel"]
    assert k.shape[0] == 2  # leading layer axis
    logits, _ = m.apply(params, slots)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_10b_scan_remat_train_step_traces():
    """The 10b preset traces + lowers as a full train step under scan+remat
    with abstract params (no 40GB materialization). Without scan this trace
    unrolls 48+36 layers; with it the body traces once per stack."""
    import optax

    from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
        LabelSmoothedCrossEntropyCriterion,
        LabelSmoothedCrossEntropyCriterionConfig,
    )
    from ofasys_tpu.engine.train_step import TrainState, make_train_step

    d = _dict()
    slots, tgt = _batch(d, B=1, Ts=8, Tt=4)
    m = GeneralistModel(arch="10b")
    m.cfg.dropout = 0.0
    m.cfg.scan_layers = True
    m.cfg.remat = "full"
    m.initialize(d, active_adaptors=("text",), dtype=jnp.bfloat16)

    net = m.net

    def init_all(n, lists):
        return n(lists, deterministic=True)

    abstract_params = jax.eval_shape(
        lambda r: net.init({"params": r}, slots, method=init_all)["params"],
        jax.random.PRNGKey(0),
    )
    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(), pad_id=d.pad()
    )
    opt = optax.adamw(1e-4)
    step = make_train_step(m, crit, opt)
    abstract_state = jax.eval_shape(lambda p: TrainState.create(p, opt), abstract_params)
    batch = {"net_input": {"slots": slots}, "target": tgt}
    lowered = jax.jit(step).lower(
        abstract_state, batch, jax.ShapeDtypeStruct((2,), jnp.uint32)
    )
    assert lowered is not None
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree.leaves(abstract_params)
    )
    assert n_params > 9e9, f"10b preset has {n_params/1e9:.1f}B params"


def test_scan_params_greedy_decode_matches_loop():
    """Generation with scan-trained (stacked) params emits the same tokens
    as the loop layout holding identical weights."""
    from ofasys_tpu.generator import SequenceGenerator

    d = _dict()
    slots, _ = _batch(d, B=2, Ts=8, Tt=4)
    n = 2
    m_loop = _model(d, scan=False, layers=n)
    params = m_loop.init_params(jax.random.PRNGKey(0), slots)
    sample = {"net_input": {"slots": slots}}

    gen_loop = SequenceGenerator(m_loop, d, beam_size=1, max_len_b=6, min_len=1)
    out_loop = gen_loop.generate(params, sample)

    m_scan = _model(d, scan=True, layers=n)
    gen_scan = SequenceGenerator(m_scan, d, beam_size=1, max_len_b=6, min_len=1)
    out_scan = gen_scan.generate(_stack_layers(params, n), sample)

    for a, b in zip(out_loop, out_scan):
        assert list(a[0].tokens) == list(b[0].tokens)
