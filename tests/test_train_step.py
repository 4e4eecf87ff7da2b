import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu import ModalityType
from ofasys_tpu.configure.configs import OptimizationConfig
from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
    LabelSmoothedCrossEntropyCriterion,
    LabelSmoothedCrossEntropyCriterionConfig,
)
from ofasys_tpu.engine.optim import build_optimizer, polynomial_decay_schedule
from ofasys_tpu.engine.train_step import TrainState, make_train_step
from ofasys_tpu.model.ofa import GeneralistModel
from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.utils.pytree import SlotBatch


def tiny_model(dropout=0.1, dtype=None):
    import jax.numpy as _jnp

    d = Dictionary()
    for i in range(60):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)
    m = GeneralistModel(arch="tiny")
    m.cfg.encoder.layers = m.cfg.decoder.layers = 2
    m.cfg.dropout = dropout
    m.initialize(d, active_adaptors=("text",), dtype=dtype or _jnp.bfloat16)
    return m, d


def copy_batch(d, rng, B=8, T=10):
    # mirrors text collate: prev = [bos, toks], target = [toks, eos]
    toks = rng.integers(d.nspecial, d.nspecial + 50, size=(B, T - 1)).astype(np.int32)
    prev = np.concatenate([np.full((B, 1), d.bos(), np.int32), toks], axis=1)
    target = np.concatenate([toks, np.full((B, 1), d.eos(), np.int32)], axis=1)
    src = SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.asarray(toks)}, "src")
    tgt = SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.asarray(prev)}, "tgt")
    return {
        "net_input": {"slots": [src, tgt]},
        "target": jnp.asarray(target),
    }


def test_loss_decreases_on_copy_task():
    m, d = tiny_model(dropout=0.0)
    rng = np.random.default_rng(0)
    batch = copy_batch(d, rng)
    params = m.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    crit = LabelSmoothedCrossEntropyCriterion(LabelSmoothedCrossEntropyCriterionConfig(label_smoothing=0.1))
    opt_cfg = OptimizationConfig(lr=(1e-2,), warmup_updates=5, clip_norm=1.0)
    optimizer = build_optimizer(opt_cfg, total_num_update=100)
    state = TrainState.create(params, optimizer)
    step = jax.jit(make_train_step(m, crit, optimizer), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(40):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]) / float(metrics["sample_size"]))
    # memorizing one fixed batch must drive the loss down hard
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    assert np.isfinite(losses).all()


def test_grad_accum_matches_big_batch():
    # fp32 compute: bf16 rounding noise would otherwise be amplified into
    # full-size adam steps, hiding real structural differences
    m, d = tiny_model(dropout=0.0, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    big = copy_batch(d, rng, B=8, T=6)
    params = m.init_params(jax.random.PRNGKey(0), big["net_input"]["slots"])
    crit = LabelSmoothedCrossEntropyCriterion(LabelSmoothedCrossEntropyCriterionConfig(label_smoothing=0.0))
    # SGD: the param delta IS the (scaled) gradient, so this compares raw
    # accumulated gradients without adam's noise amplification
    opt_cfg = OptimizationConfig(lr=(1e-2,), clip_norm=0.0, optimizer="sgd", lr_scheduler="fixed")
    optimizer = build_optimizer(opt_cfg, total_num_update=10)

    # one big batch
    s1 = TrainState.create(params, optimizer)
    step1 = jax.jit(make_train_step(m, crit, optimizer))
    s1, m1 = step1(s1, big, jax.random.PRNGKey(2))

    # two microbatches stacked on a leading axis
    split = jax.tree.map(lambda x: x.reshape((2, 4) + x.shape[1:]), big)
    s2 = TrainState.create(params, optimizer)
    step2 = jax.jit(make_train_step(m, crit, optimizer, update_freq=2))
    s2, m2 = step2(s2, split, jax.random.PRNGKey(2))

    g1 = jax.tree.leaves(s1.params)
    g2 = jax.tree.leaves(s2.params)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_polynomial_schedule():
    sched = polynomial_decay_schedule(1e-3, total_num_update=100, warmup_updates=10)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1e-3) < 1e-9
    assert float(sched(55)) == pytest.approx(0.5e-3, rel=1e-3)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)
    # warmup_ratio variant
    sched2 = polynomial_decay_schedule(1e-3, total_num_update=100, warmup_ratio=0.1)
    assert abs(float(sched2(10)) - 1e-3) < 1e-9


def test_incremental_decode_matches_full_forward():
    """KV-cache decode must produce the same logits as the full forward."""
    m, d = tiny_model(dropout=0.0)
    rng = np.random.default_rng(3)
    B, Ts, Tt = 2, 7, 5
    batch = copy_batch(d, rng, B=B, T=Ts)
    src, tgt_slot = batch["net_input"]["slots"]
    prev = np.asarray(tgt_slot.value["inputs"])[:, :Tt]
    tgt = SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.asarray(prev)}, "tgt")
    variables = {"params": m.init_params(jax.random.PRNGKey(0), [src, tgt])}

    full_logits, _ = m.net.apply(variables, [src, tgt], deterministic=True)

    def encode(v, s):
        return m.net.apply(v, s, deterministic=True, method=m.net.encode)

    enc = encode(variables, [src])
    dummy_tgt = SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.zeros((B, Tt), jnp.int32)}, "tgt")
    bias_spec, cross_b, cache = m.net.apply(
        variables, [dummy_tgt], enc, Tt, method=m.net.decode_prepare
    )
    step_logits = []
    for t in range(Tt):
        logits, _, cache = m.net.apply(
            variables,
            jnp.asarray(prev[:, t:t + 1]),
            jnp.int32(t),
            enc,
            bias_spec,
            cross_b,
            cache,
            tgt,
            method=m.net.decode_step,
        )
        step_logits.append(logits[:, 0])
    inc = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits, np.float32), np.asarray(inc, np.float32), rtol=2e-2, atol=2e-2
    )


def test_drop_worst_drops_highest_loss_positions():
    """drop_worst_ratio keeps the (1-ratio) fraction of valid positions with
    the smallest loss after drop_worst_after updates (reference
    label_smoothed_cross_entropy.py:80-84)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
        LabelSmoothedCrossEntropyCriterion,
        LabelSmoothedCrossEntropyCriterionConfig,
    )

    pad = 1
    cfg = LabelSmoothedCrossEntropyCriterionConfig(
        label_smoothing=0.0, drop_worst_ratio=0.5, drop_worst_after=2
    )
    crit = LabelSmoothedCrossEntropyCriterion(cfg, pad_id=pad)
    B, T, V = 1, 8, 16
    target = jnp.asarray(np.full((B, T), 5, np.int32))
    # logits: first 4 positions confident-correct (low loss), last 4 wrong
    logits = np.zeros((B, T, V), np.float32)
    logits[:, :4, 5] = 10.0
    logits[:, 4:, 9] = 10.0
    sample_on = {"target": target, "update_num": jnp.int32(5)}
    loss_on, ss_on, log_on = crit.compute_loss(jnp.asarray(logits), sample_on, train=True)
    sample_off = {"target": target, "update_num": jnp.int32(1)}
    loss_off, ss_off, _ = crit.compute_loss(jnp.asarray(logits), sample_off, train=True)
    # gated on: only the 4 confident positions remain -> tiny loss, ntokens=4
    assert float(ss_on) == 4.0 and float(ss_off) == 8.0
    assert float(loss_on) < 0.1 < float(loss_off)
    # eval path ignores drop_worst
    _, ss_eval, _ = crit.compute_loss(jnp.asarray(logits), {"target": target}, train=False)
    assert float(ss_eval) == 8.0
