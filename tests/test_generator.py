import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu import ModalityType
from ofasys_tpu.generator import SequenceGenerator
from ofasys_tpu.utils.pytree import SlotBatch

from test_train_step import copy_batch, tiny_model


@pytest.fixture(scope="module")
def trained():
    """Tiny model memorizing a copy task, for decode tests."""
    from ofasys_tpu.configure.configs import OptimizationConfig
    from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
        LabelSmoothedCrossEntropyCriterion,
        LabelSmoothedCrossEntropyCriterionConfig,
    )
    from ofasys_tpu.engine.optim import build_optimizer
    from ofasys_tpu.engine.train_step import TrainState, make_train_step

    m, d = tiny_model(dropout=0.0)
    rng = np.random.default_rng(0)
    batch = copy_batch(d, rng, B=4, T=6)
    params = m.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(label_smoothing=0.0), pad_id=d.pad()
    )
    opt = build_optimizer(OptimizationConfig(lr=(1e-2,)), total_num_update=300)
    state = TrainState.create(params, opt)
    step = jax.jit(make_train_step(m, crit, opt))
    for _ in range(200):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    return m, d, state.params, batch


def _sample(batch):
    return {"net_input": {"slots": batch["net_input"]["slots"]}}


def test_greedy_decodes_memorized(trained):
    m, d, params, batch = trained
    gen = SequenceGenerator(m, d, beam_size=1, max_len_b=8, min_len=1)
    out = gen.generate(params, _sample(batch))
    target = np.asarray(batch["target"])
    assert len(out) == 4
    correct = 0
    for b, hyps in enumerate(out):
        toks = hyps[0].tokens
        assert toks[-1] == d.eos()
        if np.array_equal(toks, target[b]):
            correct += 1
    assert correct >= 3, [h[0].tokens for h in out]


def test_beam_contains_greedy(trained):
    m, d, params, batch = trained
    greedy = SequenceGenerator(m, d, beam_size=1, max_len_b=8).generate(params, _sample(batch))
    beam = SequenceGenerator(m, d, beam_size=4, max_len_b=8, return_n_best=4).generate(params, _sample(batch))
    for g, bs in zip(greedy, beam):
        # beam's best should score >= greedy's best
        assert bs[0].score >= g[0].score - 1e-4
        # scores sorted descending
        sc = [h.score for h in bs]
        assert sc == sorted(sc, reverse=True)


def test_prefix_forcing(trained):
    m, d, params, batch = trained
    target = np.asarray(batch["target"])
    wrong_prefix = np.full((4, 2), d.nspecial + 3, np.int32)  # force an arbitrary prefix
    gen = SequenceGenerator(m, d, beam_size=2, max_len_b=8)
    out = gen.generate(params, _sample(batch), prefix_tokens=wrong_prefix)
    for hyps in out:
        np.testing.assert_array_equal(hyps[0].tokens[:2], wrong_prefix[0])


def test_constraint_range(trained):
    m, d, params, batch = trained
    lo, hi = d.nspecial + 10, d.nspecial + 20
    gen = SequenceGenerator(m, d, beam_size=2, max_len_b=6, constraint_range=f"{lo},{hi}")
    out = gen.generate(params, _sample(batch))
    for hyps in out:
        toks = hyps[0].tokens[:-1]  # exclude eos
        assert ((toks >= lo) & (toks < hi)).all(), toks


def test_min_len(trained):
    m, d, params, batch = trained
    gen = SequenceGenerator(m, d, beam_size=1, max_len_b=8, min_len=4)
    out = gen.generate(params, _sample(batch))
    for hyps in out:
        assert len(hyps[0].tokens) >= 5  # 4 tokens + eos


def test_incremental_matches_full_decode(trained):
    """decode_step with the precomputed cross-KV cache must produce the same
    logits as the full (non-incremental) decoder forward."""
    import dataclasses

    from ofasys_tpu.model.ofa import EncoderOut

    m, d, params, batch = trained
    net = m.net
    slots = batch["net_input"]["slots"]
    src = [s for s in slots if s.is_src]
    tgt = [s for s in slots if not s.is_src][0]
    full_logits, _ = m.apply(params, slots)                     # (B, T, V)

    enc = net.apply({"params": params}, src, method=net.encode)
    T = tgt.value["inputs"].shape[1]
    bias_spec, cross_bias, cache = net.apply(
        {"params": params}, [tgt], enc, T, method=net.decode_prepare
    )
    assert "cross" in cache["layers_0"], "cross K/V must be precomputed"
    step_logits = []
    for t in range(T):
        tok = jnp.asarray(tgt.value["inputs"][:, t : t + 1])
        out, _, cache = net.apply(
            {"params": params}, tok, jnp.int32(t), enc, bias_spec, cross_bias,
            cache, tgt, method=net.decode_step,
        )
        step_logits.append(out[:, 0])
    inc_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits, np.float32), np.asarray(inc_logits, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_max_len_a_scales_with_source(trained):
    m, d, params, batch = trained
    src_len = batch["net_input"]["slots"][0].value["inputs"].shape[1]
    gen = SequenceGenerator(m, d, beam_size=1, max_len_a=1.0, max_len_b=2, min_len=1)
    out = gen.generate(params, _sample(batch))
    limit = src_len + 2
    for hyps in out:
        assert len(hyps[0].tokens) <= limit + 1


def test_ngram_blocking(trained):
    m, d, params, batch = trained
    gen = SequenceGenerator(m, d, beam_size=1, max_len_b=12, no_repeat_ngram_size=2)
    out = gen.generate(params, _sample(batch))
    for hyps in out:
        toks = hyps[0].tokens[:-1].tolist()
        bigrams = list(zip(toks, toks[1:]))
        assert len(bigrams) == len(set(bigrams)), toks


def test_ensemble_of_identical_models_matches_single(trained):
    """Averaging N identical distributions is the identity — the ensemble
    path (per-model caches, logsumexp-mean) must reproduce the single-model
    beam exactly (reference EnsembleModel semantics)."""
    m, d, params, batch = trained
    single = SequenceGenerator(m, d, beam_size=2, max_len_b=8).generate(
        params, _sample(batch))
    duo = SequenceGenerator([m, m], d, beam_size=2, max_len_b=8).generate(
        [params, params], _sample(batch))
    for s, e in zip(single, duo):
        np.testing.assert_array_equal(s[0].tokens, e[0].tokens)
        assert abs(s[0].score - e[0].score) < 1e-4


def test_ensemble_mixes_member_distributions(trained):
    """An ensemble with an untrained member must still decode (and generally
    diverge from the trained model alone): exercises per-member KV caches
    and the probability average."""
    m, d, params, batch = trained
    fresh = m.init_params(jax.random.PRNGKey(7), batch["net_input"]["slots"])
    out = SequenceGenerator([m, m], d, beam_size=2, max_len_b=8).generate(
        [params, fresh], _sample(batch))
    assert len(out) == 4
    for hyps in out:
        assert hyps[0].tokens[-1] == d.eos()


def test_match_source_len_and_max_len_cap(trained):
    m, d, params, batch = trained
    # match_source_len pins content length to the source length (5 here)
    gen = SequenceGenerator(m, d, beam_size=2, max_len_b=20, match_source_len=True)
    out = gen.generate(params, _sample(batch))
    src_len = batch["net_input"]["slots"][0].value["inputs"].shape[1]
    for hyps in out:
        assert len(hyps[0].tokens) == src_len + 1, hyps[0].tokens  # content + eos
    # max_len hard-caps a*src+b
    gen2 = SequenceGenerator(m, d, beam_size=1, max_len_b=50, max_len=3)
    out2 = gen2.generate(params, _sample(batch))
    for hyps in out2:
        assert len(hyps[0].tokens) <= 3 + 2


def test_normalize_scores_off_matches_raw_logprob(trained):
    m, d, params, batch = trained
    norm = SequenceGenerator(m, d, beam_size=2, max_len_b=8, lenpen=2.0)
    raw = SequenceGenerator(m, d, beam_size=2, max_len_b=8, lenpen=2.0,
                            normalize_scores=False)
    on = norm.generate(params, _sample(batch))
    off = raw.generate(params, _sample(batch))
    for a, b in zip(on, off):
        # same tokens (greedy-ish trained model); raw score = norm * len**2
        if np.array_equal(a[0].tokens, b[0].tokens):
            L = len(a[0].tokens)
            np.testing.assert_allclose(b[0].score, a[0].score * L**2, rtol=1e-4)
