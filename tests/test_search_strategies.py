"""Diverse beam / diverse siblings / lexically-constrained search
(reference ofasys/utils/search.py:204-787, token_generation_constraints.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu import GeneralistModel, ModalityType
from ofasys_tpu.generator import search
from ofasys_tpu.generator.sequence_generator import SequenceGenerator
from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.utils.pytree import SlotBatch


def test_diverse_beam_candidates_penalize_repeats():
    B, K, V = 1, 4, 10
    lp = jnp.full((B, K, V), -5.0)
    lp = lp.at[:, :, 3].set(-0.1)       # token 3 dominates every beam
    lp = lp.at[:, :, 7].set(-0.2)       # runner-up
    alive = jnp.zeros((B, K))
    s, toks, beams = search.diverse_beam_candidates(lp, alive, num_groups=2,
                                                    diversity_strength=10.0)
    toks = np.asarray(toks)[0]
    beams = np.asarray(beams)[0]
    # group 0 (beams 0,2) picks token 3 first; group 1 (beams 1,3) is pushed
    # off token 3 by the Hamming penalty
    g0_toks = toks[beams % 2 == 0]
    g1_toks = toks[beams % 2 == 1]
    assert 3 in g0_toks and 7 in g0_toks
    # the Hamming penalty pushes group 1 off every token group 0 selected
    assert 3 not in g1_toks, f"group 1 should avoid token 3, got {g1_toks}"
    assert 7 not in g1_toks


def test_diverse_siblings_rank_penalty():
    B, K, V = 1, 2, 12
    lp = jnp.log(jnp.ones((B, K, V)) / V)
    # beam 0 has two near-equal siblings; beam 1 one strong candidate
    lp = lp.at[0, 0, 2].set(-0.10)
    lp = lp.at[0, 0, 3].set(-0.12)
    lp = lp.at[0, 1, 5].set(-0.11)
    alive = jnp.zeros((B, K))
    rate = 0.05
    s, toks, beams = search.diverse_siblings_candidates(lp, alive, jnp.int32(1), rate)
    s, toks, beams = np.asarray(s)[0], np.asarray(toks)[0], np.asarray(beams)[0]
    # rank-1 sibling of each beam gets -1*rate, rank-2 gets -2*rate:
    # beam0/tok2 -> -0.15, beam1/tok5 -> -0.16, beam0/tok3 -> -0.22
    assert toks[0] == 2 and beams[0] == 0
    assert toks[1] == 5 and beams[1] == 1
    assert abs(s[0] - (-0.10 - rate)) < 1e-5
    assert abs(s[1] - (-0.11 - rate)) < 1e-5


def test_lex_state_machine():
    cons, max_bank = search.LexicalConstraints.build(
        [[[5, 6, 7], [9]]]  # one sample, two constraints
    )
    assert max_bank == 4
    ptr = search.lex_init_ptr(cons, beam_size=1)           # (1, 2)
    ptr = search.lex_advance(cons, ptr, jnp.asarray([5]), 1)
    assert ptr.tolist() == [[1, 0]]
    ptr = search.lex_advance(cons, ptr, jnp.asarray([6]), 1)
    assert ptr.tolist() == [[2, 0]]
    # mismatch mid-constraint resets (token 5 restarts constraint 0)
    ptr = search.lex_advance(cons, ptr, jnp.asarray([5]), 1)
    assert ptr.tolist() == [[1, 0]]
    ptr = search.lex_advance(cons, ptr, jnp.asarray([6]), 1)
    ptr = search.lex_advance(cons, ptr, jnp.asarray([7]), 1)
    assert ptr.tolist() == [[3, 0]]                         # constraint 0 done
    assert int(search.lex_bank(cons, ptr, 1)[0]) == 3
    # completed constraint never regresses; constraint 1 completes on 9
    ptr = search.lex_advance(cons, ptr, jnp.asarray([9]), 1)
    assert ptr.tolist() == [[3, 1]]
    assert int(search.lex_bank(cons, ptr, 1)[0]) == 4


def _tiny_model():
    d = Dictionary()
    for i in range(50):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)
    m = GeneralistModel(arch="tiny")
    m.cfg.encoder.layers = m.cfg.decoder.layers = 1
    m.cfg.dropout = 0.0
    m.initialize(d, active_adaptors=("text",), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B = 2
    toks = rng.integers(d.nspecial, d.nspecial + 30, size=(B, 6)).astype(np.int32)
    src = SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.asarray(toks)}, "src")
    tgt = SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.zeros((B, 4), jnp.int32)}, "tgt")
    params = m.init_params(jax.random.PRNGKey(0), [src, tgt])
    return m, d, params, {"net_input": {"slots": [src, tgt]}}


def test_diverse_beam_generation_end_to_end():
    m, d, params, sample = _tiny_model()
    gen = SequenceGenerator(m, d, beam_size=4, max_len_b=6, min_len=1,
                            search_strategy="diverse_beam", num_groups=2,
                            diversity_strength=5.0, return_n_best=4)
    outs = gen.generate(params, sample)
    assert len(outs) == 2
    # diversity: the 4 hypotheses of a sample are not all identical
    seqs = {tuple(int(t) for t in h.tokens) for h in outs[0]}
    assert len(seqs) >= 2


def test_diverse_siblings_generation_end_to_end():
    m, d, params, sample = _tiny_model()
    gen = SequenceGenerator(m, d, beam_size=4, max_len_b=6, min_len=1,
                            search_strategy="diverse_siblings",
                            diversity_rate=0.3, return_n_best=4)
    outs = gen.generate(params, sample)
    assert len(outs) == 2 and outs[0][0].tokens is not None


def test_lexically_constrained_generation_includes_constraints():
    m, d, params, sample = _tiny_model()
    base = d.nspecial
    constraints = [
        [[base + 3, base + 4]],      # sample 0 must contain "3 4"
        [[base + 7], [base + 9]],    # sample 1 must contain 7 and 9
    ]
    sample = dict(sample)
    sample["constraints"] = constraints
    gen = SequenceGenerator(m, d, beam_size=4, max_len_b=10, min_len=1,
                            search_strategy="lexical")
    outs = gen.generate(params, sample)

    def contains(seq, sub):
        seq = list(seq)
        return any(seq[i:i + len(sub)] == list(sub) for i in range(len(seq)))

    toks0 = [int(t) for t in outs[0][0].tokens]
    toks1 = [int(t) for t in outs[1][0].tokens]
    assert contains(toks0, [base + 3, base + 4]), toks0
    assert contains(toks1, [base + 7]) and contains(toks1, [base + 9]), toks1
