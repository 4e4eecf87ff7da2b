"""Trie-constrained decoding inside the jitted beam loop (reference
ofasys/generator/sequence_generator.py:684-752 + utils/trie.py:13)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu import GeneralistModel, ModalityType
from ofasys_tpu.generator import search
from ofasys_tpu.generator.sequence_generator import SequenceGenerator
from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.utils.pytree import SlotBatch
from ofasys_tpu.utils.trie import Trie


def _dict(n=64):
    d = Dictionary()
    for i in range(n):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)
    return d


def _trie(d, answers):
    t = Trie(d.eos())
    for a in answers:
        t.insert([d.bos()] + list(a) + [d.eos()])
    return t


def test_compile_trie_tables_sparse_and_dense():
    d = _dict()
    base = d.nspecial
    answers = [(base, base + 1), (base, base + 2), (base + 3,)]
    trie = _trie(d, answers)
    for thresh in (64, 1):  # sparse-only layout, then force-dense layout
        ct = search.compile_trie(trie, len(d), d.bos(), dense_threshold=thresh)
        # initial state = after bos; allowed first tokens = {base, base+3}
        s0 = jnp.asarray([ct.initial_state], jnp.int32)
        mask = np.asarray(search.trie_allowed_mask(ct, s0, len(d)))[0]
        allowed = set(np.nonzero(mask == 0.0)[0].tolist())
        assert allowed == {base, base + 3}
        # advance along answer 0
        s1 = search.trie_advance(ct, s0, jnp.asarray([base]))
        mask1 = np.asarray(search.trie_allowed_mask(ct, s1, len(d)))[0]
        assert set(np.nonzero(mask1 == 0.0)[0].tolist()) == {base + 1, base + 2}
        s2 = search.trie_advance(ct, s1, jnp.asarray([base + 1]))
        mask2 = np.asarray(search.trie_allowed_mask(ct, s2, len(d)))[0]
        assert set(np.nonzero(mask2 == 0.0)[0].tolist()) == {d.eos()}
        # off-trie token -> dead state, everything banned
        sdead = search.trie_advance(ct, s1, jnp.asarray([base + 9]))
        assert int(sdead[0]) == ct.num_states
        mdead = np.asarray(search.trie_allowed_mask(ct, sdead, len(d)))[0]
        assert (mdead < 0).all()


def test_beam_search_emits_only_trie_paths():
    d = _dict()
    base = d.nspecial
    answers = [
        (base + 0, base + 1),
        (base + 0, base + 2, base + 3),
        (base + 5,),
        (base + 6, base + 7),
    ]
    trie = _trie(d, answers)

    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 1
    model.cfg.dropout = 0.0
    model.initialize(d, active_adaptors=("text",), dtype=jnp.float32)

    B = 3
    rng = np.random.default_rng(0)
    toks = rng.integers(d.nspecial, d.nspecial + 40, size=(B, 6)).astype(np.int32)
    src = SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.asarray(toks)}, "src")
    tgt = SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.zeros((B, 4), jnp.int32)}, "tgt")
    params = model.init_params(jax.random.PRNGKey(0), [src, tgt])

    gen = SequenceGenerator(
        model, d, beam_size=4, max_len_b=8, min_len=1,
        constraint_trie=trie, return_n_best=4,
    )
    outs = gen.generate(params, {"net_input": {"slots": [src, tgt]}})
    valid = {tuple(a) + (d.eos(),) for a in answers}
    n_checked = 0
    for hyps in outs:
        for h in hyps:
            seq = tuple(int(x) for x in h.tokens)
            if h.score <= search.NEG_INF / 2:  # unfilled hypothesis slot
                continue
            assert seq in valid, f"emitted {seq} not a trie path"
            n_checked += 1
    assert n_checked >= B  # at least the top hypothesis per sample is real


def test_task_closed_set_routes_trie_into_generator():
    from ofasys_tpu import Task
    from ofasys_tpu.configure import ConfigStore

    try:
        task = Task(
            name="clf",
            instruction='is " [TEXT:sentence] " ok? -> [TEXT:label,closed_set]',
        )
        d = Dictionary()
        task.initialize(d)
        tp = task.general_preprocess.name2pre["text"]
        tp.ans2label = {"yes": 0, "no": 1}
        tp.build_constraint_trie(["yes", "no"])
        d.pad_to_multiple_(8)

        model = GeneralistModel(arch="tiny")
        model.cfg.encoder.layers = model.cfg.decoder.layers = 1
        model.initialize(d, active_adaptors=("text",), dtype=jnp.float32)
        gen = task.build_generator(model, beam_size=2, max_len_b=4)
        assert gen.trie is not None
    finally:
        ConfigStore().reset()
