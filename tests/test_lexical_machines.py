"""Reference-faithful ordered/unordered constraint state machines
(reference token_generation_constraints.py: OrderedConstraintState :382-498,
UnorderedConstraintState :197-353), validated against step-by-step python
oracles implementing the reference semantics, plus end-to-end generation."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu import GeneralistModel, ModalityType
from ofasys_tpu.generator import search
from ofasys_tpu.generator.sequence_generator import SequenceGenerator
from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.utils.pytree import SlotBatch


# ------------------------------------------------------------- oracles
class OrderedOracle:
    """state = pointer into the flattened constraint sequence; -1 = root."""

    def __init__(self, constraints):
        self.seq = [t for s in constraints for t in s]
        self.ends = []
        for s in constraints:
            self.ends += [False] * (len(s) - 1) + [True]
        self.state = -1

    @property
    def bank(self):
        return self.state + 1

    @property
    def finished(self):
        return self.state + 1 == len(self.seq)

    def advance(self, token):
        if self.finished:
            return
        if self.seq[self.state + 1] == token:
            self.state += 1
        elif self.ends[self.state]:  # python [-1] at root -> last end == True
            pass
        elif self.seq and token == self.seq[0]:
            self.state = 0
        else:
            self.state = -1


class UnorderedOracle:
    """Trie walk with generated/completed counters and subtree saturation."""

    class Node:
        def __init__(self, parent):
            self.parent = parent
            self.children = {}
            self.terminal = 0
            self.subtree = 0

    def __init__(self, constraints):
        self.root = self.Node(None)
        self.n_cons = len(constraints)
        for s in constraints:
            cur = self.root
            for t in s:
                if t not in cur.children:
                    cur.children[t] = self.Node(cur)
                cur = cur.children[t]
            cur.terminal += 1
            node = cur
            while node is not None:
                node.subtree += 1
                node = node.parent
        self.node = self.root
        self.gen = {}
        self.comp = {}

    @property
    def bank(self):
        return sum(self.gen.values())

    @property
    def num_completed(self):
        in_final = (
            self.node is not self.root
            and self.node.terminal > self.comp.get(id(self.node), 0)
        )
        return sum(self.comp.values()) + int(in_final)

    @property
    def met(self):
        return self.num_completed >= self.n_cons

    def _rewind(self, frm):
        node = frm
        while node is not self.root:
            if node.terminal > self.comp.get(id(node), 0):
                self.comp[id(node)] = self.comp.get(id(node), 0) + 1
                return
            self.gen[id(node)] = self.gen.get(id(node), 0) - 1
            node = node.parent

    def advance(self, token):
        old = self.node
        child = old.children.get(token)
        if child is not None and self.gen.get(id(child), 0) < child.subtree:
            self.node = child
            self.gen[id(child)] = self.gen.get(id(child), 0) + 1
            return
        rchild = self.root.children.get(token)
        if rchild is not None and self.gen.get(id(rchild), 0) < rchild.subtree:
            self.node = rchild
            self._rewind(old)
            self.gen[id(rchild)] = self.gen.get(id(rchild), 0) + 1
        else:
            self.node = self.root
            self._rewind(old)


def _random_constraints(rng, vocab=8):
    n = rng.randint(1, 3)
    return [
        [rng.randrange(vocab) for _ in range(rng.randint(1, 3))] for _ in range(n)
    ]


# ------------------------------------------------------------ property tests
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ordered_machine_matches_oracle(seed):
    rng = random.Random(seed)
    batch = [_random_constraints(rng) for _ in range(3)]
    tables, mach = search.build_constraints(batch, "ordered")
    K = 2
    state = mach.init(tables, len(batch) * K)
    oracles = [[OrderedOracle(c) for _ in range(K)] for c in batch]

    adv = jax.jit(lambda s, t: mach.advance(tables, s, t))
    for _ in range(60):
        toks = np.asarray(
            [[rng.randrange(8) for _ in range(K)] for _ in batch], np.int32
        ).reshape(-1)
        state = adv(state, jnp.asarray(toks))
        for b, row in enumerate(oracles):
            for k, o in enumerate(row):
                o.advance(int(toks[b * K + k]))
        banks = np.asarray(mach.bank(tables, state)).reshape(len(batch), K)
        mets = np.asarray(mach.met(tables, state)).reshape(len(batch), K)
        for b, row in enumerate(oracles):
            for k, o in enumerate(row):
                assert banks[b, k] == o.bank, (b, k, banks[b, k], o.bank)
                assert bool(mets[b, k]) == o.finished


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_unordered_machine_matches_oracle(seed):
    rng = random.Random(100 + seed)
    # include shared prefixes and duplicate constraints — the cases the
    # reference's counters exist for
    batch = [_random_constraints(rng) for _ in range(2)]
    batch[0] = batch[0] + [batch[0][0]]  # duplicate constraint
    tables, mach = search.build_constraints(batch, "unordered")
    K = 2
    N = len(batch) * K
    state = mach.init(tables, N)
    oracles = [[UnorderedOracle(c) for _ in range(K)] for c in batch]

    adv = jax.jit(lambda s, t: mach.advance(tables, s, t))
    for step in range(80):
        # bias the walk toward constraint tokens so paths actually progress
        toks = []
        for b, c in enumerate(batch):
            flat = [t for s in c for t in s]
            for _ in range(K):
                toks.append(rng.choice(flat) if rng.random() < 0.7 else rng.randrange(8))
        toks = np.asarray(toks, np.int32)
        state = adv(state, jnp.asarray(toks))
        for b, row in enumerate(oracles):
            for k, o in enumerate(row):
                o.advance(int(toks[b * K + k]))
        banks = np.asarray(mach.bank(tables, state)).reshape(len(batch), K)
        mets = np.asarray(mach.met(tables, state)).reshape(len(batch), K)
        ncomp = np.asarray(
            search.unord_num_completed(tables, state, len(batch))
        ).reshape(len(batch), K)
        for b, row in enumerate(oracles):
            for k, o in enumerate(row):
                assert banks[b, k] == o.bank, (step, b, k, banks[b, k], o.bank)
                assert ncomp[b, k] == o.num_completed, (step, b, k)
                assert bool(mets[b, k]) == o.met, (step, b, k)


def test_unordered_shared_prefix_saturation():
    """With constraints [5,6] and [5,7], generating 5,6 completes the first;
    the shared child 5 stays traversable until its subtree saturates."""
    tables, mach = search.build_constraints([[[5, 6], [5, 7]]], "unordered")
    st = mach.init(tables, 1)
    for t in [5, 6]:
        st = mach.advance(tables, st, jnp.asarray([t], jnp.int32))
    assert int(mach.bank(tables, st)[0]) == 2
    assert not bool(mach.met(tables, st)[0])
    for t in [5, 7]:
        st = mach.advance(tables, st, jnp.asarray([t], jnp.int32))
    assert int(mach.bank(tables, st)[0]) == 4
    assert bool(mach.met(tables, st)[0])


# ------------------------------------------------------------- end-to-end
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


def _contains(seq, sub):
    seq = list(seq)
    return any(seq[i : i + len(sub)] == list(sub) for i in range(len(seq)))


def test_ordered_generation_emits_constraints_in_order():
    m, d, params, sample = _tiny_model()
    base = d.nspecial
    constraints = [
        [[base + 3], [base + 8]],     # 3 must precede 8
        [[base + 7, base + 9]],       # phrase 7 9
    ]
    sample = dict(sample)
    sample["constraints"] = constraints
    gen = SequenceGenerator(m, d, beam_size=4, max_len_b=10, min_len=1,
                            search_strategy="lexical",
                            constraint_representation="ordered")
    outs = gen.generate(params, sample)
    toks0 = [int(t) for t in outs[0][0].tokens]
    toks1 = [int(t) for t in outs[1][0].tokens]
    assert base + 3 in toks0 and base + 8 in toks0, toks0
    assert toks0.index(base + 3) < toks0.index(base + 8), toks0
    assert _contains(toks1, [base + 7, base + 9]), toks1


def test_unordered_generation_contains_constraints():
    m, d, params, sample = _tiny_model()
    base = d.nspecial
    constraints = [
        [[base + 3, base + 4]],
        [[base + 7], [base + 9]],
    ]
    sample = dict(sample)
    sample["constraints"] = constraints
    gen = SequenceGenerator(m, d, beam_size=4, max_len_b=10, min_len=1,
                            search_strategy="lexical",
                            constraint_representation="unordered")
    outs = gen.generate(params, sample)
    toks0 = [int(t) for t in outs[0][0].tokens]
    toks1 = [int(t) for t in outs[1][0].tokens]
    assert _contains(toks0, [base + 3, base + 4]), toks0
    assert _contains(toks1, [base + 7]) and _contains(toks1, [base + 9]), toks1
