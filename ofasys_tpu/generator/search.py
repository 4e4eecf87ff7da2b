"""Search-space shaping helpers used inside the jitted decode loops
(reference ofasys/utils/search.py, 787 LoC of stateful torch Search classes;
here they are pure logit transforms that fuse into the decode step)."""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def apply_min_len(log_probs: jax.Array, step: jax.Array, min_len: int, eos: int) -> jax.Array:
    """Disallow EOS before min_len steps."""
    return jax.lax.cond(
        step < min_len,
        lambda lp: lp.at[..., eos].set(NEG_INF),
        lambda lp: lp,
        log_probs,
    )


def apply_constraint_range(
    log_probs: jax.Array, start: int, end: int, eos: int
) -> jax.Array:
    """Allow only [start, end) plus EOS (reference constraint_range for VQGAN
    code / bin sub-vocabs, generator/sequence_generator.py:684-752). Static
    slice masking — folds to a constant mask under jit."""
    V = log_probs.shape[-1]
    ids = jnp.arange(V)
    allowed = (ids >= start) & (ids < end) | (ids == eos)
    return jnp.where(allowed, log_probs, NEG_INF)


def apply_vocab_mask(log_probs: jax.Array, mask: jax.Array) -> jax.Array:
    """mask: bool (..., V), True = allowed."""
    return jnp.where(mask, log_probs, NEG_INF)


def block_repeat_ngrams(
    log_probs: jax.Array,     # (N, V)
    tokens: jax.Array,        # (N, T) generated so far (garbage beyond step)
    step: jax.Array,          # scalar: next position to be generated
    ngram: int,
) -> jax.Array:
    """Ban tokens completing an already-seen n-gram (reference
    utils/ngram_repeat_block.py CUDA kernel + python fallback). Vectorized:
    compare every historical (n-1)-window to the current suffix, scatter
    NEG_INF at the tokens that followed matching windows."""
    if ngram <= 0:
        return log_probs
    N, T = tokens.shape
    k = ngram - 1

    def do_block(lp):
        # current suffix: tokens[step-k : step]
        suffix = jax.lax.dynamic_slice_in_dim(tokens, step - k, k, axis=1)  # (N, k)
        # windows starting at every position p: tokens[p : p+k], next = tokens[p+k]
        idx = jnp.arange(T - k)
        windows = jax.vmap(lambda p: jax.lax.dynamic_slice_in_dim(tokens, p, k, axis=1), out_axes=1)(idx)  # (N, P, k)
        nxt = tokens[:, k:]                                   # (N, P) token after each window
        match = jnp.all(windows == suffix[:, None, :], axis=-1)  # (N, P)
        # only windows fully inside the generated region: p + k < step
        valid = (idx[None, :] + k) < step
        match = match & valid
        banned = jnp.where(match, nxt, -1)                     # -1 = no ban
        # scatter: for each banned token id set NEG_INF
        onehot = jax.nn.one_hot(banned, lp.shape[-1], dtype=bool)  # (N, P, V); -1 rows all False
        ban_mask = jnp.any(onehot, axis=1)
        return jnp.where(ban_mask, NEG_INF, lp)

    return jax.lax.cond(step >= k, do_block, lambda lp: lp, log_probs)


def top_k_top_p_filter(
    log_probs: jax.Array, top_k: int = -1, top_p: float = -1.0
) -> jax.Array:
    """Sampling filters (reference Sampling search, utils/search.py)."""
    if top_k > 0:
        kth = jnp.sort(log_probs, axis=-1)[..., -top_k][..., None]
        log_probs = jnp.where(log_probs < kth, NEG_INF, log_probs)
    if 0.0 < top_p < 1.0:
        sorted_lp = jnp.sort(log_probs, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_lp, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest set with cumulative prob >= top_p
        cutoff_idx = jnp.argmax(cum >= top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_lp, cutoff_idx[..., None], axis=-1)
        log_probs = jnp.where(log_probs < cutoff, NEG_INF, log_probs)
    return log_probs


def length_penalty(lengths: jax.Array, alpha: float) -> jax.Array:
    """fairseq-style: score / len**alpha (sequence_generator finalize)."""
    return jnp.power(jnp.maximum(lengths, 1).astype(jnp.float32), alpha)


# --------------------------------------------------------------------------
# Candidate-selection strategies (reference ofasys/utils/search.py:19-787).
# Each returns (scores, tokens, beams) of shape (B, M) — the candidate pool
# the beam loop merges into finished/alive sets. The vanilla pool is the
# global top-2K of alive_lp + lp.
# --------------------------------------------------------------------------

def diverse_beam_candidates(
    lp: jax.Array,         # (B, K, V) this step's log-probs
    alive_lp: jax.Array,   # (B, K) cumulative beam scores
    num_groups: int,
    diversity_strength: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Hamming-diversity beam search (reference utils/search.py:532-595):
    beams split into ``num_groups`` slot-interleaved groups (beam i in group
    i % G); group g's log-probs are penalized by ``strength`` times the count
    of times each token was already picked by groups < g this step. The
    penalty persists into the running scores, matching the reference."""
    B, K, V = lp.shape
    G = num_groups
    if K % G != 0:
        raise ValueError(f"beam size {K} must be divisible by num_groups {G}")
    Kg = K // G
    k = min(2 * Kg, Kg * V - 1)
    diversity = jnp.zeros((B, V), lp.dtype)
    ss, tt, bb = [], [], []
    for g in range(G):
        lp_g = lp[:, g::G] + alive_lp[:, g::G, None]
        if g > 0:
            lp_g = lp_g - diversity_strength * diversity[:, None, :]
        s, idx = jax.lax.top_k(lp_g.reshape(B, Kg * V), k)
        toks = idx % V
        beams = (idx // V) * G + g
        diversity = diversity.at[jnp.arange(B)[:, None], toks].add(1.0)
        ss.append(s)
        tt.append(toks)
        bb.append(beams)
    # interleave groups by rank (reference stacks on dim=2 then flattens)
    scores = jnp.stack(ss, axis=-1).reshape(B, -1)
    tokens = jnp.stack(tt, axis=-1).reshape(B, -1)
    beams = jnp.stack(bb, axis=-1).reshape(B, -1)
    return scores, tokens, beams


def diverse_siblings_candidates(
    lp: jax.Array,         # (B, K, V)
    alive_lp: jax.Array,   # (B, K)
    step: jax.Array,
    diversity_rate: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Diverse siblings (reference utils/search.py:718-787, Li & Jurafsky):
    rank each beam's top-k tokens and subtract rank * rate before the global
    top-k, so siblings of one beam compete at a discount. Step 0 is plain
    beam search (only one live beam), matching the reference."""
    B, K, V = lp.shape
    k = min(2 * K, V - 1)
    total = lp + alive_lp[:, :, None]
    s, t = jax.lax.top_k(total, k)                      # (B, K, k) per-beam siblings
    penalty = jnp.arange(1, k + 1, dtype=s.dtype) * diversity_rate
    s = jnp.where(step == 0, s, s - penalty)
    fs, fi = jax.lax.top_k(s.reshape(B, K * k), k)
    beams = fi // k
    tokens = jnp.take_along_axis(t.reshape(B, K * k), fi, axis=1)
    return fs, tokens, beams


# ---- lexically-constrained decoding (DBA-style; reference
# utils/search.py:204-506 + token_generation_constraints.py). Constraints
# are per-sample token sequences that MUST appear in the output. Per-beam
# state = one progress pointer per constraint; candidate selection protects
# the best candidate of every completion "bank" (Post & Vilar dynamic beam
# allocation) so constraint-advancing hypotheses always survive.

class LexicalConstraints(NamedTuple):
    """Array-only (pytree-safe): the static max_bank is returned separately
    by build()."""

    tokens: jax.Array    # (B, C, L) int32, -1 padded
    lengths: jax.Array   # (B, C) int32

    @staticmethod
    def build(batch_constraints) -> Tuple["LexicalConstraints", int]:
        """batch_constraints: list (per sample) of lists of token sequences.
        Returns (constraints, max_bank) — max_bank is static (jit key)."""
        import numpy as np

        B = len(batch_constraints)
        C = max((len(c) for c in batch_constraints), default=1) or 1
        L = max((len(s) for c in batch_constraints for s in c), default=1) or 1
        toks = np.full((B, C, L), -1, np.int32)
        lens = np.zeros((B, C), np.int32)
        for b, cons in enumerate(batch_constraints):
            for c, seq in enumerate(cons):
                toks[b, c, : len(seq)] = np.asarray(seq, np.int32)
                lens[b, c] = len(seq)
        return (
            LexicalConstraints(tokens=jnp.asarray(toks), lengths=jnp.asarray(lens)),
            int(lens.sum(axis=1).max()),
        )


def lex_init_ptr(cons: LexicalConstraints, beam_size: int) -> jax.Array:
    B, C = cons.lengths.shape
    return jnp.zeros((B * beam_size, C), jnp.int32)


def _lex_expected(cons: LexicalConstraints, ptr: jax.Array, beam_size: int):
    """Next expected token per (beam, constraint); -1 when completed."""
    N, C = ptr.shape
    b_idx = jnp.arange(N) // beam_size
    toks = cons.tokens[b_idx]                                  # (N, C, L)
    lens = cons.lengths[b_idx]                                 # (N, C)
    safe = jnp.minimum(ptr, jnp.maximum(lens - 1, 0))
    cur = jnp.take_along_axis(toks, safe[:, :, None], axis=2)[:, :, 0]
    done = ptr >= lens
    return jnp.where(done, -1, cur), done, toks, lens


def lex_advance(cons: LexicalConstraints, ptr: jax.Array, chosen: jax.Array,
                beam_size: int) -> jax.Array:
    """Advance per-beam constraint pointers by the chosen token: match ->
    +1; mismatch mid-constraint -> restart (1 if the token re-starts the
    constraint, else 0); completed constraints stay completed."""
    cur, done, toks, lens = _lex_expected(cons, ptr, beam_size)
    match = (chosen[:, None] == cur) & ~done
    first = toks[:, :, 0]
    restart = jnp.where(chosen[:, None] == first, 1, 0)
    return jnp.where(done, ptr, jnp.where(match, ptr + 1, restart))


def lex_bank(cons: LexicalConstraints, ptr: jax.Array, beam_size: int) -> jax.Array:
    """Completed constraint tokens per beam (the DBA 'bank')."""
    N, C = ptr.shape
    lens = cons.lengths[jnp.arange(N) // beam_size]
    return jnp.minimum(ptr, lens).sum(axis=1)


def lex_candidate_extension(
    cons: LexicalConstraints,
    ptr: jax.Array,            # (N, C)
    lp: jax.Array,             # (B, K, V) log-probs
    alive_lp: jax.Array,       # (B, K)
    beam_size: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-beam constraint-advancing candidates (B, K*C): scores/token/beam —
    appended to the top-2K pool so bank protection can keep them alive."""
    B, K, V = lp.shape
    cur, done, _, _ = _lex_expected(cons, ptr, beam_size)       # (N, C)
    cur2 = cur.reshape(B, K, -1)
    C = cur2.shape[-1]
    safe_tok = jnp.maximum(cur2, 0)
    s = jnp.take_along_axis(lp, safe_tok, axis=2) + alive_lp[:, :, None]
    s = jnp.where(cur2 < 0, NEG_INF, s)                         # completed -> dead
    beams = jnp.broadcast_to(jnp.arange(K)[None, :, None], (B, K, C))
    return s.reshape(B, K * C), safe_tok.reshape(B, K * C), beams.reshape(B, K * C)


def lex_protect(
    scores: jax.Array,       # (B, M) candidate scores (eos'd candidates excluded upstream)
    banks: jax.Array,        # (B, M) candidate bank after taking its token
    max_bank: int,
) -> jax.Array:
    """DBA selection key: boost the best candidate of every non-empty bank so
    one hypothesis per completion level always survives the alive top-K."""
    B, M = scores.shape
    n_banks = max_bank + 1
    bank_mask = banks[:, :, None] == jnp.arange(n_banks)[None, None, :]
    per_bank = jnp.where(bank_mask, scores[:, :, None], NEG_INF)   # (B, M, n_banks)
    best = jnp.argmax(per_bank, axis=1)                            # (B, n_banks)
    has_any = jnp.max(per_bank, axis=1) > NEG_INF / 2              # (B, n_banks)
    # OR-scatter: argmax positions become protected only for non-empty banks
    protected = jnp.zeros((B, M), bool).at[jnp.arange(B)[:, None], best].max(has_any)
    return jnp.where(protected & (scores > NEG_INF / 2), scores + 1e6, scores)


# --------------------------------------------------------------------------
# Trie-constrained decoding (reference: constraint trie masking per decode
# step inside WrapperModel.forward_decoder,
# ofasys/generator/sequence_generator.py:684-752 + ofasys/utils/trie.py:13).
#
# The python Trie is compiled ONCE into static device tables; the while_loop
# carries one int32 state per beam. Memory-aware two-tier layout: states with
# few children live in a padded (S, Km) children table (mask built by
# scatter); rare high-fanout states (the root, typically) get dense (V,)
# rows. This keeps the tables O(total trie tokens) instead of O(S * V).
# --------------------------------------------------------------------------

class CompiledTrie(NamedTuple):
    tok: jax.Array            # (S+1, Km) int32 children tokens, -1 pad; row S = dead state
    nxt: jax.Array            # (S+1, Km) int32 child state ids
    dense_idx: jax.Array      # (S+1,) int32: row into dense tables, -1 if sparse
    dense_allowed: jax.Array  # (D, V) bool
    dense_next: jax.Array     # (D, V) int32
    initial_state: jax.Array  # () int32: state after consuming BOS
    num_states: int           # static (python int): S


def compile_trie(trie, vocab_size: int, bos: int, dense_threshold: int = 64) -> CompiledTrie:
    """Flatten a utils.trie.Trie (whose sequences are [bos] + answer + [eos])
    into jit-ready tables."""
    import numpy as np

    # BFS over dict nodes -> state ids
    nodes = [trie.root]
    ids = {id(trie.root): 0}
    i = 0
    while i < len(nodes):
        for t, child in nodes[i].items():
            if id(child) not in ids:
                ids[id(child)] = len(nodes)
                nodes.append(child)
        i += 1
    S = len(nodes)
    DEAD = S

    children = [sorted((int(t), ids[id(c)]) for t, c in n.items()) for n in nodes]
    sparse = [c for c in children if len(c) <= dense_threshold]
    Km = max([len(c) for c in sparse], default=1) or 1

    tok = np.full((S + 1, Km), -1, np.int32)
    nxt = np.full((S + 1, Km), DEAD, np.int32)
    dense_idx = np.full((S + 1,), -1, np.int32)
    dense_rows_allowed = []
    dense_rows_next = []
    for s, ch in enumerate(children):
        if len(ch) > dense_threshold:
            allowed = np.zeros((vocab_size,), bool)
            nxt_row = np.full((vocab_size,), DEAD, np.int32)
            for t, c in ch:
                allowed[t] = True
                nxt_row[t] = c
            dense_idx[s] = len(dense_rows_allowed)
            dense_rows_allowed.append(allowed)
            dense_rows_next.append(nxt_row)
        else:
            for j, (t, c) in enumerate(ch):
                tok[s, j] = t
                nxt[s, j] = c
    if not dense_rows_allowed:  # keep gathers shape-valid
        dense_rows_allowed.append(np.zeros((vocab_size,), bool))
        dense_rows_next.append(np.full((vocab_size,), DEAD, np.int32))

    # initial state: consume BOS from the root
    init = DEAD
    for t, c in children[0]:
        if t == bos:
            init = c
            break

    return CompiledTrie(
        tok=jnp.asarray(tok),
        nxt=jnp.asarray(nxt),
        dense_idx=jnp.asarray(dense_idx),
        dense_allowed=jnp.asarray(np.stack(dense_rows_allowed)),
        dense_next=jnp.asarray(np.stack(dense_rows_next)),
        initial_state=jnp.asarray(init, jnp.int32),
        num_states=S,
    )


def trie_allowed_mask(ct: CompiledTrie, states: jax.Array, vocab_size: int) -> jax.Array:
    """(N,) beam states -> (N, V) additive mask (0 allowed / NEG_INF banned)."""
    N = states.shape[0]
    t = ct.tok[states]                                   # (N, Km)
    safe = jnp.where(t >= 0, t, vocab_size)              # -1 pads dropped by mode='drop'
    mask = jnp.full((N, vocab_size), NEG_INF, jnp.float32)
    mask = mask.at[jnp.arange(N)[:, None], safe].set(0.0, mode="drop")
    di = ct.dense_idx[states]                            # (N,)
    dmask = jnp.where(ct.dense_allowed[jnp.maximum(di, 0)], 0.0, NEG_INF)
    return jnp.where((di >= 0)[:, None], dmask, mask)


def trie_advance(ct: CompiledTrie, states: jax.Array, tokens: jax.Array) -> jax.Array:
    """Transition each beam's state by its chosen token (off-trie -> dead)."""
    t = ct.tok[states]                                   # (N, Km)
    eq = t == tokens[:, None]
    j = jnp.argmax(eq, axis=1)
    hit = jnp.any(eq, axis=1)
    sparse_next = jnp.where(hit, jnp.take_along_axis(ct.nxt[states], j[:, None], axis=1)[:, 0],
                            jnp.int32(ct.num_states))
    di = ct.dense_idx[states]
    dense_next = jnp.take_along_axis(
        ct.dense_next[jnp.maximum(di, 0)], tokens[:, None], axis=1
    )[:, 0]
    return jnp.where(di >= 0, dense_next, sparse_next)


# --------------------------------------------------------------------------
# Reference-faithful lexical-constraint state machines (reference
# token_generation_constraints.py: OrderedConstraintState :382-498 and
# UnorderedConstraintState :197-353). The reference keeps one python object
# per beam and advances it on the host every step; here each machine is
# (a) a pytree of static tables passed into the jitted decode loop and
# (b) per-beam state arrays carried through the while_loop, so the whole
# beam advances in one vectorized dispatch.
#
# Three representations:
#   "pointer"   — per-constraint progress pointers (TPU-simple; the DBA
#                 bank/protection semantics, not a reference port)
#   "ordered"   — constraints must appear in the given order: a single
#                 pointer into the flattened constraint sequence
#   "unordered" — constraints in any order via a per-sample trie with
#                 generated/completed counters and subtree saturation,
#                 exactly the reference's bookkeeping
# --------------------------------------------------------------------------

import dataclasses


def state_take(state, idx: jax.Array):
    """Reorder per-beam constraint state rows by flat indices."""
    return jax.tree.map(lambda a: a[idx], state)


def _rows_to_sample(n_rows: int, batch: int) -> jax.Array:
    """Row -> sample index for (B, k)-grouped flattened rows."""
    return jnp.arange(n_rows) // (n_rows // batch)


class OrderedConstraints(NamedTuple):
    """Flattened constraint sequence per sample (reference
    ConstraintSequence, token_generation_constraints.py:356-379)."""

    seq: jax.Array        # (B, L) int32 tokens, -1 padded
    endpoints: jax.Array  # (B, L) bool: position ends a constraint
    total: jax.Array      # (B,) int32 total constraint tokens

    @staticmethod
    def build(batch_constraints) -> Tuple["OrderedConstraints", int]:
        import numpy as np

        B = len(batch_constraints)
        L = max((sum(len(s) for s in c) for c in batch_constraints), default=1) or 1
        seq = np.full((B, L), -1, np.int32)
        ends = np.zeros((B, L), bool)
        total = np.zeros((B,), np.int32)
        for b, cons in enumerate(batch_constraints):
            pos = 0
            for s in cons:
                seq[b, pos : pos + len(s)] = np.asarray(s, np.int32)
                ends[b, pos + len(s) - 1] = True
                pos += len(s)
            total[b] = pos
        return (
            OrderedConstraints(jnp.asarray(seq), jnp.asarray(ends), jnp.asarray(total)),
            int(total.max()),
        )


def ord_advance(oc: OrderedConstraints, ptr: jax.Array, tokens: jax.Array,
                batch: int) -> jax.Array:
    """Reference OrderedConstraintState.advance (:456-498): finished -> stay;
    next-token match -> +1; at a constraint endpoint (incl. root, which
    mirrors the reference's endpoints[-1] lookup) -> stay; first token ->
    restart at 0; else -> root (-1)."""
    M = ptr.shape[0]
    b = _rows_to_sample(M, batch)
    L = oc.seq.shape[1]
    tot = oc.total[b]
    fin = ptr + 1 >= tot
    nxt = oc.seq[b, jnp.clip(ptr + 1, 0, L - 1)]
    match = ~fin & (tokens == nxt)
    cur_ep = jnp.where(ptr < 0, True, oc.endpoints[b, jnp.clip(ptr, 0, L - 1)])
    first = oc.seq[b, 0]
    return jnp.where(
        fin, ptr,
        jnp.where(match, ptr + 1,
                  jnp.where(cur_ep, ptr,
                            jnp.where(tokens == first, 0, -1))),
    ).astype(jnp.int32)


class UnorderedTrieConstraints(NamedTuple):
    """Per-sample constraint tries, padded to a common (S, Km) shape
    (reference ConstraintNode, token_generation_constraints.py:106-194).
    Node 0 is the root."""

    ctok: jax.Array      # (B, S, Km) child token ids, -1 padded
    cnxt: jax.Array      # (B, S, Km) child node ids
    parent: jax.Array    # (B, S) parent node id (root -> 0)
    terminal: jax.Array  # (B, S) #constraints ending exactly here
    subtree: jax.Array   # (B, S) #constraints in the subtree (num_constraints)
    n_cons: jax.Array    # (B,) #constraints of the sample

    @staticmethod
    def build(batch_constraints) -> Tuple["UnorderedTrieConstraints", int, int, int]:
        """Returns (tables, max_bank, depth, Km) — the last three are static."""
        import numpy as np

        B = len(batch_constraints)
        tries = []
        for cons in batch_constraints:
            # node: [children {tok: id}, parent, terminal, subtree, depth]
            nodes = [{"ch": {}, "par": 0, "term": 0, "sub": 0, "d": 0}]
            for s in cons:
                cur = 0
                for t in s:
                    t = int(t)
                    if t not in nodes[cur]["ch"]:
                        nodes.append({"ch": {}, "par": cur, "term": 0, "sub": 0,
                                      "d": nodes[cur]["d"] + 1})
                        nodes[cur]["ch"][t] = len(nodes) - 1
                    cur = nodes[cur]["ch"][t]
                nodes[cur]["term"] += 1
                while True:  # num_constraints along the path incl. root
                    nodes[cur]["sub"] += 1
                    if cur == 0:
                        break
                    cur = nodes[cur]["par"]
            tries.append(nodes)

        S = max(len(n) for n in tries)
        Km = max((len(nd["ch"]) for n in tries for nd in n), default=1) or 1
        depth = max((nd["d"] for n in tries for nd in n), default=1) or 1
        ctok = np.full((B, S, Km), -1, np.int32)
        cnxt = np.zeros((B, S, Km), np.int32)
        parent = np.zeros((B, S), np.int32)
        terminal = np.zeros((B, S), np.int32)
        subtree = np.zeros((B, S), np.int32)
        n_cons = np.zeros((B,), np.int32)
        for b, nodes in enumerate(tries):
            n_cons[b] = len(batch_constraints[b])
            for i, nd in enumerate(nodes):
                parent[b, i] = nd["par"]
                terminal[b, i] = nd["term"]
                subtree[b, i] = nd["sub"]
                for j, (t, c) in enumerate(sorted(nd["ch"].items())):
                    ctok[b, i, j] = t
                    cnxt[b, i, j] = c
        max_bank = int(max((sum(len(s) for s in c) for c in batch_constraints),
                           default=0))
        return (
            UnorderedTrieConstraints(
                jnp.asarray(ctok), jnp.asarray(cnxt), jnp.asarray(parent),
                jnp.asarray(terminal), jnp.asarray(subtree), jnp.asarray(n_cons),
            ),
            max_bank, depth, Km,
        )


class UnorderedTrieState(NamedTuple):
    node: jax.Array   # (M,) int32 current trie node
    gen: jax.Array    # (M, S) int32 generated count per node
    comp: jax.Array   # (M, S) int32 completed count per node


def unord_init(ut: UnorderedTrieConstraints, n_rows: int) -> UnorderedTrieState:
    S = ut.parent.shape[1]
    return UnorderedTrieState(
        node=jnp.zeros((n_rows,), jnp.int32),
        gen=jnp.zeros((n_rows, S), jnp.int32),
        comp=jnp.zeros((n_rows, S), jnp.int32),
    )


def unord_advance(ut: UnorderedTrieConstraints, st: UnorderedTrieState,
                  tokens: jax.Array, batch: int, depth: int) -> UnorderedTrieState:
    """Reference UnorderedConstraintState.advance (:293-353), vectorized:
    (1) matching, non-saturated child -> descend (generated[child] += 1);
    (2) otherwise fall off: take the matching root child if unsaturated,
        else the root, and rewind the abandoned path — the first ancestor
        that is an uncompleted terminal gets completed[a] += 1 (stop),
        every ancestor before it gets generated[a] -= 1."""
    M = tokens.shape[0]
    rows = jnp.arange(M)
    b = _rows_to_sample(M, batch)
    cur, gen, comp = st.node, st.gen, st.comp

    ct = ut.ctok[b, cur]                                   # (M, Km)
    match = (ct == tokens[:, None]) & (ct >= 0)
    has_child = match.any(axis=1)
    child = ut.cnxt[b, cur, jnp.argmax(match, axis=1)]
    child_ok = has_child & (gen[rows, child] < ut.subtree[b, child])

    rt = ut.ctok[b, 0]
    rmatch = (rt == tokens[:, None]) & (rt >= 0)
    has_root = rmatch.any(axis=1)
    rchild = ut.cnxt[b, 0, jnp.argmax(rmatch, axis=1)]
    root_ok = has_root & (gen[rows, rchild] < ut.subtree[b, rchild])

    new_node = jnp.where(child_ok, child, jnp.where(root_ok, rchild, 0))
    falls = ~child_ok

    def rewind(i, carry):
        c, gen, comp, stopped = carry
        active = falls & (c != 0) & ~stopped
        can_complete = ut.terminal[b, c] > comp[rows, c]
        do_complete = active & can_complete
        comp = comp.at[rows, c].add(do_complete.astype(jnp.int32))
        do_decr = active & ~can_complete
        gen = gen.at[rows, c].add(-do_decr.astype(jnp.int32))
        c = jnp.where(do_decr, ut.parent[b, c], c)
        return c, gen, comp, stopped | do_complete

    _, gen, comp, _ = jax.lax.fori_loop(
        0, depth, rewind, (cur, gen, comp, jnp.zeros((M,), bool))
    )
    gen = gen.at[rows, new_node].add((new_node != 0).astype(jnp.int32))
    return UnorderedTrieState(new_node, gen, comp)


def unord_num_completed(ut: UnorderedTrieConstraints, st: UnorderedTrieState,
                        batch: int) -> jax.Array:
    """Completed constraints incl. the in-final current node (:256-264)."""
    M = st.node.shape[0]
    rows = jnp.arange(M)
    b = _rows_to_sample(M, batch)
    in_final = (ut.terminal[b, st.node] > st.comp[rows, st.node]) & (st.node != 0)
    return st.comp.sum(axis=1) + in_final.astype(jnp.int32)


# ------------------------------- machines (static strategy over the tables)

@dataclasses.dataclass(frozen=True)
class PointerMachine:
    """The original per-constraint-pointer tracker (lex_* family above)."""

    batch: int
    max_bank: int

    def init(self, t: LexicalConstraints, n_rows: int):
        return jnp.zeros((n_rows, t.lengths.shape[1]), jnp.int32)

    def advance(self, t, ptr, tokens):
        return lex_advance(t, ptr, tokens, ptr.shape[0] // self.batch)

    def bank(self, t, ptr):
        return lex_bank(t, ptr, ptr.shape[0] // self.batch)

    def met(self, t, ptr):
        b = _rows_to_sample(ptr.shape[0], self.batch)
        return self.bank(t, ptr) >= t.lengths.sum(axis=1)[b]

    def extension(self, t, ptr, lp, alive_lp):
        return lex_candidate_extension(t, ptr, lp, alive_lp, lp.shape[1])


@dataclasses.dataclass(frozen=True)
class OrderedMachine:
    batch: int
    max_bank: int

    def init(self, t: OrderedConstraints, n_rows: int):
        return jnp.full((n_rows,), -1, jnp.int32)

    def advance(self, t, ptr, tokens):
        return ord_advance(t, ptr, tokens, self.batch)

    def bank(self, t, ptr):
        return ptr + 1

    def met(self, t, ptr):
        b = _rows_to_sample(ptr.shape[0], self.batch)
        return ptr + 1 >= t.total[b]

    def extension(self, t, ptr, lp, alive_lp):
        """Two advancing candidates per beam: the next expected token and,
        for mid-sequence states (reference next_tokens :443-454), the
        restart token seq[0]."""
        B, K, V = lp.shape
        L = t.seq.shape[1]
        b = _rows_to_sample(ptr.shape[0], self.batch)
        fin = ptr + 1 >= t.total[b]
        nxt = t.seq[b, jnp.clip(ptr + 1, 0, L - 1)]
        first = t.seq[b, 0]
        toks = jnp.stack([jnp.where(fin, 0, jnp.maximum(nxt, 0)),
                          jnp.maximum(first, 0)], axis=1).reshape(B, K * 2)
        valid = jnp.stack([~fin, (ptr > 0) & (t.total[b] > 0)], axis=1)
        s = jnp.take_along_axis(
            lp, toks.reshape(B, K, 2), axis=2
        ) + alive_lp[:, :, None]
        s = jnp.where(valid.reshape(B, K, 2), s, NEG_INF).reshape(B, K * 2)
        beams = jnp.broadcast_to(jnp.arange(K)[None, :, None], (B, K, 2))
        return s, toks, beams.reshape(B, K * 2)


@dataclasses.dataclass(frozen=True)
class UnorderedMachine:
    batch: int
    max_bank: int
    depth: int
    fanout: int

    def init(self, t: UnorderedTrieConstraints, n_rows: int):
        return unord_init(t, n_rows)

    def advance(self, t, st, tokens):
        return unord_advance(t, st, tokens, self.batch, self.depth)

    def bank(self, t, st):
        return st.gen.sum(axis=1)

    def met(self, t, st):
        b = _rows_to_sample(st.node.shape[0], self.batch)
        return unord_num_completed(t, st, self.batch) >= t.n_cons[b]

    def extension(self, t, st, lp, alive_lp):
        """Advancing candidates per beam: children of the current node plus
        children of the root (reference next_tokens :282-291), saturated
        subtrees excluded; root duplicates of node children are dropped."""
        B, K, V = lp.shape
        M = st.node.shape[0]
        rows = jnp.arange(M)
        b = _rows_to_sample(M, self.batch)
        Km = self.fanout
        toks = jnp.concatenate([t.ctok[b, st.node], t.ctok[b, 0]], axis=1)  # (M, 2Km)
        nodes = jnp.concatenate([t.cnxt[b, st.node], t.cnxt[b, 0]], axis=1)
        valid = (toks >= 0) & (st.gen[rows[:, None], nodes] < t.subtree[b[:, None], nodes])
        dup = (toks[:, Km:, None] == toks[:, None, :Km]).any(axis=2) & (toks[:, Km:] >= 0)
        valid = valid.at[:, Km:].set(valid[:, Km:] & ~dup)
        safe = jnp.maximum(toks, 0).reshape(B, K, 2 * Km)
        s = jnp.take_along_axis(lp, safe, axis=2) + alive_lp[:, :, None]
        s = jnp.where(valid.reshape(B, K, 2 * Km), s, NEG_INF).reshape(B, K * 2 * Km)
        beams = jnp.broadcast_to(jnp.arange(K)[None, :, None], (B, K, 2 * Km))
        return s, safe.reshape(B, K * 2 * Km), beams.reshape(B, K * 2 * Km)


def build_constraints(batch_constraints, representation: str):
    """-> (tables pytree, static machine). The machine is hashable and part
    of the jit cache key; the tables are traced arguments."""
    B = len(batch_constraints)
    if representation == "pointer":
        tables, max_bank = LexicalConstraints.build(batch_constraints)
        return tables, PointerMachine(batch=B, max_bank=max_bank)
    if representation == "ordered":
        tables, max_bank = OrderedConstraints.build(batch_constraints)
        return tables, OrderedMachine(batch=B, max_bank=max_bank)
    if representation == "unordered":
        tables, max_bank, depth, Km = UnorderedTrieConstraints.build(batch_constraints)
        return tables, UnorderedMachine(batch=B, max_bank=max_bank,
                                        depth=depth, fanout=Km)
    raise ValueError(f"unknown constraint representation: {representation!r}")
