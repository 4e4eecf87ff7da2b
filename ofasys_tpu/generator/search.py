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
