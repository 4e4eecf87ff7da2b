"""Search-space shaping helpers used inside the jitted decode loops
(reference ofasys/utils/search.py, 787 LoC of stateful torch Search classes;
here they are pure logit transforms that fuse into the decode step)."""

from __future__ import annotations

from typing import Optional, Tuple

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
