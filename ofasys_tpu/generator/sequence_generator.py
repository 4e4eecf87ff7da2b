"""Jitted beam search over the GeneralistModel.

Replaces the reference's python-stateful fairseq beam loop
(ofasys/generator/sequence_generator.py:66-778) with a single
lax.while_loop compiled once per (batch, beam, max_len) shape:

  * encoder runs once; encoder-out is beam-expanded to B*K rows
  * the decoder KV cache is an explicit pytree reordered with one gather per
    step (the reference's reorder_incremental_state)
  * EOS is force-selected at the final step, so exactly K finished
    hypotheses always exist (the reference's unfinished-finalization path)
  * vocab shaping (min-len, constraint ranges, n-gram blocking, prefix
    forcing) are pure logit transforms from generator/search.py

Greedy decode is beam_size=1 (bit-identical argmax path).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu.generator import search
from ofasys_tpu.generator.base import SequenceGeneratorOutput
from ofasys_tpu.model.ofa import EncoderOut
from ofasys_tpu.utils.pytree import SlotBatch
from ofasys_tpu.ops.quant import as_variables as _vars

NEG_INF = search.NEG_INF


def _expand_beam(tree, beam_size: int):
    """(B, ...) -> (B*K, ...) by repeat-interleave on dim 0. Note: batch-
    independent leaves (pos embeds, biases with batch dim 1) must NOT pass
    through here — they stay broadcastable; the caller routes them."""

    def f(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        return jnp.repeat(x, beam_size, axis=0)

    return jax.tree.map(f, tree)


def _gather_beams(tree, beam_idx: jax.Array, batch: int, beam_size: int):
    """Reorder (B*K, ...) leaves by per-batch beam indices (B, K_new)."""

    def f(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        if x.shape[0] == 1:  # broadcast leaf, nothing to reorder
            return x
        y = x.reshape((batch, beam_size) + x.shape[1:])
        idx = beam_idx.reshape(batch, -1)
        y = jnp.take_along_axis(
            y, idx.reshape(idx.shape + (1,) * (y.ndim - 2)), axis=1
        )
        return y.reshape((-1,) + x.shape[1:])

    return jax.tree.map(f, tree)


class SequenceGenerator:
    """Configured per task (reference task/base.py:464-570 dispatch)."""

    def __init__(
        self,
        model,                       # GeneralistModel or a list (ensemble)
        dictionary,
        beam_size: int = 5,
        max_len_a: float = 0.0,
        max_len_b: int = 200,
        min_len: int = 1,
        temperature: float = 1.0,
        lenpen: float = 1.0,
        unkpen: float = 0.0,
        max_len: int = -1,
        normalize_scores: bool = True,
        match_source_len: bool = False,
        no_repeat_ngram_size: int = 0,
        constraint_range: Optional[str] = None,
        sampling: bool = False,
        sampling_topk: int = -1,
        sampling_topp: float = -1.0,
        return_n_best: int = 1,
        constraint_trie=None,
        search_strategy: str = "beam",   # beam | diverse_beam | diverse_siblings | lexical
        num_groups: int = 2,             # diverse_beam
        diversity_strength: float = 0.5, # diverse_beam Hamming penalty
        diversity_rate: float = 0.5,     # diverse_siblings rank penalty
        constraint_representation: str = "unordered",  # pointer | ordered | unordered
    ):
        # ensemble decoding (reference EnsembleModel,
        # sequence_generator.py:754-778 + utils/checkpoint_utils.py:346
        # load_model_ensemble_and_task): step log-probs are the log of the
        # MEAN probability across models (logsumexp - log n); each model
        # carries its own KV cache through the one jitted while_loop
        self.models = list(model) if isinstance(model, (list, tuple)) else [model]
        self.model = self.models[0]
        self.dictionary = dictionary
        self.bos = dictionary.bos()
        self.eos = dictionary.eos()
        self.pad = dictionary.pad()
        self.beam_size = beam_size
        self.max_len_a = max_len_a
        self.max_len_b = max_len_b
        self.min_len = min_len
        self.temperature = temperature
        self.lenpen = lenpen
        self.unkpen = unkpen
        self.max_len_cap = max_len
        self.normalize_scores = normalize_scores
        self.match_source_len = match_source_len
        self.unk = dictionary.unk()
        self.ngram = no_repeat_ngram_size
        self.sampling = sampling
        self.sampling_topk = sampling_topk
        self.sampling_topp = sampling_topp
        self.return_n_best = max(1, return_n_best)
        self.search_strategy = search_strategy
        self.num_groups = num_groups
        self.diversity_strength = diversity_strength
        self.diversity_rate = diversity_rate
        self.constraint_representation = constraint_representation
        self.constraint_start = self.constraint_end = None
        if constraint_range:
            # both "lo,hi" and the reference's "(lo,hi)" spelling
            # (reference task/image_gen.py:29-31)
            lo, hi = constraint_range.strip("() ").split(",")
            self.constraint_start, self.constraint_end = int(lo), int(hi)
        # closed-set constraint trie -> compiled device tables (reference
        # masks logits with the trie per step, sequence_generator.py:684-752)
        self.trie = (
            search.compile_trie(constraint_trie, len(dictionary), self.bos)
            if constraint_trie is not None
            else None
        )
        self._compiled: Dict[Any, Any] = {}
        # device-resident arg cache: re-putting the PRNG key / empty prefix
        # every call adds transfer latency to the decode chain on a tunneled
        # device (measured ~4ms of the 42ms wall; the compute floor is
        # RTT + ~12ms device-busy for a 16-token greedy decode)
        self._rng_cache: Dict[int, Any] = {}
        self._empty_prefix: Dict[int, Any] = {}

    # ----------------------------------------------------------- public API
    def generate(self, params, sample: Dict[str, Any], prefix_tokens: Optional[np.ndarray] = None,
                 seed: int = 0) -> List[List[SequenceGeneratorOutput]]:
        slots = sample["net_input"]["slots"]
        src_slots = [s for s in slots if s.is_src]
        tgt_slot = SlotBatch.target_slot(slots)
        B = src_slots[0].value["inputs"].shape[0] if isinstance(src_slots[0].value, dict) else \
            next(iter(src_slots[0].value.values())).shape[0]
        # max_len = a * src_len + b (reference sequence_generator.py:213);
        # src lengths are static per template so the jit cache key is stable
        src_len = 0
        for s in src_slots:
            v = s.value if isinstance(s.value, dict) else {}
            x = v.get("inputs")
            if x is not None and getattr(x, "ndim", 0) == 2:
                src_len = max(src_len, int(x.shape[1]))
        max_len = int(self.max_len_a * src_len + self.max_len_b)
        if self.max_len_cap > 0:
            max_len = min(max_len, self.max_len_cap)
        min_len = self.min_len
        if self.match_source_len and src_len > 0:
            # reference LengthConstrainedBeamSearch via match_source_len
            # (task/base.py:494-520): output length pinned to source length
            max_len = min_len = src_len

        P = 0
        if prefix_tokens is None and sample.get("prefix_tokens") is not None:
            pt = np.asarray(sample["prefix_tokens"])
            if pt.size and pt.shape[1] > 0:
                prefix_tokens = pt
        if prefix_tokens is not None:
            prefix_tokens = jnp.asarray(np.asarray(prefix_tokens, np.int32))
            P = prefix_tokens.shape[1]
        else:
            if B not in self._empty_prefix:
                self._empty_prefix[B] = jnp.zeros((B, 0), jnp.int32)
            prefix_tokens = self._empty_prefix[B]
        if seed not in self._rng_cache:
            self._rng_cache[seed] = jax.random.PRNGKey(seed)
        rng_key = self._rng_cache[seed]

        cons = None
        mach = None
        if self.search_strategy == "lexical":
            raw = sample.get("constraints")
            if raw is None:
                raise ValueError("search_strategy='lexical' needs sample['constraints'] "
                                 "(per-sample lists of token sequences)")
            cons, mach = search.build_constraints(raw, self.constraint_representation)

        key = (B, max_len, min_len, P, self.beam_size, self.sampling,
               self.search_strategy,
               None if cons is None
               else (jax.tree.map(lambda a: a.shape, cons), mach))
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                functools.partial(self._generate, max_len=max_len, min_len=min_len,
                                  prefix_len=P, mach=mach)
            )
        seqs, scores = self._compiled[key](params, src_slots, tgt_slot, prefix_tokens,
                                           rng_key, cons)
        # ONE device_get for both outputs: sequential np.asarray() readbacks
        # each pay a full tunnel round-trip (~30ms on axon), doubling decode
        # wall time for no reason
        seqs, scores = jax.device_get((seqs, scores))
        return self._finalize(seqs, scores)

    def _finalize(self, seqs: np.ndarray, scores: np.ndarray) -> List[List[SequenceGeneratorOutput]]:
        out: List[List[SequenceGeneratorOutput]] = []
        for b in range(seqs.shape[0]):
            order = np.argsort(-scores[b])[: self.return_n_best]
            hyps = []
            for k in order:
                toks = seqs[b, k, 1:]  # drop bos
                eos_pos = np.nonzero(toks == self.eos)[0]
                if eos_pos.size:
                    toks = toks[: eos_pos[0] + 1]
                hyps.append(SequenceGeneratorOutput(tokens=toks, score=float(scores[b, k])))
            out.append(hyps)
        return out

    def _norm(self, length):
        """Score normalizer: length**lenpen when normalize_scores (reference
        normalize_scores/len_penalty, sequence_generator.py:76-77), else 1."""
        if not self.normalize_scores:
            return jnp.float32(1.0)
        return search.length_penalty(length, self.lenpen)

    # --------------------------------------------------------------- jitted
    def _generate(self, params, src_slots, tgt_slot, prefix_tokens, rng, cons=None, *,
                  max_len: int, min_len: int, prefix_len: int, mach=None):
        K = self.beam_size
        plist = list(params) if isinstance(params, (list, tuple)) else [params]
        n_models = len(self.models)
        encs, bias_specs, cross_biases, caches = [], [], [], []
        B = N = T_buf = None
        for m, p in zip(self.models, plist):
            net = m.net
            enc = net.apply(_vars(p), src_slots, method=net.encode)
            if B is None:
                B = enc.x.shape[0]
                N = B * K
                T_buf = max_len + 2
                dummy = dataclasses.replace(
                    tgt_slot, value={"inputs": jnp.zeros((N, T_buf), jnp.int32)}
                )
            enc = EncoderOut(
                x=_expand_beam(enc.x, K),
                padding_mask=_expand_beam(enc.padding_mask, K),
                pos_embed=enc.pos_embed,  # batch-1, broadcastable
            )
            bias_spec, cross_bias, cache = net.apply(
                _vars(p), [dummy], enc, T_buf, method=net.decode_prepare
            )
            encs.append(enc)
            bias_specs.append(bias_spec)
            cross_biases.append(cross_bias)
            caches.append(cache)
        cache = tuple(caches)   # one KV-cache pytree per ensemble member

        seq = jnp.full((B, K, T_buf), self.pad, jnp.int32).at[:, :, 0].set(self.bos)
        alive_lp = jnp.tile(jnp.asarray([[0.0] + [NEG_INF] * (K - 1)]), (B, 1))  # only beam 0 alive at start
        fin_seq = jnp.zeros_like(seq)
        fin_scores = jnp.full((B, K), NEG_INF)
        fin_flags = jnp.zeros((B, K), bool)
        # one trie state per beam (dummy zeros when unconstrained)
        tstates = (
            jnp.broadcast_to(self.trie.initial_state, (N,)).astype(jnp.int32)
            if self.trie is not None
            else jnp.zeros((N,), jnp.int32)
        )
        # lexical-constraint state, one row per beam (machine-specific pytree)
        lexical = self.search_strategy == "lexical" and cons is not None
        lexstate = mach.init(cons, N) if lexical else jnp.zeros((N, 1), jnp.int32)

        def step_logits(carry_seq, step, cache):
            """Single model: raw last-token logits (the caller applies
            temperature + log_softmax, keeping the 1-model path bit-identical
            to before). Ensemble: already-normalized mean-probability
            log-probs (reference EnsembleModel.forward_decoder)."""
            tokens = jax.lax.dynamic_slice_in_dim(
                carry_seq.reshape(N, T_buf), step, 1, axis=1
            )
            outs, new_caches = [], []
            for i, (m, p) in enumerate(zip(self.models, plist)):
                net_i = m.net
                logits, _, nc = net_i.apply(
                    _vars(p), tokens, step, encs[i], bias_specs[i],
                    cross_biases[i], cache[i], tgt_slot, method=net_i.decode_step,
                )
                outs.append(logits[:, -1].astype(jnp.float32))
                new_caches.append(nc)
            if n_models == 1:
                return outs[0], (new_caches[0],)
            if self.temperature != 1.0:
                outs = [o / self.temperature for o in outs]
            lps = jnp.stack([jax.nn.log_softmax(o, axis=-1) for o in outs])
            avg = jax.nn.logsumexp(lps, axis=0) - jnp.log(float(n_models))
            return avg, tuple(new_caches)

        def cond(state):
            step, seq, alive_lp, fin_seq, fin_scores, fin_flags, cache, rng, tstates, lexstate = state
            best_alive = jnp.max(alive_lp, axis=1) / self._norm(jnp.asarray(max_len))
            worst_fin = jnp.min(jnp.where(fin_flags, fin_scores, NEG_INF), axis=1)
            improvable = jnp.any(~fin_flags.all(axis=1) | (best_alive > worst_fin))
            return (step <= max_len) & improvable

        def body(state):
            step, seq, alive_lp, fin_seq, fin_scores, fin_flags, cache, rng, tstates, lexstate = state
            lp, cache = step_logits(seq, step, cache)           # (N, V)
            if n_models == 1:
                if self.temperature != 1.0:
                    lp = lp / self.temperature
                lp = jax.nn.log_softmax(lp, axis=-1)
            V = lp.shape[-1]

            lp = search.apply_min_len(lp, step, min_len, self.eos)
            if self.unkpen:
                # reference unk penalty (sequence_generator.py:77): subtract
                # unkpen from <unk>'s log-prob at every step
                lp = lp.at[:, self.unk].add(-self.unkpen)
            if self.trie is not None:
                lp = lp + search.trie_allowed_mask(self.trie, tstates, V)
            if self.constraint_start is not None:
                lp = search.apply_constraint_range(lp, self.constraint_start, self.constraint_end, self.eos)
            if self.ngram > 0:
                lp = search.block_repeat_ngrams(lp, seq.reshape(N, T_buf), step + 1, self.ngram)

            # lexical constraints: EOS is banned until every constraint is
            # met (guarantees emitted sequences contain all constraints)
            if lexical:
                unmet = ~mach.met(cons, lexstate)                    # (N,)
                lp = lp.at[:, self.eos].set(
                    jnp.where(unmet, NEG_INF, lp[:, self.eos])
                )

            # force EOS at the last step so every beam finishes
            only_eos = jnp.full((V,), NEG_INF).at[self.eos].set(0.0)
            lp = jnp.where(step == max_len, only_eos[None, :], lp)

            # force prefix tokens during the first prefix_len steps
            if prefix_len > 0:
                def force(lp):
                    tok = jax.lax.dynamic_index_in_dim(prefix_tokens, step, axis=1, keepdims=False)  # (B,)
                    tok = jnp.repeat(tok, K, axis=0)  # (N,)
                    forced = jnp.full_like(lp, NEG_INF)
                    forced = forced.at[jnp.arange(N), tok].set(0.0)
                    return forced
                lp = jax.lax.cond(step < prefix_len, force, lambda x: x, lp)

            if self.sampling:
                lp = search.top_k_top_p_filter(lp, self.sampling_topk, self.sampling_topp)

            lp = lp.reshape(B, K, V)
            cand_lp = alive_lp[:, :, None] + lp                  # (B, K, V)
            flat = cand_lp.reshape(B, K * V)

            cand_banks = None
            if self.sampling:
                rng, sub = jax.random.split(rng)
                # independent per-beam sampling: pick token per beam, keep beams
                tok = jax.random.categorical(sub, lp.reshape(B * K, V), axis=-1).reshape(B, K)
                cand_idx = jnp.arange(K)[None, :] * V + tok      # (B, K) -> pretend topk of K
                topk_lp = jnp.take_along_axis(flat, cand_idx, axis=1)
                cand_beam = cand_idx // V
                cand_tok = cand_idx % V
            elif self.search_strategy == "diverse_beam":
                topk_lp, cand_tok, cand_beam = search.diverse_beam_candidates(
                    lp, alive_lp, self.num_groups, self.diversity_strength
                )
            elif self.search_strategy == "diverse_siblings":
                topk_lp, cand_tok, cand_beam = search.diverse_siblings_candidates(
                    lp, alive_lp, step, self.diversity_rate
                )
            elif lexical:
                topk_lp, topk_idx = jax.lax.top_k(flat, 2 * K)
                cand_beam = topk_idx // V
                cand_tok = topk_idx % V
                # append per-beam constraint-advancing candidates so bank
                # protection can keep them alive
                ext_s, ext_t, ext_b = mach.extension(cons, lexstate, lp, alive_lp)
                dup = jnp.any(
                    (ext_b[:, :, None] == cand_beam[:, None, :])
                    & (ext_t[:, :, None] == cand_tok[:, None, :]),
                    axis=-1,
                )
                ext_s = jnp.where(dup, NEG_INF, ext_s)
                topk_lp = jnp.concatenate([topk_lp, ext_s], axis=1)
                cand_beam = jnp.concatenate([cand_beam, ext_b], axis=1)
                cand_tok = jnp.concatenate([cand_tok, ext_t], axis=1)
                # state + bank of every candidate after taking its token
                M = cand_tok.shape[1]
                flat_rows = (jnp.arange(B)[:, None] * K + cand_beam).reshape(-1)
                prev = search.state_take(lexstate, flat_rows)
                cand_adv = mach.advance(cons, prev, cand_tok.reshape(-1))
                cand_banks = mach.bank(cons, cand_adv).reshape(B, M)
            else:
                topk_lp, topk_idx = jax.lax.top_k(flat, 2 * K)   # (B, 2K)
                cand_beam = topk_idx // V
                cand_tok = topk_idx % V

            # extend sequences
            cand_seq = jnp.take_along_axis(seq, cand_beam[:, :, None], axis=1)  # (B, n_cand, T)
            cand_seq = cand_seq.at[:, :, step + 1].set(cand_tok)

            is_eos = cand_tok == self.eos
            # ---- merge newly finished into the finished pool
            cand_scores = topk_lp / self._norm(step + 1)
            can_finish = is_eos
            if cand_banks is not None:
                # a hypothesis may only finish once every constraint is met
                # (the max_len EOS force would otherwise leak unmet beams)
                met_beam = mach.met(cons, lexstate).reshape(B, K)
                met = jnp.take_along_axis(met_beam, cand_beam, axis=1)
                can_finish = is_eos & met
            new_fin_scores = jnp.where(can_finish, cand_scores, NEG_INF)
            all_fin_seq = jnp.concatenate([fin_seq, cand_seq], axis=1)
            all_fin_scores = jnp.concatenate([fin_scores, new_fin_scores], axis=1)
            all_fin_flags = jnp.concatenate([fin_flags, can_finish], axis=1)
            top_fin_scores, top_fin_idx = jax.lax.top_k(all_fin_scores, K)
            fin_seq = jnp.take_along_axis(all_fin_seq, top_fin_idx[:, :, None], axis=1)
            fin_scores = top_fin_scores
            fin_flags = jnp.take_along_axis(all_fin_flags, top_fin_idx, axis=1)

            # ---- pick K alive (non-eos) candidates
            alive_cand_lp = jnp.where(is_eos, NEG_INF, topk_lp)
            if cand_banks is not None:
                # DBA: protect the best candidate of every completion bank
                sel_key = search.lex_protect(alive_cand_lp, cand_banks, mach.max_bank)
                _, alive_idx = jax.lax.top_k(sel_key, K)
                new_alive_lp = jnp.take_along_axis(alive_cand_lp, alive_idx, axis=1)
            else:
                new_alive_lp, alive_idx = jax.lax.top_k(alive_cand_lp, K)
            seq = jnp.take_along_axis(cand_seq, alive_idx[:, :, None], axis=1)
            chosen_beam = jnp.take_along_axis(cand_beam, alive_idx, axis=1)    # (B, K)
            cache = _gather_beams(cache, chosen_beam, B, K)
            if self.trie is not None:
                prev = jnp.take_along_axis(tstates.reshape(B, K), chosen_beam, axis=1)
                alive_tok = jnp.take_along_axis(cand_tok, alive_idx, axis=1)
                tstates = search.trie_advance(
                    self.trie, prev.reshape(N), alive_tok.reshape(N)
                )
            if cand_banks is not None:
                M = cand_tok.shape[1]
                lexstate = search.state_take(
                    cand_adv, (jnp.arange(B)[:, None] * M + alive_idx).reshape(-1)
                )
            return (step + 1, seq, new_alive_lp, fin_seq, fin_scores, fin_flags, cache, rng,
                    tstates, lexstate)

        state = (jnp.int32(0), seq, alive_lp, fin_seq, fin_scores, fin_flags, cache, rng,
                 tstates, lexstate)
        state = jax.lax.while_loop(cond, body, state)
        return state[3], state[4]
