"""Autoregressive speech (TTS) generator
(reference ofasys/generator/speech_generator.py:84-200).

Frame-synchronous lax.while_loop: each step feeds the last generated mel
frame through the decoder (prenet adaptor), collects the postnet-refined
frame and an EOS probability; a sample stops when sigmoid(eos) > threshold.
The python frame loop of the reference becomes one compiled program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu.generator.base import SpeechGeneratorOutput
from ofasys_tpu.utils.pytree import SlotBatch
from ofasys_tpu.ops.quant import as_variables as _vars


class AutoRegressiveSpeechGenerator:
    def __init__(
        self,
        model,
        num_mels: int = 80,
        n_frames_per_step: int = 1,
        max_iter: int = 512,
        eos_prob_threshold: float = 0.5,
        gcmvn_stats: Optional[Any] = None,
    ):
        self.model = model
        self.num_mels = num_mels
        self.out_dim = num_mels * n_frames_per_step
        self.max_iter = max_iter
        self.eos_prob_threshold = eos_prob_threshold
        # corpus-level CMVN denorm (reference speech_generator.py:73-79,175):
        # (mean, std) arrays of shape (num_mels,), or a path to an .npz
        self.gcmvn_mean = self.gcmvn_std = None
        if gcmvn_stats is not None:
            if isinstance(gcmvn_stats, str):
                stats = np.load(gcmvn_stats)
                gcmvn_stats = (stats["mean"], stats["std"])
            self.gcmvn_mean = np.asarray(gcmvn_stats[0], np.float32)
            self.gcmvn_std = np.asarray(gcmvn_stats[1], np.float32)
        self._compiled: Dict[Any, Any] = {}

    def gcmvn_denormalize(self, frames: np.ndarray) -> np.ndarray:
        """x * std + mean over the mel axis; frames may be packed
        (T, num_mels * n_frames_per_step)."""
        if self.gcmvn_mean is None:
            return frames
        shape = frames.shape
        x = frames.reshape(-1, self.num_mels)
        x = x * self.gcmvn_std[None, :] + self.gcmvn_mean[None, :]
        return x.reshape(shape)

    def generate(self, params, sample: Dict[str, Any], seed: int = 0) -> List[SpeechGeneratorOutput]:
        slots = sample["net_input"]["slots"]
        src_slots = [s for s in slots if s.is_src]
        tgt_slot = SlotBatch.target_slot(slots)
        B = next(iter(src_slots[0].value.values())).shape[0]
        key = B
        if key not in self._compiled:
            self._compiled[key] = jax.jit(self._generate)
        frames, eos_probs, lengths = self._compiled[key](
            params, src_slots, tgt_slot, jax.random.PRNGKey(seed)
        )
        # ONE device_get: sequential np.asarray readbacks each pay a full
        # tunnel round-trip
        frames, eos_probs, lengths = jax.device_get((frames, eos_probs, lengths))
        # ground-truth features ride along for eval-side comparison when the
        # batch carries them (reference SpeechGeneratorOutput.targ_feature)
        targ = sample.get("target")
        targ = np.asarray(targ) if targ is not None else None
        # reference speech_generator.py:193-198 gcmvn-denormalizes the target
        # features and slices each sample to its true length before attaching
        # it, so eval-side feature/waveform comparison sees matched spaces
        targ_lens = sample.get("target_lengths")
        targ_lens = np.asarray(targ_lens) if targ_lens is not None else None
        outs = []
        for b in range(B):
            L = int(lengths[b])
            tf = None
            if targ is not None and targ.ndim >= 3:
                tl = int(targ_lens[b]) if targ_lens is not None else targ.shape[1]
                tf = self.gcmvn_denormalize(targ[b, :tl])
            outs.append(SpeechGeneratorOutput(
                feature=self.gcmvn_denormalize(frames[b, :L]),
                eos_prob=eos_probs[b, :L],
                targ_feature=tf,
            ))
        return outs

    def _generate(self, params, src_slots, tgt_slot, rng):
        net = self.model.net
        enc = net.apply(_vars(params), src_slots, method=net.encode)
        B = enc.x.shape[0]
        T = self.max_iter
        dummy = dataclasses.replace(
            tgt_slot, value={"inputs": jnp.zeros((B, T + 1, self.out_dim), jnp.float32)}
        )
        bias_spec, cross_bias, cache = net.apply(
            _vars(params), [dummy], enc, T + 1, method=net.decode_prepare
        )

        frames = jnp.zeros((B, T + 1, self.out_dim), jnp.float32)  # frame 0 = zero "go" frame
        eos_probs = jnp.zeros((B, T + 1), jnp.float32)
        done = jnp.zeros((B,), bool)
        lengths = jnp.full((B,), T, jnp.int32)

        def cond(state):
            step, frames, eos_probs, done, lengths, cache, rng = state
            return (step < T) & jnp.logical_not(done.all())

        def body(state):
            step, frames, eos_probs, done, lengths, cache, rng = state
            cur = jax.lax.dynamic_slice_in_dim(frames, step, 1, axis=1)    # (B,1,M)
            rng, sub = jax.random.split(rng)
            mel, extra, cache = net.apply(
                _vars(params), cur, step, enc, bias_spec, cross_bias, cache,
                tgt_slot, method=net.decode_step, rngs={"dropout": sub},
            )
            eos_p = jax.nn.sigmoid(extra["eos_logits"][:, -1])             # (B,)
            newly_done = jnp.logical_and(eos_p > self.eos_prob_threshold, ~done)
            lengths = jnp.where(newly_done, step + 1, lengths)
            frames = jax.lax.dynamic_update_slice_in_dim(frames, mel.astype(jnp.float32), step + 1, axis=1)
            eos_probs = jax.lax.dynamic_update_slice_in_dim(
                eos_probs, eos_p[:, None], step + 1, axis=1
            )
            return (step + 1, frames, eos_probs, done | newly_done, lengths, cache, rng)

        state = (jnp.int32(0), frames, eos_probs, done, lengths, cache, rng)
        _, frames, eos_probs, done, lengths, cache, rng = jax.lax.while_loop(cond, body, state)
        return frames[:, 1:], eos_probs[:, 1:], lengths
