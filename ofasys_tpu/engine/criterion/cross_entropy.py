"""Plain cross entropy + ASR/speech criterion aliases
(reference ofasys/engine/criterion/{cross_entropy.py:45,
speech_to_text_loss.py:133, speech_pretrain_loss.py:78})."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ofasys_tpu.configure import register_config
from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
    LabelSmoothedCrossEntropyCriterion,
    LabelSmoothedCrossEntropyCriterionConfig,
)


@dataclass
class CrossEntropyCriterionConfig(LabelSmoothedCrossEntropyCriterionConfig):
    label_smoothing: float = 0.0


@register_config("ofasys.criterion", "cross_entropy", CrossEntropyCriterionConfig)
class CrossEntropyCriterion(LabelSmoothedCrossEntropyCriterion):
    """label_smoothing = 0 specialization."""


@dataclass
class SpeechToTextCriterionConfig(LabelSmoothedCrossEntropyCriterionConfig):
    label_smoothing: float = 0.1
    ce_weight: float = 1.0
    ctc_weight: float = 0.0


@register_config("ofasys.criterion", "speech_to_text_loss", SpeechToTextCriterionConfig)
class SpeechToTextCriterion(LabelSmoothedCrossEntropyCriterion):
    """ASR: token CE over transcripts, plus an optional CTC auxiliary loss
    on ENCODER states against phoneme targets (reference
    speech_to_text_loss.py:206-260: ``ce_weight * CE + ctc_weight * CTC``).

    The CTC branch mirrors the reference's construction exactly
    (speech_to_text_loss.py:217-225): the CTC logits are the encoder states
    projected against the shared token-embedding rows of the ``<phone>``
    namespace — class 0 (the reference's ``<phone>_dict_begin`` row) is the
    blank. Targets come from ``sample['encoder_target']`` (produced by the
    ``text_phone`` preprocessor) with pad/eos excluded
    (speech_to_text_loss.py:353-355). TPU-shaped: ``optax.ctc_loss`` is a
    jit-compiled lax.scan forward algorithm over static shapes — no host
    sync, no cudnn escape hatch needed.
    """

    global_dict = None  # attached by Task.initialize

    def __call__(self, model, params, sample, rng=None, train: bool = True):
        cfg = self.cfg
        if cfg.ctc_weight <= 0.0 or "encoder_target" not in sample:
            return super().__call__(model, params, sample, rng=rng, train=train)

        slots = sample["net_input"]["slots"]
        rngs = {"dropout": rng} if (train and rng is not None) else None
        logits, extra = model.apply(params, slots, deterministic=not train, rngs=rngs)
        loss_ce, sample_size, logging = self.compute_loss(logits, sample, train=train)

        enc = extra["encoder_out"]
        ptree = params.get("params", params) if isinstance(params, dict) else params
        emb = ptree["embed_tokens"]["embedding"]          # (V, E) fp32
        start, end = self.global_dict.get_start_end_idx("<phone>")
        rows = emb[start:end].astype(jnp.float32)         # static slice
        x = enc.x.astype(jnp.float32)                     # (B, Ts, E)
        ctc_logits = jnp.einsum("bte,ke->btk", x, rows)   # (B, Ts, K)
        # enc.padding_mask: True = PAD (EncoderOut convention, model/ofa.py:45)
        logit_pads = enc.padding_mask.astype(jnp.float32)

        tgt = sample["encoder_target"]                    # (B, L) phone ids
        valid = (tgt != self.pad_id) & (tgt != self.global_dict.eos())
        labels = jnp.where(valid, tgt - start, 0).astype(jnp.int32)
        label_pads = 1.0 - valid.astype(jnp.float32)
        import optax

        per_seq = optax.ctc_loss(ctc_logits, logit_pads, labels, label_pads, blank_id=0)
        loss_ctc = per_seq.sum()

        loss = cfg.ce_weight * loss_ce + cfg.ctc_weight * loss_ctc
        logging = dict(logging)
        logging["ce_loss"] = loss_ce
        logging["ctc_loss"] = loss_ctc
        return loss, sample_size, logging

