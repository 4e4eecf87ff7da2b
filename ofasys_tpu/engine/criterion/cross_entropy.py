"""Plain cross entropy + ASR/speech criterion aliases
(reference ofasys/engine/criterion/{cross_entropy.py:45,
speech_to_text_loss.py:133, speech_pretrain_loss.py:78})."""

from __future__ import annotations

from dataclasses import dataclass

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


@register_config("ofasys.criterion", "speech_to_text_loss", SpeechToTextCriterionConfig)
class SpeechToTextCriterion(LabelSmoothedCrossEntropyCriterion):
    """ASR: token CE over transcripts (the reference variant adds CTC
    options that are parked until a CTC head lands)."""

