from ofasys_tpu.engine.criterion.base import BaseCriterion, CriterionConfig
from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
    LabelSmoothedCrossEntropyCriterion,
    LabelSmoothedCrossEntropyCriterionConfig,
)

__all__ = [
    "BaseCriterion", "CriterionConfig",
    "LabelSmoothedCrossEntropyCriterion", "LabelSmoothedCrossEntropyCriterionConfig",
]
