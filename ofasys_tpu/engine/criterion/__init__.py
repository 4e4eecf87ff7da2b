from ofasys_tpu.engine.criterion.base import BaseCriterion, CriterionConfig
from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
    LabelSmoothedCrossEntropyCriterion,
    LabelSmoothedCrossEntropyCriterionConfig,
)

__all__ = [
    "BaseCriterion", "CriterionConfig",
    "LabelSmoothedCrossEntropyCriterion", "LabelSmoothedCrossEntropyCriterionConfig",
]

from ofasys_tpu.engine.criterion.cross_entropy import (
    CrossEntropyCriterion,
    SpeechToTextCriterion,
)
from ofasys_tpu.engine.criterion.speech_pretrain_loss import SpeechPretrainCriterion
from ofasys_tpu.engine.criterion.tacotron2_loss import Tacotron2Criterion
from ofasys_tpu.engine.criterion.diffusion_loss import DiffusionCriterion
from ofasys_tpu.engine.criterion.scst_loss import ScstRewardCriterion, scst_train_step
