from ofasys_tpu.engine import criterion  # register criteria
from ofasys_tpu.engine.train_step import TrainState, make_train_step, make_valid_step
from ofasys_tpu.engine.trainer import Trainer

__all__ = ["Trainer", "TrainState", "make_train_step", "make_valid_step"]
