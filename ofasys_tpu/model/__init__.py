from ofasys_tpu.model.config import GeneralistModelConfig, apply_arch
from ofasys_tpu.model.ofa import EncoderOut, GeneralistModel, GeneralistNet

__all__ = ["GeneralistModelConfig", "apply_arch", "GeneralistModel", "GeneralistNet", "EncoderOut"]
