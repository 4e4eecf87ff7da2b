from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.preprocessor.instruction import Instruction, Slot
from ofasys_tpu.preprocessor.base import (
    BasePreprocess,
    CollateOutput,
    PreprocessConfig,
    PreprocessSkipException,
)
from ofasys_tpu.preprocessor.general import GeneralPreprocess

# import registered preprocessors so @register_config side effects fire
from ofasys_tpu.preprocessor import text  # noqa: F401
from ofasys_tpu.preprocessor import image  # noqa: F401
from ofasys_tpu.preprocessor import box  # noqa: F401
from ofasys_tpu.preprocessor import audio  # noqa: F401
from ofasys_tpu.preprocessor import motion  # noqa: F401
from ofasys_tpu.preprocessor import struct  # noqa: F401
from ofasys_tpu.preprocessor import video  # noqa: F401
from ofasys_tpu.preprocessor import image_vqgan  # noqa: F401

__all__ = [
    "Dictionary",
    "Instruction",
    "Slot",
    "BasePreprocess",
    "CollateOutput",
    "PreprocessConfig",
    "PreprocessSkipException",
    "GeneralPreprocess",
]
