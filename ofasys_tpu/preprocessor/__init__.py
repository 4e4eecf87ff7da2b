from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.preprocessor.instruction import Instruction, Slot

__all__ = ["Dictionary", "Instruction", "Slot"]
