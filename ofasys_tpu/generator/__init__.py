from ofasys_tpu.generator.base import (
    BatchGeneratorOutput,
    GeneratorOutput,
    MotionOutput,
    MultiGeneratorOutput,
    SequenceGeneratorOutput,
    SpeechGeneratorOutput,
)
from ofasys_tpu.generator.sequence_generator import SequenceGenerator

__all__ = [
    "GeneratorOutput", "SequenceGeneratorOutput", "SpeechGeneratorOutput",
    "MotionOutput", "MultiGeneratorOutput", "BatchGeneratorOutput", "SequenceGenerator",
]
