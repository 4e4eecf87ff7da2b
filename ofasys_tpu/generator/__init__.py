from ofasys_tpu.generator.base import (
    BatchGeneratorOutput,
    GeneratorOutput,
    MotionOutput,
    MultiGeneratorOutput,
    SequenceGeneratorOutput,
    SpeechGeneratorOutput,
)
from ofasys_tpu.generator.sequence_generator import SequenceGenerator
from ofasys_tpu.generator.speculative import SpeculativeGenerator
from ofasys_tpu.generator.speech_generator import AutoRegressiveSpeechGenerator
from ofasys_tpu.generator.diffusion_generator import DiffusionGenerator

__all__ = [
    "GeneratorOutput", "SequenceGeneratorOutput", "SpeechGeneratorOutput",
    "MotionOutput", "MultiGeneratorOutput", "BatchGeneratorOutput", "SequenceGenerator", "SpeculativeGenerator", "AutoRegressiveSpeechGenerator",
]
