"""ofasys_tpu — a TPU-native (JAX/XLA/Pallas) multi-modal multi-task framework.

Re-implements the capabilities of OFA-Sys/OFASys (reference:
/root/reference/ofasys) with a TPU-first design: the declarative instruction
DSL parses into modality slots; per-modality preprocessors run host-side and
emit shape-stable numpy batches; adaptors and the shared encoder-decoder
GeneralistModel are JAX/flax modules compiled under jit+GSPMD over a device
mesh; generation is a jitted lax.while_loop; checkpoints are orbax.

Public API parity targets (reference anchors):
  - ModalityType            ofasys/__init__.py:29
  - Instruction / Slot      ofasys/preprocessor/instruction.py:115,29
  - Task / Trainer / GeneralistModel   scripts/trainer_api.py
  - OFASys.from_pretrained  ofasys/hub_interface.py:106
"""

import logging
from enum import Enum, unique

__version__ = "0.1.0"

logger = logging.getLogger("ofasys_tpu")


@unique
class ModalityType(Enum):
    """The modality vocabulary of the instruction DSL.

    Mirrors the reference enum (ofasys/__init__.py:29-45) so instruction
    templates written for the reference parse identically here.
    """

    TEXT = 1
    IMAGE = 2
    BOX = 3
    AUDIO = 4
    MOTION = 5
    PHONE = 6
    VIDEO = 7
    STRUCT = 8
    CATEGORY = 9

    @classmethod
    def parse(cls, mark: str):
        try:
            return cls[mark]
        except KeyError:
            return None


def __getattr__(name):
    # Lazy top-level exports: keep `import ofasys_tpu` cheap (no jax import)
    # so the pure-python layers (instruction parsing, config) stay light.
    if name in ("Instruction", "Slot"):
        from ofasys_tpu.preprocessor import instruction as _m

        return getattr(_m, name)
    if name == "Dictionary":
        from ofasys_tpu.preprocessor.dictionary import Dictionary

        return Dictionary
    if name == "Task":
        from ofasys_tpu.task.base import Task

        return Task
    if name == "Trainer":
        from ofasys_tpu.engine.trainer import Trainer

        return Trainer
    if name == "GeneralistModel":
        from ofasys_tpu.model.ofa import GeneralistModel

        return GeneralistModel
    if name == "OFASys":
        from ofasys_tpu.hub_interface import OFASys

        return OFASys
    if name == "InferenceServer":
        from ofasys_tpu.serve import InferenceServer

        return InferenceServer
    raise AttributeError(f"module 'ofasys_tpu' has no attribute {name!r}")


__all__ = [
    "ModalityType",
    "Instruction",
    "Slot",
    "Dictionary",
    "Task",
    "Trainer",
    "GeneralistModel",
    "OFASys",
    "InferenceServer",
    "logger",
]
