"""Pytree-registered batch containers.

The reference passes `List[Slot]` (with torch tensors inside ``slot.value``)
through the model (ofasys/preprocessor/instruction.py:29, adaptor/general.py:120).
Here the equivalent is :class:`SlotBatch`: modality/name/attributes are static
(part of the jit trace signature — one compiled step per task template), and
``value`` holds the traced arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax

from ofasys_tpu import ModalityType


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SlotBatch:
    """Batched, collated data for one slot of an instruction template.

    ``value`` is a dict of arrays (e.g. {'inputs': (B,T) int32}) — the traced
    leaves. Everything else is static metadata hashed into the jit cache key,
    so two tasks with different templates never share a trace.
    """

    modality: ModalityType
    is_src: bool
    value: Any = None
    column_name: Optional[str] = None
    attributes: Optional[Tuple[str, ...]] = None
    preprocess: Optional[str] = None
    adaptor_name: Optional[str] = None
    split: str = "train"

    def tree_flatten(self):
        static = (
            self.modality,
            self.is_src,
            self.column_name,
            self.attributes,
            self.preprocess,
            self.adaptor_name,
            self.split,
        )
        return (self.value,), static

    @classmethod
    def tree_unflatten(cls, static, children):
        (value,) = children
        mod, is_src, col, attrs, prep, adaptor_name, split = static
        return cls(
            modality=mod,
            is_src=is_src,
            value=value,
            column_name=col,
            attributes=attrs,
            preprocess=prep,
            adaptor_name=adaptor_name,
            split=split,
        )

    # Attr helpers mirror Slot (instruction.py) so adaptors can treat both alike.
    def has_attr(self, key: str) -> bool:
        if not self.attributes:
            return False
        return any(a == key or a.startswith(key + "=") for a in self.attributes)

    def get_attr(self, key: str, class_factory: Optional[type] = None):
        if not self.attributes:
            return None
        prefix = key + "="
        for a in self.attributes:
            if a.startswith(prefix):
                v = a[len(prefix):]
                return class_factory(v) if class_factory is not None else v
        return None

    @staticmethod
    def target_slot(slots: List["SlotBatch"]) -> "SlotBatch":
        return [s for s in slots if not s.is_src][-1]

    @staticmethod
    def source_slots(slots: List["SlotBatch"]) -> List["SlotBatch"]:
        return [s for s in slots if s.is_src]
