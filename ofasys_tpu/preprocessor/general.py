"""GeneralPreprocess: per-slot dispatch pipeline
(reference ofasys/preprocessor/general.py:37-158).

Sample path (dataloader workers, pure numpy):
  instruction_map -> map per slot -> merge adjacent same-group slots
  (text-like modalities share the TEXT group and concatenate into one token
  run) -> per-position collate into SlotBatch arrays.

Batch layout is shape-stable: pad_to_multiple rounds lengths so jit sees few
distinct shapes per task.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Optional

import numpy as np

from ofasys_tpu import ModalityType
from ofasys_tpu.configure import ConfigStore
from ofasys_tpu.preprocessor.base import BasePreprocess, PreprocessSkipException
from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.preprocessor.instruction import Instruction, Slot

# default preprocessor per modality (reference preprocessor/general.py:27-35)
DEFAULT_PREPROCESS = {
    ModalityType.TEXT: "text",
    ModalityType.IMAGE: "image",
    ModalityType.BOX: "box",
    ModalityType.AUDIO: "audio",
    ModalityType.MOTION: "motion_6d",
    ModalityType.PHONE: "phone",
    ModalityType.VIDEO: "video",
    ModalityType.STRUCT: "struct",
    ModalityType.CATEGORY: "category",
}

# modalities whose token outputs merge into the TEXT group
TEXT_GROUP = {
    ModalityType.TEXT,
    ModalityType.BOX,
    ModalityType.PHONE,
    ModalityType.STRUCT,
    ModalityType.CATEGORY,
}


class GeneralPreprocess:
    def __init__(self, global_dict: Dictionary, active: Optional[List[str]] = None):
        store = ConfigStore()
        self.global_dict = global_dict
        self.name2pre: Dict[str, BasePreprocess] = {}
        names = active
        if names is None:
            names = [n.name for n in store.active_nodes("ofasys.preprocess")] or ["text"]
        for name in names:
            node = store.get("ofasys.preprocess", name)
            # deep copy: each task owns its preprocessors and may tune their
            # config (e.g. trainer multi-host forces pad_to_fixed per task);
            # sharing the store's config object would leak across tasks
            self.name2pre[name] = node.target_cls(global_dict, copy.deepcopy(node.config))

    # ------------------------------------------------------------- helpers
    @property
    def bpe(self):
        return self.name2pre["text"].bpe

    def get_preprocess(self, slot: Slot) -> BasePreprocess:
        name = slot.get_attr("preprocess") or slot.preprocess or DEFAULT_PREPROCESS[slot.modality]
        if name not in self.name2pre:
            node = ConfigStore().get("ofasys.preprocess", name)
            self.name2pre[name] = node.target_cls(self.global_dict, copy.deepcopy(node.config))
        return self.name2pre[name]

    def group_key(self, slot: Slot):
        return ModalityType.TEXT if slot.modality in TEXT_GROUP else slot.modality

    # ------------------------------------------------------ sample pipeline
    def __call__(self, ist: Optional[Instruction]) -> Optional[Instruction]:
        if ist is None:
            return None
        try:
            seen = set()
            for slot in ist.slots:
                pre = self.get_preprocess(slot)
                if id(pre) not in seen:
                    ist = pre.instruction_map(ist)
                    seen.add(id(pre))
            slots = [self.get_preprocess(s).map(s) for s in ist.slots]
        except PreprocessSkipException:
            return None

        # merge adjacent slots sharing (group, side)
        groups: List[List[Slot]] = []
        for s in slots:
            if groups and self.group_key(groups[-1][-1]) == self.group_key(s) \
                    and groups[-1][-1].is_src == s.is_src:
                groups[-1].append(s)
            else:
                groups.append([s])
        out: List[Slot] = []
        for g in groups:
            key = self.group_key(g[0])
            handler = self.name2pre.get(DEFAULT_PREPROCESS[key]) if len(g) > 1 else self.get_preprocess(g[0])
            if handler is None:
                handler = self.get_preprocess(g[0])
            out.extend(handler.group_map(g))
        for i, s in enumerate(out):
            s.global_position = i
        ist.slots = out
        return ist

    # --------------------------------------------------------------- batch
    def collate(self, samples: List[Instruction]) -> Dict[str, Any]:
        if not samples:
            return {}
        n_slots = len(samples[0].slots)
        for ist in samples[1:]:
            if len(ist.slots) != n_slots:
                raise ValueError("cannot batch samples with different slot structures")
        result: Dict[str, Any] = {
            "net_input": {"slots": []},
            "nsentences": len(samples),
            "template": samples[0].template,
        }
        for i in range(n_slots):
            pre = self.get_preprocess(samples[0].slots[i])
            co = pre.collate([ist.slots[i] for ist in samples])
            if co.net_input_slot is not None:
                result["net_input"]["slots"].append(co.net_input_slot)
            if co.sample_extra:
                for k, v in co.sample_extra.items():
                    result[k] = v
        return result

    # ------------------------------------------------------------ decoding
    def postprocess(self, outputs, sample: Dict[str, Any]):
        """Route generator outputs back through the target slot's
        preprocessor (de-tokenize / de-quantize / vocode / ...)."""
        slots = sample["net_input"]["slots"]
        target = [s for s in slots if not s.is_src][-1]
        # SlotBatch carries the same attrs Slot does
        name = (target.get_attr("preprocess") if target.attributes else None) \
            or target.preprocess or DEFAULT_PREPROCESS[target.modality]
        pre = self.name2pre[name]
        if hasattr(pre, "postprocess"):
            return pre.postprocess(outputs, sample)
        for out in outputs if isinstance(outputs, list) else [outputs]:
            if hasattr(out, "tokens") and out.tokens is not None:
                out.text = pre.decode(out.tokens)
        return outputs
