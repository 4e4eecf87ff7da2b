"""Structured-data preprocessors (reference
ofasys/preprocessor/default/struct.py: table linearization + Spider database
schema serialization) and category labels
(reference default/category.py) and phonemes (reference default/phone.py).

All are text-group members: they produce token runs that merge with
neighboring text (like the reference, which subclasses the text preprocess).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import numpy as np

from ofasys_tpu.configure import register_config
from ofasys_tpu.preprocessor.base import PreprocessSkipException
from ofasys_tpu.preprocessor.instruction import Slot
from ofasys_tpu.preprocessor.text import TextPreprocess, TextPreprocessConfig


@dataclass
class StructPreprocessConfig(TextPreprocessConfig):
    row_separator: str = " | "
    col_separator: str = " : "


@register_config("ofasys.preprocess", "struct", StructPreprocessConfig)
class StructPreprocess(TextPreprocess):
    """Tables -> linearized text (reference DefaultStructPreprocess)."""

    def linearize(self, value: Any) -> str:
        if isinstance(value, str):
            return value
        cfg = self.cfg
        if isinstance(value, dict):
            # {"header": [...], "rows": [[...], ...]} table form
            header = value.get("header") or value.get("columns")
            rows = value.get("rows") or value.get("data") or []
            parts = []
            if header:
                parts.append(cfg.col_separator.join(map(str, header)))
            for row in rows:
                parts.append(cfg.col_separator.join(map(str, row)))
            return cfg.row_separator.join(parts)
        if isinstance(value, (list, tuple)):
            # triple list [[subj, pred, obj], ...] (dart-style)
            return cfg.row_separator.join(cfg.col_separator.join(map(str, t)) for t in value)
        raise PreprocessSkipException(f"cannot linearize struct value of type {type(value)}")

    def map(self, slot: Slot) -> Slot:
        if not slot.is_src and slot.value is None:
            return self.dummy_slot(slot)
        if not isinstance(slot.value, dict) or "inputs" not in slot.value:
            if not isinstance(slot.value, np.ndarray):
                slot.value = self.linearize(slot.value)
        return TextPreprocess.map(self, slot)


@dataclass
class DatabasePreprocessConfig(StructPreprocessConfig):
    schema_serialization_with_db_content: bool = True


@register_config("ofasys.preprocess", "database", DatabasePreprocessConfig)
class DatabasePreprocess(StructPreprocess):
    """Spider DB schema serialization (reference DatabaseStructPreprocess,
    struct.py:77-232): 'db_id | table : col1, col2 | table2 : ...'."""

    def linearize(self, value: Any) -> str:
        if isinstance(value, str):
            return value
        if isinstance(value, dict) and "db_id" in value:
            parts = [str(value["db_id"])]
            tables: Dict[str, List[str]] = value.get("tables", {})
            for tname, cols in tables.items():
                parts.append(f"{tname} : " + ", ".join(map(str, cols)))
            return " | ".join(parts)
        return super().linearize(value)


@dataclass
class CategoryPreprocessConfig(TextPreprocessConfig):
    ans2label_file: Optional[str] = None


@register_config("ofasys.preprocess", "category", CategoryPreprocessConfig)
class CategoryPreprocess(TextPreprocess):
    """Label-id <-> text mapping (reference default/category.py): CATEGORY
    slots carry either a label string or an integer id resolved via
    ans2label."""

    def map(self, slot: Slot) -> Slot:
        if not slot.is_src and slot.value is None:
            return self.dummy_slot(slot)
        v = slot.value
        if isinstance(v, (int, np.integer)):
            if self.ans2label:
                inv = {i: a for a, i in self.ans2label.items()}
                slot.value = inv.get(int(v), str(v))
            else:
                slot.value = str(v)
        return TextPreprocess.map(self, slot)


@dataclass
class PhonePreprocessConfig(TextPreprocessConfig):
    phone_dict_file: Optional[str] = None
    use_g2p: bool = False


@register_config("ofasys.preprocess", "phone", PhonePreprocessConfig)
class PhonePreprocess(TextPreprocess):
    """Phoneme tokens in a dedicated <phone>_ namespace
    (reference default/phone.py:32-206). Input may be a pre-phonemized
    space-separated phone string; g2p_en conversion is applied when
    installed and enabled."""

    def __init__(self, global_dict, cfg: PhonePreprocessConfig):
        super().__init__(global_dict, cfg)
        self.phone2id: Dict[str, int] = {}
        if cfg.phone_dict_file:
            with open(cfg.phone_dict_file) as f:
                phones = [line.split()[0] for line in f if line.strip()]
        else:
            # CMUdict ARPABET inventory as a hermetic default
            phones = ("AA AE AH AO AW AY B CH D DH EH ER EY F G HH IH IY JH K L M N NG "
                      "OW OY P R S SH T TH UH UW V W Y Z ZH sil sp").split()
        start, _ = global_dict.add_namespace("<phone>", len(phones), fmt="{prefix}_{i}")
        for i, p in enumerate(phones):
            self.phone2id[p] = start + i
        self.id2phone = {v: k for k, v in self.phone2id.items()}

    def phonemize(self, text: str) -> List[str]:
        if self.cfg.use_g2p:
            try:
                from g2p_en import G2p

                return [p for p in G2p()(text) if p.strip()]
            except ImportError:
                pass
        return text.strip().split()

    def encode_phones(self, text: str) -> np.ndarray:
        ids = [self.phone2id[p] for p in self.phonemize(text) if p in self.phone2id]
        return np.asarray(ids, np.int32)

    def map(self, slot: Slot) -> Slot:
        if not slot.is_src and slot.value is None:
            return self.dummy_slot(slot)
        if isinstance(slot.value, str):
            slot.value = self.encode_phones(slot.value)
        return TextPreprocess.map(self, slot)

    def decode(self, tokens: np.ndarray, **kwargs) -> str:
        toks = np.asarray(tokens).reshape(-1)
        return " ".join(self.id2phone[int(t)] for t in toks if int(t) in self.id2phone)
