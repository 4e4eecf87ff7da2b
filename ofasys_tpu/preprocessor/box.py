"""Box (bounding box) preprocessor (reference ofasys/preprocessor/default/box.py:36-143).

Subclasses TextPreprocess (as the reference's DefaultBoxPreprocess does):
a box becomes 4 quantized ``<bin>_i`` tokens which then flow through the
text group machinery (bos/eos wrap, merging with adjacent text slots,
teacher-forcing collate). decode reverses the quantization.

Accepted values: dict {"box": [x0,y0,x1,y1], "width": W, "height": H}
(pixel coords) or a 4-vector of normalized [0,1] coords.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ofasys_tpu.configure import register_config
from ofasys_tpu.preprocessor.base import PreprocessSkipException
from ofasys_tpu.preprocessor.instruction import Slot
from ofasys_tpu.preprocessor.text import TextPreprocess, TextPreprocessConfig


@dataclass
class BoxPreprocessConfig(TextPreprocessConfig):
    num_bins: int = 1000


@register_config("ofasys.preprocess", "box", BoxPreprocessConfig)
class BoxPreprocess(TextPreprocess):
    def __init__(self, global_dict, cfg: BoxPreprocessConfig):
        super().__init__(global_dict, cfg)
        self.bin_start, self.bin_end = global_dict.add_namespace("<bin>", cfg.num_bins)

    # ------------------------------------------------------------- encoding
    def encode_box(self, box: np.ndarray) -> np.ndarray:
        """Normalized [0,1] coords -> 4 dictionary token ids."""
        n = self.cfg.num_bins - 1
        bins = np.clip(np.round(np.asarray(box, np.float64) * n), 0, n).astype(np.int64)
        return (bins + self.bin_start).astype(np.int32)

    def decode(self, tokens: np.ndarray, width: Optional[float] = None,
               height: Optional[float] = None, **kwargs) -> np.ndarray:
        """Token ids -> normalized (or pixel, given dims) [x0,y0,x1,y1]."""
        toks = np.asarray(tokens).reshape(-1)
        bins = [int(t) - self.bin_start for t in toks
                if self.bin_start <= int(t) < self.bin_end][:4]
        coords = np.asarray(bins, np.float32) / (self.cfg.num_bins - 1)
        if len(coords) == 4 and width is not None and height is not None:
            coords = coords * np.asarray([width, height, width, height], np.float32)
        return coords

    # ------------------------------------------------------------------ map
    def map(self, slot: Slot) -> Slot:
        if not slot.is_src and slot.value is None:
            return self.dummy_slot(slot)
        v = slot.value
        if isinstance(v, dict) and "inputs" in v:
            return slot
        if isinstance(v, dict):
            box = np.asarray(v["box"], np.float32)
            w, h = float(v.get("width", 1.0)), float(v.get("height", 1.0))
            box = box / np.asarray([w, h, w, h], np.float32)
        else:
            box = np.asarray(v, np.float32)
            if box.max() > 1.0:
                raise PreprocessSkipException(
                    "box coords > 1 need explicit width/height (pass a dict)"
                )
        if box.shape != (4,):
            raise PreprocessSkipException(f"box must have 4 coords, got {box.shape}")
        slot.value = self.encode_box(np.clip(box, 0.0, 1.0))
        return TextPreprocess.map(self, slot)

    def postprocess(self, outputs, sample):
        for out in outputs if isinstance(outputs, list) else [outputs]:
            if getattr(out, "tokens", None) is not None:
                out.box = self.decode(out.tokens)
        return outputs
