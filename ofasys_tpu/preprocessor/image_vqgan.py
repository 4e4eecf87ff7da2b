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
    # best-of-N rerank scorer: 'clip' (CLIP weights from clip_model /
    # $OFA_CLIP_PATH, reference image_code.py:30-33,202-214), 'none', or
    # 'auto' (clip when weights resolve, else no rerank)
    rerank: str = "auto"
    clip_model: Optional[str] = None


@register_config("ofasys.preprocess", "image_vqgan", ImageVqganPreprocessConfig)
class ImageVqganPreprocess(TextPreprocess):
    def __init__(self, global_dict, cfg: ImageVqganPreprocessConfig):
        super().__init__(global_dict, cfg)
        self.code_start, self.code_end = global_dict.add_namespace("<code>", cfg.num_codes)
        self._tokenizer = None
        # pluggable best-of-N scorer: (images (N,H,W,3) float[0,1], text) ->
        # (N,) scores, higher = better. Tests inject hermetic proxies here;
        # the default resolves CLIP lazily per cfg.rerank.
        self.rerank_scorer = None
        self._clip = None

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
    def constraint_range(self) -> Optional[str]:
        """Decode-time sub-vocab restriction to the ``<code>_*`` range;
        ``constraint_decoding=False`` opts out (generator then samples the
        full vocab, matching an unconstrained reference run)."""
        if not self.cfg.constraint_decoding:
            return None
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

    def decode_batch(self, tokens_list: List[np.ndarray]) -> np.ndarray:
        """Decode many hypotheses' code tokens in ONE jitted VQGAN pass —
        (N, H, W, 3) out. TPU-first: the reference decodes candidates as one
        stacked batch too (task/base.py:755-758), and per-candidate decodes
        would pay a dispatch round-trip each."""
        n = self.tokenizer.codes_per_image
        rows = []
        for toks in tokens_list:
            t = np.asarray(toks).reshape(-1)
            codes = (t[(t >= self.code_start) & (t < self.code_end)]
                     - self.code_start).astype(np.int32)
            if len(codes) < n:
                codes = np.concatenate([codes, np.zeros(n - len(codes), np.int32)])
            rows.append(codes[:n])
        return self.tokenizer.decode(np.stack(rows))

    def rerank_scores(self, images: np.ndarray, text: str) -> Optional[np.ndarray]:
        """Score N candidate images against the query text; None = no
        scorer available (rerank disabled). Pluggable via
        ``self.rerank_scorer``; default is CLIP text-image similarity
        (reference image_code.py:202-214 rerank_with_clip)."""
        if self.rerank_scorer is not None:
            return np.asarray(self.rerank_scorer(images, text), np.float32)
        if self.cfg.rerank == "none":
            return None
        clip = self._load_clip()
        if clip is None:
            return None
        model, proc = clip
        import torch

        pil = [np.clip(im * 255.0, 0, 255).astype(np.uint8) for im in images]
        inputs = proc(text=[str(text)], images=pil, return_tensors="pt", padding=True)
        with torch.no_grad():
            out = model(**inputs)
        return out.logits_per_image[:, 0].numpy().astype(np.float32)

    def _load_clip(self):
        if self._clip is None:
            import os

            path = self.cfg.clip_model or os.environ.get("OFA_CLIP_PATH")
            try:
                if not path:
                    raise FileNotFoundError("no clip_model / OFA_CLIP_PATH")
                from transformers import CLIPModel, CLIPProcessor

                self._clip = (CLIPModel.from_pretrained(path),
                              CLIPProcessor.from_pretrained(path))
            except Exception:
                if self.cfg.rerank == "clip":
                    raise
                self._clip = False  # 'auto': degrade to no rerank, once
        return self._clip or None

    def postprocess(self, outputs, sample):
        outs = outputs if isinstance(outputs, list) else [outputs]
        with_tokens = [o for o in outs if getattr(o, "tokens", None) is not None]
        if with_tokens:
            images = self.decode_batch([o.tokens for o in with_tokens])
            for o, im in zip(with_tokens, images):
                o.image = im
        return outputs
