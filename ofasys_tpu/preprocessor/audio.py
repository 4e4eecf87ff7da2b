"""Audio preprocessor (reference ofasys/preprocessor/default/audio.py, 640 LoC).

Source side (ASR input): waveform -> log-mel fbank -> CMVN -> SpecAugment
(train) -> (T, n_mels) float frames, padded per batch.
Target side (TTS output): fbank frames packed n_frames_per_step, with a pad
mask; decode applies Griffin-Lim (HiFi-GAN once ported).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ofasys_tpu.configure import register_config
from ofasys_tpu.preprocessor.base import (
    BasePreprocess,
    CollateOutput,
    PreprocessConfig,
    PreprocessSkipException,
)
from ofasys_tpu.preprocessor.instruction import Slot
from ofasys_tpu.preprocessor.utils import collate_arrays
from ofasys_tpu.utils.audio_utils import (
    apply_cmvn,
    griffin_lim,
    load_wav,
    logmel_fbank,
    spec_augment,
)


@dataclass
class AudioPreprocessConfig(PreprocessConfig):
    sample_rate: int = 16000
    num_mels: int = 80
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    specaugment: bool = True
    cmvn: str = "utterance"       # 'utterance' | 'none'
    max_frames: int = 1024
    n_frames_per_step: int = 1    # TTS frame packing
    seed: int = 1
    pad_to_fixed: bool = False    # pad to max_frames (multi-host determinism)


@register_config("ofasys.preprocess", "audio", AudioPreprocessConfig)
class AudioPreprocess(BasePreprocess):
    def __init__(self, global_dict, cfg: AudioPreprocessConfig):
        super().__init__(global_dict, cfg)
        self.rng = np.random.default_rng(cfg.seed)

    def extract(self, value: Any) -> np.ndarray:
        if isinstance(value, np.ndarray) and value.ndim == 2:
            feats = value.astype(np.float32)      # precomputed fbank
        else:
            wav, sr = load_wav(value)
            feats = logmel_fbank(
                wav, sr, self.cfg.num_mels, self.cfg.frame_length_ms, self.cfg.frame_shift_ms
            )
        if self.cfg.cmvn == "utterance":
            feats = apply_cmvn(feats)
        return feats[: self.cfg.max_frames]

    def map(self, slot: Slot) -> Slot:
        if not slot.is_src and slot.value is None:
            # open TTS target: seed with a single zero frame
            n = self.cfg.num_mels * self.cfg.n_frames_per_step
            slot.value = {"inputs": np.zeros((0, n), np.float32)}
            return slot
        if isinstance(slot.value, dict) and "inputs" in slot.value:
            return slot
        feats = self.extract(slot.value)
        if slot.is_src and slot.split == "train" and self.cfg.specaugment:
            feats = spec_augment(feats, self.rng)
        k = self.cfg.n_frames_per_step
        if not slot.is_src and k > 1:
            T = (feats.shape[0] // k) * k
            feats = feats[:T].reshape(T // k, self.cfg.num_mels * k)
        slot.value = {"inputs": feats}
        return slot

    def collate(self, slots: List[Slot]) -> CollateOutput:
        feats = [s.value["inputs"] for s in slots]
        fixed = self.cfg.max_frames if getattr(self.cfg, "pad_to_fixed", False) else None
        batch = collate_arrays(feats, pad_value=0.0,
                               pad_to_multiple=self.cfg.pad_to_multiple,
                               pad_to_length=fixed)
        lengths = np.asarray([f.shape[0] for f in feats], np.int32)
        value = {"inputs": batch, "lengths": lengths}
        sb = self.to_slot_batch(slots[0], value)
        if slots[0].is_src:
            return CollateOutput(sb)
        # TTS target: feature regression target + eos supervision
        extra = {
            "target": batch,
            "target_lengths": lengths,
            "ntokens": int(lengths.sum()),
        }
        return CollateOutput(sb, sb, extra)

    def decode(self, feature: np.ndarray, **kwargs) -> np.ndarray:
        """Mel frames -> waveform via Griffin-Lim
        (vocoder attachment point, reference audio.py:600-640)."""
        k = self.cfg.n_frames_per_step
        if k > 1:
            feature = feature.reshape(-1, self.cfg.num_mels)
        return griffin_lim(
            feature, self.cfg.sample_rate, self.cfg.num_mels,
            self.cfg.frame_length_ms, self.cfg.frame_shift_ms,
        )

    def postprocess(self, outputs, sample):
        for out in outputs if isinstance(outputs, list) else [outputs]:
            if getattr(out, "feature", None) is not None:
                out.waveform = self.decode(np.asarray(out.feature))
        return outputs
