"""Masked-audio-model pretraining loss (reference
ofasys/engine/criterion/speech_pretrain_criterion.py:77 + the adaptor-side
wav2vec masking at reference adaptor/audio.py:401-460).

TPU-native deltas from the reference:
  * mask spans are drawn IN-JIT from the step rng (the reference computes
    numpy masks on the host per batch) — no host round-trip, shape-static.
  * the teacher (unmasked) encoder pass runs under stop_gradient in the same
    jitted program instead of torch.no_grad.
  * student/teacher frame logits project onto the <phone> sub-vocab when the
    dictionary has one (reference behavior), else onto the first
    ``mam_num_classes`` text rows.
Loss = mam_weight * KL(student || teacher) on masked frames
     + dec_weight  * label-smoothed CE on the decoder targets.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ofasys_tpu import ModalityType
from ofasys_tpu.configure import ConfigStore, register_config
from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
    LabelSmoothedCrossEntropyCriterion,
    LabelSmoothedCrossEntropyCriterionConfig,
)


def subsampled_length(T: int, stride: int) -> int:
    """Frame count after the audio adaptor's strided convs
    (kernel 5, stride 2, pad 2 per stage)."""
    import numpy as np

    n = max(1, int(np.log2(stride)))
    for _ in range(n):
        T = (T + 2 * 2 - 5) // 2 + 1
    return T


def span_mask(rng, B: int, T: int, mask_prob: float, mask_length: int) -> jax.Array:
    """wav2vec-style span masks, in-jit: ~mask_prob of the T frames covered
    by spans of mask_length (static span count; overlaps allowed like the
    reference's default)."""
    n_spans = max(1, int(mask_prob * T / mask_length + 0.5))
    starts = jax.random.randint(rng, (B, n_spans), 0, max(T - mask_length, 1))
    idx = starts[:, :, None] + jnp.arange(mask_length)[None, None, :]
    mask = jnp.zeros((B, T), bool)
    return mask.at[jnp.arange(B)[:, None, None], idx].set(True, mode="drop")


@dataclass
class SpeechPretrainCriterionConfig(LabelSmoothedCrossEntropyCriterionConfig):
    mam_weight: float = 1.0
    dec_weight: float = 1.0
    mask_prob: float = 0.65
    mask_length: int = 10
    mask_channel_prob: float = 0.0
    mask_channel_length: int = 10
    mam_num_classes: int = 1024


@register_config("ofasys.criterion", "speech_pretrain_loss", SpeechPretrainCriterionConfig)
class SpeechPretrainCriterion(LabelSmoothedCrossEntropyCriterion):
    global_dict = None  # attached by Task.initialize

    def _proj_range(self, vocab: int):
        d = self.global_dict
        if d is not None:
            try:
                return d.get_start_end_idx("<phone>")
            except Exception:
                pass
            try:
                start, end = d.get_start_end_idx("<text>")
                return start, min(end, start + self.cfg.mam_num_classes)
            except Exception:
                pass
        return 0, min(vocab, self.cfg.mam_num_classes)

    def __call__(self, model, params, sample, rng=None, train: bool = True):
        cfg = self.cfg
        slots = sample["net_input"]["slots"]
        net = model.net
        src = [s for s in slots if s.is_src]
        tgt = [s for s in slots if not s.is_src]
        rngs = {"dropout": rng} if (train and rng is not None) else None

        audio_only = len(src) == 1 and src[0].modality == ModalityType.AUDIO
        do_mam = train and rng is not None and cfg.mam_weight > 0 and audio_only

        frame_mask = None
        student_src = src
        if do_mam:
            s0 = src[0]
            B, T, M = s0.value["inputs"].shape
            stride = int(ConfigStore().get("ofasys.adaptor", "audio_fbank").config.subsample_stride)
            Ts = subsampled_length(T, stride)
            mrng = jax.random.fold_in(rng, 7)
            frame_mask = span_mask(mrng, B, Ts, cfg.mask_prob, cfg.mask_length)
            v = dict(s0.value)
            v["mask_indices"] = frame_mask
            if cfg.mask_channel_prob > 0:
                v["mask_channel_indices"] = span_mask(
                    jax.random.fold_in(mrng, 1), B, M,
                    cfg.mask_channel_prob, cfg.mask_channel_length,
                )
            student_src = [dataclasses.replace(s0, value=v)]

        student_enc = net.apply(
            {"params": params}, student_src,
            deterministic=not train, method=net.encode, rngs=rngs,
        )
        logits, extra = net.apply(
            {"params": params}, tgt, student_enc,
            deterministic=not train, method=net.decode_full, rngs=rngs,
            all_slots=list(student_src) + list(tgt),
        )
        ce_loss, sample_size, logging = self.compute_loss(logits, sample, train=train)
        loss = cfg.dec_weight * ce_loss

        if do_mam:
            teacher_enc = net.apply({"params": params}, src, method=net.encode)
            teacher_x = jax.lax.stop_gradient(teacher_enc.x).astype(jnp.float32)
            start, end = self._proj_range(params["embed_tokens"]["embedding"].shape[0])
            emb = jax.lax.stop_gradient(
                params["embed_tokens"]["embedding"][start:end]
            ).astype(jnp.float32)
            t_logits = teacher_x @ emb.T                      # (B, Ts, R)
            s_logits = student_enc.x.astype(jnp.float32) @ emb.T
            t_lp = jax.nn.log_softmax(t_logits, axis=-1)
            s_lp = jax.nn.log_softmax(s_logits, axis=-1)
            kl_pos = jnp.sum(jnp.exp(t_lp) * (t_lp - s_lp), axis=-1)   # (B, Ts)
            valid = frame_mask & jnp.logical_not(student_enc.padding_mask)
            mam_loss = jnp.where(valid, kl_pos, 0.0).sum()
            n_masked = jnp.maximum(valid.sum(), 1)
            # scale like a per-token loss so dec/mam magnitudes are comparable
            mam_loss = mam_loss / n_masked.astype(jnp.float32) * \
                jnp.maximum(sample_size, 1.0)
            loss = loss + cfg.mam_weight * mam_loss
            logging = dict(logging)
            logging["mam_loss"] = mam_loss
            logging["n_masked"] = n_masked
        logging["loss"] = loss
        return loss, sample_size, logging
