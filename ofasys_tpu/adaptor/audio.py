"""Audio adaptors (reference ofasys/adaptor/audio.py, 763 LoC).

audio_fbank (encoder): stride-2 conv1d x2 subsampling of fbank frames
(4x fewer positions on the expensive encoder stack), learned positions,
token-bucket relative bias.

audio_tgt_fbank (decoder, TTS): Tacotron-style prenet on input frames;
``forward_output`` produces (mel frames, eos logits) plus a postnet conv
refinement (reference audio.py:338-520).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu.adaptor.base import AdaptorOutput, BaseAdaptor, BaseAdaptorConfig
from ofasys_tpu.configure import register_config
from ofasys_tpu.model.positional import make_token_bucket_position, token_bucket_count
from ofasys_tpu.utils.pytree import SlotBatch


@dataclass
class AudioFbankAdaptorConfig(BaseAdaptorConfig):
    num_mels: int = 80
    subsample_stride: int = 4       # total conv subsampling factor (2x2)
    conv_channels: int = 256
    token_bucket_size: int = 256
    # wav2vec-style feature masking for audio pretraining
    # (reference adaptor/audio.py:401-460): span masks over subsampled
    # frames are replaced by a learned mask embedding; channel masks zero
    # fbank channels. Mask indices arrive in slot.value (in-jit random from
    # the speech_pretrain criterion).
    mask_length: int = 10
    mask_channel_length: int = 10
    # run this many transformer encoder layers over the subsampled frames
    # INSIDE the adaptor, before the shared encoder sees them (reference
    # adaptor/audio.py:338 build_encoder_layer — its ASR configs prepend a
    # small audio-only stack). 0 = off.
    extra_encoder_layers: int = 0


@dataclass
class AudioTgtFbankAdaptorConfig(BaseAdaptorConfig):
    num_mels: int = 80
    n_frames_per_step: int = 1
    prenet_dim: int = 256
    prenet_dropout: float = 0.5
    postnet_channels: int = 512
    postnet_layers: int = 5
    token_bucket_size: int = 256


@register_config("ofasys.adaptor", "audio_fbank", AudioFbankAdaptorConfig)
class AudioFbankAdaptor(BaseAdaptor):
    @nn.compact
    def __call__(self, slot: SlotBatch, deterministic: bool = True) -> AdaptorOutput:
        acfg = self.adaptor_cfg
        feats = slot.value["inputs"].astype(self.dtype)        # (B, T, M)
        lengths = slot.value.get("lengths")
        B, T, M = feats.shape

        # channel masking (pretraining): zero whole fbank channels
        chan_mask = slot.value.get("mask_channel_indices")
        if chan_mask is not None:
            feats = jnp.where(chan_mask[:, None, :], 0.0, feats)

        x = feats
        n_convs = max(1, int(np.log2(acfg.subsample_stride)))
        for i in range(n_convs):
            x = nn.Conv(acfg.conv_channels, (5,), strides=(2,), padding=[(2, 2)],
                        dtype=self.dtype, param_dtype=jnp.float32, name=f"subsample_{i}")(x)
            x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(x)
        Ts = x.shape[1]

        # span masking (pretraining): learned mask embedding at masked frames.
        # mask_emb exists unconditionally so init-time traces (no mask) and
        # pretraining traces (masked) share one param tree.
        mask_emb = self.param("mask_emb", nn.initializers.normal(0.02),
                              (self.embed_dim,), jnp.float32)
        frame_mask = slot.value.get("mask_indices")
        if frame_mask is not None:
            x = jnp.where(frame_mask[:, :, None], mask_emb.astype(x.dtype), x)

        if lengths is not None:
            sub_lengths = jnp.ceil(lengths.astype(jnp.float32) / acfg.subsample_stride).astype(jnp.int32)
            padding_mask = jnp.arange(Ts)[None, :] >= sub_lengths[:, None]
        else:
            padding_mask = jnp.zeros((B, Ts), bool)

        if acfg.extra_encoder_layers > 0:
            # audio-only pre-encoder stack (reference adaptor/audio.py:338)
            from ofasys_tpu.model.transformer import TransformerEncoderLayer

            attn_mask = (~padding_mask)[:, None, None, :]  # keep-mask (B,1,1,Ts)
            for i in range(acfg.extra_encoder_layers):
                x = TransformerEncoderLayer(
                    self.cfg, dtype=self.dtype, name=f"extra_layers_{i}"
                )(x, attn_mask, None, deterministic)

        max_pos = self.cfg.max_source_positions
        pos_embed = nn.Embed(max_pos + 2, self.embed_dim, dtype=self.dtype,
                             embedding_init=nn.initializers.normal(0.02),
                             name="embed_positions")(jnp.arange(Ts)[None, :])

        rel_bucket = make_token_bucket_position(acfg.token_bucket_size, max_pos)[:Ts, :Ts]
        rel_tables = self.rel_pos_tables(token_bucket_count(acfg.token_bucket_size)) \
            if self.cfg.use_self_attn_bias else None

        out = AdaptorOutput(
            embed=x, padding_mask=padding_mask, pos_embed=pos_embed,
            rel_bucket=rel_bucket if rel_tables is not None else None,
            rel_tables=rel_tables, modal_id=slot.modality.value - 1,
        )
        return self.finish(slot, out, deterministic=deterministic)


@register_config("ofasys.adaptor", "audio_tgt_fbank", AudioTgtFbankAdaptorConfig)
class AudioTgtFbankAdaptor(BaseAdaptor):
    """Decoder-side TTS adaptor: prenet in, (mel, eos) out."""

    def setup(self):
        acfg = self.adaptor_cfg
        out_dim = acfg.num_mels * acfg.n_frames_per_step
        self.feat_out = nn.Dense(out_dim, dtype=jnp.float32, param_dtype=jnp.float32)
        self.eos_out = nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32)
        self.postnet = [
            nn.Conv(
                out_dim if i == acfg.postnet_layers - 1 else acfg.postnet_channels,
                (5,), padding=[(2, 2)], dtype=jnp.float32, param_dtype=jnp.float32,
                name=f"postnet_{i}",
            )
            for i in range(acfg.postnet_layers)
        ]

    @nn.compact
    def __call__(self, slot: SlotBatch, deterministic: bool = True) -> AdaptorOutput:
        acfg = self.adaptor_cfg
        frames = slot.value["inputs"].astype(self.dtype)       # (B, T, M*k)
        lengths = slot.value.get("lengths")
        pos_offset = slot.value.get("pos_offset", 0)
        B, T = frames.shape[:2]

        # Tacotron prenet: dropout stays ON at inference (teacher noise),
        # reference audio.py prenet semantics
        x = frames
        prenet_det = not self.has_rng("dropout")
        for i in range(2):
            x = nn.Dense(acfg.prenet_dim, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"prenet_{i}")(x)
            x = nn.relu(x)
            # Tacotron keeps prenet dropout active at inference too, but only
            # when a dropout rng is supplied (deterministic eval otherwise)
            x = nn.Dropout(acfg.prenet_dropout)(x, deterministic=prenet_det)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="prenet_proj")(x)

        if lengths is not None:
            padding_mask = jnp.arange(T)[None, :] >= lengths[:, None]
        else:
            padding_mask = jnp.zeros((B, T), bool)

        max_pos = self.cfg.max_target_positions
        positions = pos_offset + jnp.arange(T)
        pos_embed = nn.Embed(max_pos + 2, self.embed_dim, dtype=self.dtype,
                             embedding_init=nn.initializers.normal(0.02),
                             name="embed_positions")(positions[None, :])

        acb = self.adaptor_cfg.token_bucket_size
        rel_tables = self.rel_pos_tables(token_bucket_count(acb)) \
            if self.cfg.use_self_attn_bias else None
        rel_bucket = make_token_bucket_position(acb, max_pos)[:T, :T] if rel_tables is not None else None

        out = AdaptorOutput(
            embed=x, padding_mask=padding_mask, pos_embed=pos_embed,
            rel_bucket=rel_bucket if rel_tables is not None else None,
            rel_tables=rel_tables, modal_id=slot.modality.value - 1,
        )
        return self.finish(slot, out, deterministic=deterministic)

    def forward_output(self, x: jax.Array, extra: Dict[str, Any], slot: SlotBatch):
        """hidden -> (mel after postnet, extra{feature_before, eos_logits})."""
        acfg = self.adaptor_cfg
        xf = x.astype(jnp.float32)
        mel = self.feat_out(xf)
        eos = self.eos_out(xf)[..., 0]
        h = mel
        for i, conv in enumerate(self.postnet):
            h = conv(h)
            if i < acfg.postnet_layers - 1:
                h = jnp.tanh(h)
        mel_post = mel + h
        extra = dict(extra)
        extra.update({"feature_before": mel, "eos_logits": eos})
        return mel_post, extra
