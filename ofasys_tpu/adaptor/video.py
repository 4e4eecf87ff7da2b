"""Video adaptor (reference ofasys/adaptor/video_image_sequence.py, 221 LoC):
per-frame conv patch embedding + learned temporal position embedding; frames
flatten into one sequence (N * h * w patches)."""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu.adaptor.base import AdaptorOutput, BaseAdaptor
from ofasys_tpu.adaptor.image import ImageAdaptorConfig, _grid_positions
from ofasys_tpu.configure import register_config
from ofasys_tpu.model.positional import image_bucket_count, make_image_bucket_position
from ofasys_tpu.utils.pytree import SlotBatch


@dataclass
class VideoAdaptorConfig(ImageAdaptorConfig):
    patch_size: int = 16
    max_frames: int = 32


@register_config("ofasys.adaptor", "video_image_sequence", VideoAdaptorConfig)
class VideoImageSequenceAdaptor(BaseAdaptor):
    @nn.compact
    def __call__(self, slot: SlotBatch, deterministic: bool = True) -> AdaptorOutput:
        acfg = self.adaptor_cfg
        videos = (slot.value["inputs"] if isinstance(slot.value, dict) else slot.value).astype(self.dtype)
        B, N, H, W, C = videos.shape
        p = acfg.patch_size
        from ofasys_tpu.adaptor.image import PatchEmbed

        x = PatchEmbed(self.embed_dim, p, dtype=self.dtype, name="patch_embed")(
            videos.reshape(B * N, H, W, C)
        )
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(B, N, h * w, self.embed_dim)

        # spatial positions per frame + temporal embedding per frame index
        bucket_size = acfg.image_bucket_size
        pos_ids = _grid_positions(h, w, bucket_size)
        spatial = nn.Embed(bucket_size * bucket_size + 1, self.embed_dim, dtype=self.dtype,
                           embedding_init=nn.initializers.normal(0.02),
                           name="embed_image_positions")(jnp.asarray(pos_ids)[None, :])
        temporal = nn.Embed(acfg.max_frames, self.embed_dim, dtype=self.dtype,
                            embedding_init=nn.initializers.normal(0.02),
                            name="embed_frame_positions")(jnp.arange(N)[None, :])
        pos = spatial[:, None, :, :] + temporal[:, :, None, :]       # (1, N, hw, E)

        embed = (x + temporal[:, :, None, :].astype(x.dtype)).reshape(B, N * h * w, self.embed_dim)
        pos_embed = pos.reshape(1, N * h * w, self.embed_dim)

        rel_tables = None
        rel_bucket = None
        if self.cfg.use_self_attn_bias:
            n_rel = image_bucket_count(bucket_size)
            full = make_image_bucket_position(bucket_size, n_rel)
            per_frame = full[np.ix_(pos_ids, pos_ids)]
            # block over frames: same spatial bucket within a frame, zero
            # bucket (-1 sentinel) across frames
            rel_bucket = -np.ones((N * h * w, N * h * w), np.int32)
            for f in range(N):
                s = f * h * w
                rel_bucket[s:s + h * w, s:s + h * w] = per_frame
            rel_tables = self.rel_pos_tables(n_rel, name="image_rel_pos_table")

        out = AdaptorOutput(
            embed=embed,
            padding_mask=jnp.zeros((B, N * h * w), bool),
            pos_embed=pos_embed,
            rel_bucket=rel_bucket,
            rel_tables=rel_tables,
            modal_id=slot.modality.value - 1,
        )
        return self.finish(slot, out, deterministic=deterministic)
