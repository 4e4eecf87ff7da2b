"""Decoder-side image-code adaptor (reference ofasys/adaptor/image_vqgan.py:49-203):
embeds ``<code>_i`` tokens through the shared vocab with 2-D grid positions
and image-bucket relative bias; output head is the tied embedding (decode is
constraint-ranged to the <code> sub-vocab)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu.adaptor.base import AdaptorOutput, BaseAdaptor, BaseAdaptorConfig
from ofasys_tpu.configure import register_config
from ofasys_tpu.model.positional import image_bucket_count, make_image_bucket_position
from ofasys_tpu.utils.pytree import SlotBatch


@dataclass
class ImageVqganAdaptorConfig(BaseAdaptorConfig):
    code_image_size: int = 256
    code_downsample: int = 8
    image_bucket_size: int = 42


@register_config("ofasys.adaptor", "image_vqgan", ImageVqganAdaptorConfig)
class ImageVqganAdaptor(BaseAdaptor):
    @nn.compact
    def __call__(self, slot: SlotBatch, deterministic: bool = True) -> AdaptorOutput:
        acfg = self.adaptor_cfg
        tokens = slot.value["inputs"] if isinstance(slot.value, dict) else slot.value
        pos_offset = slot.value.get("pos_offset", 0) if isinstance(slot.value, dict) else 0
        B, T = tokens.shape
        padding_mask = tokens == self.pad_id
        embed = self.embed_tokens(tokens).astype(self.dtype)

        grid = acfg.code_image_size // acfg.code_downsample
        bucket_size = acfg.image_bucket_size
        # grid positions for the code raster; +1 row for the leading bos step;
        # pad with CLS slot 0 so padded/overlong buffers still index validly
        pos_grid = (np.arange(grid)[None, :] + np.arange(grid)[:, None] * bucket_size + 1).reshape(-1)
        pos_ids_full = np.concatenate([[0], pos_grid]).astype(np.int32)   # bos gets CLS slot 0
        if len(pos_ids_full) < T + 1:
            pos_ids_full = np.concatenate(
                [pos_ids_full, np.zeros(T + 1 - len(pos_ids_full), np.int32)]
            )
        max_needed = len(pos_ids_full)
        embed_positions = nn.Embed(
            bucket_size * bucket_size + 1, self.embed_dim, dtype=self.dtype,
            embedding_init=nn.initializers.normal(0.02), name="embed_image_positions",
        )
        if isinstance(pos_offset, int):
            ids = jnp.asarray(pos_ids_full[pos_offset:pos_offset + T])
        else:
            ids = jax.lax.dynamic_slice_in_dim(jnp.asarray(pos_ids_full), pos_offset, T)
        pos_embed = embed_positions(ids[None, :])

        rel_tables = None
        rel_bucket = None
        if self.cfg.use_self_attn_bias:
            n_rel = image_bucket_count(bucket_size)
            full = make_image_bucket_position(bucket_size, n_rel)
            rel_bucket = full[np.ix_(pos_ids_full[:min(T, max_needed)],
                                     pos_ids_full[:min(T, max_needed)])]
            if rel_bucket.shape[0] < T:  # safety for oversized buffers
                pad = T - rel_bucket.shape[0]
                rel_bucket = np.pad(rel_bucket, ((0, pad), (0, pad)), constant_values=-1)
            rel_tables = self.rel_pos_tables(n_rel, name="image_rel_pos_table")

        out = AdaptorOutput(
            embed=embed, padding_mask=padding_mask, pos_embed=pos_embed,
            rel_bucket=rel_bucket, rel_tables=rel_tables,
            modal_id=slot.modality.value - 1,
        )
        return self.finish(slot, out, deterministic=deterministic)

    def forward_output(self, x: jax.Array, extra: Dict[str, Any], slot: SlotBatch):
        logits = self.embed_tokens.attend(x.astype(jnp.float32))
        return logits, extra
