"""Image input adaptors (reference ofasys/adaptor/{image_resnet,image_vit,
image_patch_embed}.py).

All three produce the same AdaptorOutput: patch-grid embeddings with 2-D
bucketed relative-position bias and learned absolute grid positions. The
grid (h, w) is static (preprocessor fixes the image size), so the bucket
sub-matrix is computed host-side once per shape.

Layout: NHWC (B, H, W, 3) in; flattened (B, h*w, E) out.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu.adaptor.base import AdaptorOutput, BaseAdaptor, BaseAdaptorConfig
from ofasys_tpu.configure import register_config
from ofasys_tpu.model.positional import image_bucket_count, make_image_bucket_position
from ofasys_tpu.model.resnet import ResNet
from ofasys_tpu.model.transformer import LN_EPS, TransformerEncoderLayer
from ofasys_tpu.utils.pytree import SlotBatch


class PatchEmbed(nn.Module):
    """Non-overlapping patch projection as space-to-depth + one matmul.

    Mathematically identical to nn.Conv(E, (p, p), strides=(p, p), VALID)
    and keeps that module's parameter layout (kernel (p, p, C, E) + bias),
    but XLA lowers the strided conv ~100x off peak on TPU (profiled at
    ~10ms/step on the mixed bench for 14.8 GFLOPs of work); the reshaped
    matmul rides the MXU like any other projection."""

    features: int
    patch: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:   # (B, H, W, C)
        p = self.patch
        B, H, W, C = images.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (p, p, C, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        h, w = H // p, W // p
        x = images[:, : h * p, : w * p].reshape(B, h, p, w, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, h * w, p * p * C)
        y = jnp.dot(x.astype(self.dtype),
                    kernel.reshape(p * p * C, self.features).astype(self.dtype))
        return (y + bias.astype(self.dtype)).reshape(B, h, w, self.features)


@dataclass
class ImageAdaptorConfig(BaseAdaptorConfig):
    image_bucket_size: int = 42          # max grid side for rel-pos buckets
    add_type_embedding: bool = True


@dataclass
class ImageResnetAdaptorConfig(ImageAdaptorConfig):
    resnet_type: str = "resnet101"
    freeze_resnet: bool = False
    resnet_drop_path_rate: float = 0.0


@dataclass
class ImageVitAdaptorConfig(ImageAdaptorConfig):
    patch_size: int = 16
    vit_layers: int = 0                  # extra transformer layers in the trunk


@dataclass
class ImagePatchEmbedAdaptorConfig(ImageAdaptorConfig):
    patch_size: int = 16
    vit_layers: int = 0


def _grid_positions(h: int, w: int, bucket_size: int) -> np.ndarray:
    """Flattened grid positions into the bucket_size x bucket_size table,
    offset by 1 for the CLS row (reference image_resnet.py:153-160)."""
    idx = np.arange(w)[None, :] + np.arange(h)[:, None] * bucket_size + 1
    return idx.reshape(-1).astype(np.int32)


class _ImageAdaptorMixin(BaseAdaptor):
    """Shared grid-position / rel-bias logic for image trunks."""

    def finish_image(self, slot: SlotBatch, feat: jax.Array, deterministic: bool) -> AdaptorOutput:
        """feat: (B, h, w, E) trunk output."""
        B, h, w, E = feat.shape
        acfg = self.adaptor_cfg
        bucket_size = acfg.image_bucket_size
        embed = feat.reshape(B, h * w, E)

        pos_ids = _grid_positions(h, w, bucket_size)
        embed_positions = nn.Embed(
            bucket_size * bucket_size + 1, self.embed_dim, dtype=self.dtype,
            embedding_init=nn.initializers.normal(0.02), name="embed_image_positions",
        )
        pos_embed = embed_positions(jnp.asarray(pos_ids)[None, :])  # (1, hw, E)

        rel_tables = None
        rel_bucket = None
        if self.cfg.use_self_attn_bias:
            n_rel = image_bucket_count(bucket_size)
            full_bucket = make_image_bucket_position(bucket_size, n_rel)
            rel_bucket = full_bucket[np.ix_(pos_ids, pos_ids)]
            rel_tables = self.rel_pos_tables(n_rel, name="image_rel_pos_table")

        padding_mask = jnp.zeros((B, h * w), bool)
        out = AdaptorOutput(
            embed=embed,
            padding_mask=padding_mask,
            pos_embed=pos_embed,
            rel_bucket=rel_bucket,
            rel_tables=rel_tables,
            modal_id=slot.modality.value - 1,
        )
        return self.finish(slot, out, deterministic=deterministic)

    @staticmethod
    def get_images(slot: SlotBatch) -> jax.Array:
        v = slot.value["inputs"] if isinstance(slot.value, dict) else slot.value
        return v


@register_config("ofasys.adaptor", "image_resnet", ImageResnetAdaptorConfig)
class ImageResnetAdaptor(_ImageAdaptorMixin):
    """ResNet trunk -> 1x1 proj -> grid embeddings
    (reference adaptor/image_resnet.py:70-202)."""

    @nn.compact
    def __call__(self, slot: SlotBatch, deterministic: bool = True) -> AdaptorOutput:
        images = self.get_images(slot).astype(self.dtype)  # (B, H, W, 3)
        feat = ResNet(
            self.adaptor_cfg.resnet_type,
            drop_path_rate=self.adaptor_cfg.resnet_drop_path_rate,
            dtype=self.dtype, name="embed_images",
        )(images, deterministic=deterministic)
        if self.adaptor_cfg.freeze_resnet:
            feat = jax.lax.stop_gradient(feat)
        feat = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="image_proj")(feat)
        return self.finish_image(slot, feat, deterministic)


@register_config("ofasys.adaptor", "image_vit", ImageVitAdaptorConfig)
class ImageVitAdaptor(_ImageAdaptorMixin):
    """Conv patch embedding + optional local transformer layers
    (reference adaptor/image_vit.py)."""

    @nn.compact
    def __call__(self, slot: SlotBatch, deterministic: bool = True) -> AdaptorOutput:
        images = self.get_images(slot).astype(self.dtype)
        p = self.adaptor_cfg.patch_size
        feat = PatchEmbed(self.embed_dim, p, dtype=self.dtype, name="patch_embed")(images)
        B, h, w, E = feat.shape
        if self.adaptor_cfg.vit_layers > 0:
            x = feat.reshape(B, h * w, E)
            for i in range(self.adaptor_cfg.vit_layers):
                x = TransformerEncoderLayer(self.cfg, dtype=self.dtype, name=f"vit_layers_{i}")(
                    x, deterministic=deterministic
                )
            feat = x.reshape(B, h, w, E)
        return self.finish_image(slot, feat, deterministic)


@register_config("ofasys.adaptor", "image_patch_embed", ImagePatchEmbedAdaptorConfig)
class ImagePatchEmbedAdaptor(ImageVitAdaptor):
    """Raw conv patch embedding (reference adaptor/image_patch_embed.py)."""
