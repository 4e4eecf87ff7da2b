"""Pooling extra decoder (reference ofasys/model/decoders/pooling.py:43,
registry 'ofasys.model.extra_decoders' / 'pooling'): classification head over
pooled encoder output — used by retrieval/ITM-style heads alongside the
generative decoder."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ofasys_tpu.configure import register_config
from ofasys_tpu.configure.configs import BaseDataclass


@dataclass
class PoolingDecoderConfig(BaseDataclass):
    is_active: bool = False
    num_classes: int = 2
    pooling: str = "mean"        # 'mean' | 'max' | 'first'
    dropout: float = 0.1


class PoolingHead(nn.Module):
    cfg: PoolingDecoderConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, encoder_out: jax.Array, padding_mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        """encoder_out (B, T, E), padding_mask (B, T) True=pad -> (B, C)."""
        x = encoder_out
        if self.cfg.pooling == "first":
            pooled = x[:, 0]
        else:
            keep = None if padding_mask is None else jnp.logical_not(padding_mask)
            if self.cfg.pooling == "max":
                masked = x if keep is None else jnp.where(keep[:, :, None], x, -jnp.inf)
                pooled = masked.max(axis=1)
            else:
                if keep is None:
                    pooled = x.mean(axis=1)
                else:
                    w = keep.astype(x.dtype)[:, :, None]
                    pooled = (x * w).sum(axis=1) / jnp.maximum(w.sum(axis=1), 1.0)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, param_dtype=jnp.float32, name="dense")(pooled)
        h = jnp.tanh(h)
        h = nn.Dropout(self.cfg.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.cfg.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
                        name="out_proj")(h)


@register_config("ofasys.model.extra_decoders", "pooling", PoolingDecoderConfig)
class OFAPoolingModel:
    """Thin wrapper matching the reference registry entry."""

    def __init__(self, cfg: PoolingDecoderConfig):
        self.cfg = cfg
        self.head = PoolingHead(cfg)

    def init_params(self, rng, encoder_out, padding_mask=None):
        return self.head.init(rng, encoder_out, padding_mask)["params"]

    def apply(self, params, encoder_out, padding_mask=None, deterministic=True, rngs=None):
        return self.head.apply({"params": params}, encoder_out, padding_mask,
                               deterministic=deterministic, rngs=rngs)
