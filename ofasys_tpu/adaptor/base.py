"""Adaptor layer: modality tensors <-> unified embedding sequences.

Counterpart of ofasys/adaptor/base.py. Each adaptor is a flax module with two
roles: ``__call__`` (input adaptor: slot batch -> AdaptorOutput) and
``forward_output`` (output adaptor: hidden states -> modality logits/features).

TPU delta vs the reference: an adaptor does NOT materialize per-layer
B×H×T×T attention-bias tensors (reference base.py:185-191). It returns a
static host-side bucket matrix + a stacked per-layer table parameter; layers
gather the bias lazily (model/transformer.py BiasSpec).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu.configure.configs import BaseDataclass
from ofasys_tpu.model.config import GeneralistModelConfig
from ofasys_tpu.model.transformer import LN_EPS
from ofasys_tpu.utils.pytree import SlotBatch


@dataclass
class BaseAdaptorConfig(BaseDataclass):
    """Per-adaptor knobs (reference adaptor/base.py:57-102). Model-wide values
    (embed_dim, heads, layer counts, ...) are read from the model config
    directly rather than copied in."""

    is_active: bool = False
    layernorm_embedding: bool = True
    layernorm_position: bool = True
    add_type_embedding: bool = True
    no_scale_embedding: bool = True
    dropout: Optional[float] = None


@dataclasses.dataclass
class AdaptorOutput:
    """One slot's adapted sequence (reference adaptor/base.py:20-53).

    embed:        (B, T, E)
    padding_mask: (B, T) bool, True = PAD (reference `masks` convention)
    pos_embed:    (1 or B, T, E) absolute position embeddings
    rel_bucket:   (T, T) int32 numpy (static) or None
    rel_tables:   (n_tables, n_buckets, H) or None — per-layer bias tables
    modal_id:     int (ModalityType.value - 1), for modal_ffn expert spans
    """

    embed: jax.Array
    padding_mask: jax.Array
    pos_embed: jax.Array
    rel_bucket: Optional[np.ndarray] = None
    rel_tables: Optional[jax.Array] = None
    modal_id: int = 0

    @property
    def seq_length(self) -> int:
        return self.embed.shape[1]


class BaseAdaptor(nn.Module):
    """Shared embed-postprocessing (reference forward_hook_fn, base.py:152-191):
    optional embed scale, type embedding (source side), embedding/position
    layernorms, dropout."""

    cfg: GeneralistModelConfig
    adaptor_cfg: BaseAdaptorConfig
    is_src: bool
    embed_tokens: nn.Embed        # shared global token embedding (module ref)
    pad_id: int = 1
    dtype: Any = jnp.bfloat16

    @property
    def num_layers(self) -> int:
        return self.cfg.encoder.layers if self.is_src else self.cfg.decoder.layers

    @property
    def num_bias_tables(self) -> int:
        return 1 if self.cfg.share_attn_bias else self.num_layers

    @property
    def embed_dim(self) -> int:
        return self.cfg.encoder.embed_dim

    def finish(
        self,
        slot: SlotBatch,
        out: AdaptorOutput,
        deterministic: bool = True,
    ) -> AdaptorOutput:
        acfg = self.adaptor_cfg
        embed = out.embed
        if not acfg.no_scale_embedding:
            embed = embed * jnp.asarray(self.embed_dim ** 0.5, embed.dtype)
        if self.cfg.entangle_position_embedding and out.pos_embed is not None:
            embed = embed + out.pos_embed.astype(embed.dtype)
        if slot.is_src and acfg.add_type_embedding and self.cfg.add_type_embedding:
            type_embed = self.param(
                "type_embedding", nn.initializers.normal(0.02), (self.embed_dim,), jnp.float32
            )
            embed = embed + type_embed.astype(embed.dtype)
        if acfg.layernorm_embedding and self.cfg.layernorm_embedding:
            embed = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="layernorm_embedding")(embed)
        pos_embed = out.pos_embed
        if acfg.layernorm_position and pos_embed is not None:
            pos_embed = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="layernorm_position")(pos_embed)
        dropout = acfg.dropout if acfg.dropout is not None else self.cfg.dropout
        embed = nn.Dropout(dropout)(embed, deterministic=deterministic)
        return dataclasses.replace(out, embed=embed, pos_embed=pos_embed)

    def rel_pos_tables(self, n_buckets: int, name: str = "rel_pos_table") -> jax.Array:
        """Stacked per-layer relative-bias tables, zero-init (reference keeps a
        ModuleList of zero-init Embeddings, text.py:75-77)."""
        heads = self.cfg.encoder.attention_heads if self.is_src else self.cfg.decoder.attention_heads
        return self.param(
            name, nn.initializers.zeros, (self.num_bias_tables, n_buckets, heads), jnp.float32
        )

    # ---- output adaptor ----
    def forward_output(self, x: jax.Array, extra: Dict[str, Any], slot: SlotBatch):
        return x, extra
