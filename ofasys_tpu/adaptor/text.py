"""Text adaptor: token ids -> embeddings; hidden states -> vocab logits.

Counterpart of ofasys/adaptor/text.py: shared token embedding lookup,
learned absolute positions, bucketed relative-position bias tables
(one per layer), tied output projection.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ofasys_tpu.adaptor.base import AdaptorOutput, BaseAdaptor, BaseAdaptorConfig
from ofasys_tpu.configure import register_config
from ofasys_tpu.model.positional import make_token_bucket_position, token_bucket_count
from ofasys_tpu.utils.pytree import SlotBatch


@dataclass
class TextAdaptorConfig(BaseAdaptorConfig):
    token_bucket_size: int = 256
    share_input_output_embed: bool = True
    output_bias: bool = False


@register_config("ofasys.adaptor", "text", TextAdaptorConfig)
class TextAdaptor(BaseAdaptor):
    """Token embeddings + positions + per-layer rel-pos bias tables."""

    def setup(self):
        # untied output projection / vocab bias (reference adaptor/text.py:
        # 39-57,81-90); declared here because forward_output is a plain
        # method (setup-params compose fine with the @compact __call__)
        if not getattr(self.adaptor_cfg, "share_input_output_embed", True):
            self._output_projection = self.param(
                "output_projection",
                nn.initializers.normal(self.embed_dim ** -0.5),
                (self.embed_dim, self.embed_tokens.num_embeddings), jnp.float32,
            )
        if getattr(self.adaptor_cfg, "output_bias", False):
            self._output_bias = self.param(
                "output_projection_bias",
                nn.initializers.zeros,
                (self.embed_tokens.num_embeddings,), jnp.float32,
            )

    @nn.compact
    def __call__(self, slot: SlotBatch, deterministic: bool = True) -> AdaptorOutput:
        tokens = slot.value["inputs"] if isinstance(slot.value, dict) else slot.value
        B, T = tokens.shape
        padding_mask = tokens == self.pad_id

        max_pos = self.cfg.max_source_positions if self.is_src else self.cfg.max_target_positions
        embed_positions = nn.Embed(
            max_pos + 2, self.embed_dim, dtype=self.dtype,
            embedding_init=nn.initializers.normal(0.02), name="embed_positions",
        )
        # pos_offset: absolute position of tokens[:, 0] (incremental decode
        # feeds mid-sequence windows via model.decode_step)
        pos_offset = slot.value.get("pos_offset", 0) if isinstance(slot.value, dict) else 0
        pos_embed = embed_positions(pos_offset + jnp.arange(T)[None, :])  # (1, T, E)

        embed = self.embed_tokens(tokens).astype(self.dtype)

        bucket_size = getattr(self.adaptor_cfg, "token_bucket_size", 256)
        rel_bucket = make_token_bucket_position(bucket_size, max_pos)[:T, :T]
        rel_tables = None
        if self.cfg.use_self_attn_bias:
            rel_tables = self.rel_pos_tables(token_bucket_count(bucket_size))

        out = AdaptorOutput(
            embed=embed,
            padding_mask=padding_mask,
            pos_embed=pos_embed,
            rel_bucket=rel_bucket,
            rel_tables=rel_tables,
            modal_id=slot.modality.value - 1,
        )
        return self.finish(slot, out, deterministic=deterministic)

    def forward_output(self, x: jax.Array, extra: Dict[str, Any], slot: SlotBatch):
        """hidden -> vocab logits via the tied embedding (text.py:129).

        The matmul runs 2D: feeding (B, T, E) straight into the (E, V)
        projection makes XLA pick a V-major operand layout and propagate
        it back through the final LayerNorm, whose backward reductions
        then run ~13x slower (profiled on the 50k-vocab mixed step).
        flax promotes both operands to the module dtype (bf16 compute,
        f32 accumulation); softmax/losses upcast at their own sites.

        share_input_output_embed=False swaps the tied projection for an
        untied (E, V) kernel; output_bias adds a vocab bias — both match
        the reference's flags (adaptor/text.py:39-57,81-90)."""
        B, T, E = x.shape
        x2 = x.reshape(B * T, E)
        if getattr(self.adaptor_cfg, "share_input_output_embed", True):
            logits = self.embed_tokens.attend(x2)
        else:
            logits = x2 @ self._output_projection.astype(x2.dtype)
        if getattr(self.adaptor_cfg, "output_bias", False):
            logits = logits + self._output_bias.astype(logits.dtype)
        return logits.reshape(B, T, -1), extra
