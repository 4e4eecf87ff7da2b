"""GeneralAdaptor: dispatches slots to modality adaptors and concatenates
their outputs into one sequence (reference ofasys/adaptor/general.py:49-300).

TPU design: the concat layout is static per task template, so the combined
relative-bias bucket matrix (block-diagonal across slots) is computed host-
side once per shape, and per-layer bias becomes a single gather from a
combined table (see model/positional.py:block_diag_buckets). The absolute-
position q/k bias (general.py:225-241) is computed once per forward, shared
by all layers, with batch dim 1 when positions are sample-independent.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu import ModalityType
from ofasys_tpu.adaptor.base import AdaptorOutput, BaseAdaptor
from ofasys_tpu.configure import ConfigStore
from ofasys_tpu.model.config import GeneralistModelConfig
from ofasys_tpu.model.positional import block_diag_buckets
from ofasys_tpu.model.transformer import BiasSpec
from ofasys_tpu.utils.pytree import SlotBatch

# Default adaptor per modality (reference adaptor/general.py:36-46).
DEFAULT_ADAPTOR_BY_MODALITY = {
    ModalityType.TEXT: "text",
    ModalityType.IMAGE: "image_vit",
    ModalityType.BOX: "text",
    ModalityType.AUDIO: "audio_fbank",
    ModalityType.MOTION: "motion_6d",
    ModalityType.PHONE: "text",
    ModalityType.VIDEO: "video_image_sequence",
    ModalityType.STRUCT: "text",
    ModalityType.CATEGORY: "text",
}


def resolve_adaptor_name(slot: SlotBatch, is_src: bool) -> str:
    name = slot.adaptor_name or (slot.get_attr("adaptor") if slot.attributes else None)
    if name:
        return name
    if slot.modality == ModalityType.IMAGE and not is_src:
        return "image_vqgan"
    if slot.modality == ModalityType.AUDIO and not is_src:
        return "audio_tgt_fbank"
    return DEFAULT_ADAPTOR_BY_MODALITY[slot.modality]


@dataclasses.dataclass
class GeneralAdaptorOutput:
    embed: jax.Array                 # (B, T, E)
    padding_mask: jax.Array          # (B, T) True = pad
    pos_embed: jax.Array             # (B|1, T, E)
    bias_spec: Optional[BiasSpec]
    modal_spans: Tuple[Tuple[int, int, int], ...]   # (start, end, modal_id)
    slot_spans: Tuple[Tuple[int, int], ...]          # per input slot


class GeneralAdaptor(nn.Module):
    """One per side (encoder / decoder)."""

    cfg: GeneralistModelConfig
    is_src: bool
    embed_tokens: nn.Embed
    active_adaptors: Tuple[str, ...]   # static: which adaptors exist as params
    pad_id: int = 1
    dtype: Any = jnp.bfloat16

    def setup(self):
        store = ConfigStore()
        adaptors = {}
        for name in self.active_adaptors:
            node = store.get("ofasys.adaptor", name)
            adaptors[name] = node.target_cls(
                cfg=self.cfg,
                adaptor_cfg=node.config,
                is_src=self.is_src,
                embed_tokens=self.embed_tokens,
                pad_id=self.pad_id,
                dtype=self.dtype,
                name=name,
            )
        self.adaptors = adaptors
        heads = self.cfg.encoder.attention_heads if self.is_src else self.cfg.decoder.attention_heads
        embed_dim = self.cfg.encoder.embed_dim
        self.num_attention_heads = heads
        # pos_scaling mirrors reference general.py:98
        self.pos_scaling = float(embed_dim / heads * self.cfg.attn_scale_factor) ** -0.5
        if self.cfg.use_self_attn_bias and not self.cfg.entangle_position_embedding:
            self.pos_q_linear = nn.Dense(embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="pos_q_linear")
            self.pos_k_linear = nn.Dense(embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="pos_k_linear")

    def get_adaptor(self, slot: SlotBatch) -> BaseAdaptor:
        name = resolve_adaptor_name(slot, self.is_src)
        if name not in self.adaptors:
            raise KeyError(
                f"adaptor {name!r} needed by slot {slot.column_name!r} is not active; "
                f"active: {sorted(self.adaptors)}"
            )
        return self.adaptors[name]

    def build_abs_pos_bias(self, pos_embed: jax.Array) -> jax.Array:
        """(B|1, H, T, T) absolute-position attention bias (general.py:225-241)."""
        B, T, E = pos_embed.shape
        H = self.num_attention_heads
        pos_q = self.pos_q_linear(pos_embed).reshape(B, T, H, -1) * self.pos_scaling
        pos_k = self.pos_k_linear(pos_embed).reshape(B, T, H, -1)
        return jnp.einsum("bqhd,bkhd->bhqk", pos_q, pos_k, preferred_element_type=jnp.float32)

    def __call__(self, slots: List[SlotBatch], deterministic: bool = True) -> GeneralAdaptorOutput:
        outputs: List[AdaptorOutput] = []
        for slot in slots:
            adaptor = self.get_adaptor(slot)
            outputs.append(adaptor(slot, deterministic=deterministic))

        embed = jnp.concatenate([o.embed for o in outputs], axis=1)
        padding_mask = jnp.concatenate([o.padding_mask for o in outputs], axis=1)
        # pos_embed batch dims may be mixed (1 vs B) — broadcast to a common dim
        pb = max(o.pos_embed.shape[0] for o in outputs)
        pos_embed = jnp.concatenate(
            [jnp.broadcast_to(o.pos_embed, (pb,) + o.pos_embed.shape[1:]) for o in outputs], axis=1
        )

        # modality spans (merge adjacent same-modality slots)
        spans: List[Tuple[int, int, int]] = []
        slot_spans: List[Tuple[int, int]] = []
        start = 0
        for o in outputs:
            end = start + o.seq_length
            slot_spans.append((start, end))
            if spans and spans[-1][2] == o.modal_id:
                spans[-1] = (spans[-1][0], end, o.modal_id)
            else:
                spans.append((start, end, o.modal_id))
            start = end

        bias_spec = None
        if self.cfg.use_self_attn_bias:
            abs_bias = None
            if not self.cfg.entangle_position_embedding:
                abs_bias = self.build_abs_pos_bias(pos_embed)
            # combined rel-bias: one bucket matrix + one concatenated table
            have_rel = [o for o in outputs if o.rel_tables is not None]
            bucket = tables = None
            if have_rel:
                n_tables = have_rel[0].rel_tables.shape[0]
                heads = have_rel[0].rel_tables.shape[-1]
                buckets, sizes, table_list = [], [], []
                for o in outputs:
                    if o.rel_tables is not None:
                        buckets.append(o.rel_bucket)
                        sizes.append(o.rel_tables.shape[1])
                        table_list.append(o.rel_tables)
                    else:
                        buckets.append(np.full((o.seq_length, o.seq_length), -1, np.int32))
                        sizes.append(0)
                bucket = block_diag_buckets(buckets, sizes)
                zero_row = jnp.zeros((n_tables, 1, heads), have_rel[0].rel_tables.dtype)
                tables = jnp.concatenate([zero_row] + table_list, axis=1)
            bias_spec = BiasSpec(bucket=bucket, tables=tables, abs_bias=abs_bias)

        return GeneralAdaptorOutput(
            embed=embed,
            padding_mask=padding_mask,
            pos_embed=pos_embed,
            bias_spec=bias_spec,
            modal_spans=tuple(spans),
            slot_spans=tuple(slot_spans),
        )

    def forward_output(self, x: jax.Array, extra: Dict[str, Any], slots: List[SlotBatch]):
        """Dispatch hidden states to the (single) target slot's output adaptor."""
        target = SlotBatch.target_slot(slots)
        adaptor = self.get_adaptor(target)
        return adaptor.forward_output(x, extra, target)
