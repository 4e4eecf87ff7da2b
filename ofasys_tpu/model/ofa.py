"""GeneralistModel: one shared encoder-decoder over all modalities/tasks.

Counterpart of ofasys/model/ofa.py:329-556. Split in two:

  * :class:`GeneralistNet` — the flax module (pure function of params):
    encoder GeneralAdaptor -> TransformerEncoder -> decoder GeneralAdaptor
    -> TransformerDecoder -> output adaptor. Training forward, plus
    ``encode`` / ``decode_prepare`` / ``decode_step`` for the jitted
    generation loop (the reference's incremental_state dance becomes an
    explicit KV-cache pytree).
  * :class:`GeneralistModel` — the user-facing object with the reference's
    lifecycle (``initialize(global_dict)`` after the vocab is final,
    ``forward(slots)``), holding config + params.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu.adaptor.general import GeneralAdaptor, resolve_adaptor_name
from ofasys_tpu.configure import ConfigStore, register_config
from ofasys_tpu.model.config import GeneralistModelConfig, apply_arch
from ofasys_tpu.ops.quant import QuantEmbed, as_variables
from ofasys_tpu.model.transformer import (
    BiasSpec,
    MultiheadAttention,
    TransformerDecoder,
    TransformerEncoder,
)
from ofasys_tpu.utils.pytree import SlotBatch


@dataclasses.dataclass
class EncoderOut:
    """Pytree passed from encode to decode (reference encoder-out dict,
    model/transformer.py:160-203)."""

    x: jax.Array                    # (B, Ts, E)
    padding_mask: jax.Array         # (B, Ts) True = pad
    pos_embed: jax.Array            # (B|1, Ts, E)


jax.tree_util.register_dataclass(
    EncoderOut, data_fields=["x", "padding_mask", "pos_embed"], meta_fields=[]
)


class GeneralistNet(nn.Module):
    cfg: GeneralistModelConfig
    vocab_size: int
    pad_id: int
    active_adaptors: Tuple[str, ...]
    dtype: Any = jnp.bfloat16
    mesh: Any = None           # device mesh; needed when pipeline_stages > 1

    def setup(self):
        cfg = self.cfg
        E = cfg.encoder.embed_dim
        # BERT-style init (reference model/ofa.py init_bert_params usage)
        # QuantEmbed == nn.Embed for training; its attend() consumes an
        # int8 logits table when serving variables carry one (ops/quant.py)
        self.embed_tokens = QuantEmbed(
            self.vocab_size, E, param_dtype=jnp.float32, dtype=self.dtype,
            embedding_init=nn.initializers.normal(0.02), name="embed_tokens",
        )
        self.encoder_adaptor = GeneralAdaptor(
            cfg, True, self.embed_tokens, self.active_adaptors, self.pad_id,
            dtype=self.dtype, name="encoder_adaptor",
        )
        self.decoder_adaptor = GeneralAdaptor(
            cfg, False, self.embed_tokens, self.active_adaptors, self.pad_id,
            dtype=self.dtype, name="decoder_adaptor",
        )
        self.encoder = TransformerEncoder(cfg, dtype=self.dtype, mesh=self.mesh, name="encoder")
        self.decoder = TransformerDecoder(cfg, dtype=self.dtype, mesh=self.mesh, name="decoder")
        if cfg.use_self_attn_bias:
            # cross-attention absolute-position bias (reference
            # model/transformer.py:239-299), shared across decoder layers
            self.cross_pos_q_linear = nn.Dense(E, dtype=self.dtype, param_dtype=jnp.float32)
            self.cross_pos_k_linear = nn.Dense(E, dtype=self.dtype, param_dtype=jnp.float32)
            heads = cfg.decoder.attention_heads
            self.cross_pos_scaling = float(E / heads * cfg.attn_scale_factor) ** -0.5

    # ------------------------------------------------------------- helpers
    def cross_bias(self, tgt_pos_embed: jax.Array, src_pos_embed: jax.Array) -> Optional[jax.Array]:
        if not self.cfg.use_self_attn_bias:
            return None
        H = self.cfg.decoder.attention_heads
        Bq, Tq = tgt_pos_embed.shape[:2]
        Bk, Tk = src_pos_embed.shape[:2]
        B = max(Bq, Bk)
        pos_q = self.cross_pos_q_linear(tgt_pos_embed).reshape(Bq, Tq, H, -1) * self.cross_pos_scaling
        pos_k = self.cross_pos_k_linear(src_pos_embed).reshape(Bk, Tk, H, -1)
        if Bq != Bk:
            pos_q = jnp.broadcast_to(pos_q, (B,) + pos_q.shape[1:])
            pos_k = jnp.broadcast_to(pos_k, (B,) + pos_k.shape[1:])
        return jnp.einsum("bqhd,bkhd->bhqk", pos_q, pos_k, preferred_element_type=jnp.float32)

    # -------------------------------------------------------------- encode
    def encode(self, src_slots: List[SlotBatch], deterministic: bool = True) -> EncoderOut:
        a = self.encoder_adaptor(src_slots, deterministic=deterministic)
        x = self.encoder(
            a.embed,
            padding_mask=jnp.logical_not(a.padding_mask),
            bias_spec=a.bias_spec,
            deterministic=deterministic,
            modal_spans=a.modal_spans if self.cfg.modal_ffn else None,
        )
        return EncoderOut(x=x, padding_mask=a.padding_mask, pos_embed=a.pos_embed)

    # ------------------------------------------------------ training forward
    def __call__(
        self,
        slots: List[SlotBatch],
        deterministic: bool = True,
        full_context: bool = False,
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """Full forward: returns (output, extra); for text-like targets the
        output is vocab logits (B, Tt, V). ``full_context=True`` drops the
        causal mask (diffusion decoder, reference full_context_alignment)."""
        src_slots = SlotBatch.source_slots(slots)
        tgt_slots = [s for s in slots if not s.is_src]
        enc = self.encode(src_slots, deterministic=deterministic) if src_slots else None
        out, extra = self.decode_full(tgt_slots, enc, deterministic=deterministic,
                                      full_context=full_context, all_slots=slots)
        if enc is not None:
            # criteria with encoder-side losses (CTC over phone targets,
            # reference speech_to_text_loss.py:217-225 return_encoder_out)
            # read the encoder states from extra; XLA dead-code-eliminates
            # this for criteria that ignore it
            extra["encoder_out"] = enc
        return out, extra

    def decode_full(
        self,
        tgt_slots: List[SlotBatch],
        enc: Optional[EncoderOut],
        deterministic: bool = True,
        full_context: bool = False,
        all_slots: Optional[List[SlotBatch]] = None,
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """Decoder-side forward against a (possibly reused) encoder-out —
        the diffusion sampler calls this per step without re-encoding
        (reference build_denoise_fn reuse_encoder_out)."""
        d = self.decoder_adaptor(tgt_slots, deterministic=deterministic)
        cb = None
        if enc is not None:
            cb = self.cross_bias(d.pos_embed, enc.pos_embed)
        x, _ = self.decoder(
            d.embed,
            enc.x if enc is not None else None,
            self_padding_mask=jnp.logical_not(d.padding_mask),
            encoder_padding_mask=None if enc is None else jnp.logical_not(enc.padding_mask),
            self_bias_spec=d.bias_spec,
            cross_bias=cb,
            deterministic=deterministic,
            modal_spans=d.modal_spans if self.cfg.modal_ffn else None,
            full_context=full_context,
        )
        extra: Dict[str, Any] = {"decoder_hidden": x}
        out, extra = self.decoder_adaptor.forward_output(x, extra, all_slots or tgt_slots)
        return out, extra

    # ------------------------------------------------- incremental decoding
    def decode_prepare(
        self,
        tgt_slots: List[SlotBatch],
        enc: EncoderOut,
        max_len: int,
    ):
        """Build decode-time constants: full-length self BiasSpec, cross bias,
        and the KV cache. tgt_slots carry dummy (B, max_len) token values."""
        d = self.decoder_adaptor(tgt_slots, deterministic=True)
        cb = self.cross_bias(d.pos_embed, enc.pos_embed)
        cfg = self.cfg
        H = cfg.decoder.attention_heads
        head_dim = cfg.decoder.embed_dim // H
        B = enc.x.shape[0]
        # precompute each layer's cross-attention K/V over the (static)
        # encoder output once, so decode steps hit the static_kv reuse branch
        # instead of re-projecting enc.x every step (reference incremental
        # static_kv path, module/multihead_attention.py:150-180)
        dec_params = self.decoder.variables["params"]
        dec_qkern = dict(self.decoder.variables.get("qkern", {}))
        xs = enc.x.astype(self.dtype)

        def _proj(layer_params, layer_qkern, name):
            b = layer_params[name]["bias"].astype(self.dtype)
            if "kernel" in layer_params[name]:
                y = xs @ layer_params[name]["kernel"].astype(self.dtype)
            else:
                # kernel moved to the int8 'qkern' collection (ops/quant.py
                # quantize_for_serving): run the quantized matmul instead
                from ofasys_tpu.ops.quant import int8_matmul

                y = int8_matmul(
                    xs, layer_qkern[name]["q"], layer_qkern[name]["scale"],
                    mode=getattr(cfg, "quant_mode", "w8a8"), out_dtype=self.dtype,
                )
            return (y + b).reshape(B, -1, H, head_dim)

        cache = {}
        for i in range(cfg.decoder.layers):
            if cfg.scan_layers:
                stacked = dec_params["layers_scan"]["layer"]["encoder_attn"]
                lp = jax.tree.map(lambda a: a[i], stacked)
                qstack = (
                    dec_qkern.get("layers_scan", {}).get("layer", {}).get("encoder_attn")
                )
                qk = None if qstack is None else jax.tree.map(lambda a: a[i], qstack)
            else:
                lp = dec_params[f"layers_{i}"]["encoder_attn"]
                qk = dec_qkern.get(f"layers_{i}", {}).get("encoder_attn")
            cache[f"layers_{i}"] = {
                "self": MultiheadAttention.init_cache(B, max_len, H, head_dim, self.dtype),
                "cross": {"k": _proj(lp, qk, "k_proj"), "v": _proj(lp, qk, "v_proj")},
            }
        return d.bias_spec, cb, cache

    def decode_step(
        self,
        tokens: jax.Array,            # (B, S) current step token(s)
        step: jax.Array,              # scalar int32 — absolute position
        enc: EncoderOut,
        bias_spec: Optional[BiasSpec],
        cross_bias: Optional[jax.Array],
        cache: Dict[str, Any],
        tgt_slot: SlotBatch,
    ):
        """One decode step: returns (output (B, S, ...), extra, new_cache)."""
        step_slot = dataclasses.replace(
            tgt_slot, value={"inputs": tokens, "pos_offset": step}
        )
        d = self.decoder_adaptor([step_slot], deterministic=True)
        x, new_cache = self.decoder(
            d.embed,
            enc.x,
            self_padding_mask=None,
            encoder_padding_mask=jnp.logical_not(enc.padding_mask),
            self_bias_spec=bias_spec,
            cross_bias=cross_bias,
            deterministic=True,
            cache=cache,
            cache_index=step,
        )
        extra: Dict[str, Any] = {}
        out, extra = self.decoder_adaptor.forward_output(x, extra, [step_slot])
        return out, extra, new_cache


@register_config("ofasys.model", "unify", GeneralistModelConfig)
class GeneralistModel:
    """User-facing model object (reference model/ofa.py:329).

    Lifecycle:
        model = GeneralistModel(arch="base")
        model.initialize(global_dict, active_adaptors=("text", ...))
        params = model.init_params(rng, sample_slots)
        logits, extra = model.apply(params, slots, ...)
    """

    def __init__(self, cfg: Optional[GeneralistModelConfig] = None, arch: Optional[str] = None, **kwargs):
        if cfg is None:
            # deep copy: apply_arch/update mutate the config in place; the
            # store's default node must survive one model's customization
            import copy

            cfg = copy.deepcopy(ConfigStore().get("ofasys.model", "unify").config)
        self.cfg = cfg
        if arch:
            apply_arch(self.cfg, arch)
        if kwargs:
            self.cfg.update(**kwargs)
        self.net: Optional[GeneralistNet] = None
        self.global_dict = None

    # ------------------------------------------------------------ lifecycle
    def initialize(self, global_dict, active_adaptors: Tuple[str, ...] = ("text",), dtype=jnp.bfloat16,
                   mesh=None):
        """Build the flax module once the vocab is final
        (reference model/ofa.py:349-377). ``mesh`` is only needed for
        pipeline parallelism (cfg.pipeline_stages > 1)."""
        self.global_dict = global_dict
        if self.cfg.pipeline_stages > 1 and not self.cfg.scan_layers:
            raise ValueError("pipeline_stages > 1 requires scan_layers=True (stacked layer params)")
        if self.cfg.scan_layers and (
            self.cfg.encoder.layerdrop > 0.0 or self.cfg.decoder.layerdrop > 0.0
        ):
            raise ValueError(
                "layerdrop requires the loop layer layout (scan_layers=False): "
                "nn.scan shares one compiled body across layers"
            )
        if self.cfg.scan_layers and self.cfg.moe_experts > 0:
            raise ValueError(
                "moe_experts requires the loop layer layout (scan_layers=False): "
                "MoE layers have different params than dense layers, which "
                "breaks nn.scan's homogeneous stacked-parameter structure"
            )
        if self.cfg.pipeline_stages > 1 and getattr(self.cfg, "sequence_parallel", False):
            # ring attention's shard_map cannot nest inside pipeline_stack's
            # partial-manual shard_map over the same mesh — fail at config
            # time instead of deep inside the layer trace
            raise ValueError("sequence_parallel cannot be combined with pipeline_stages > 1")
        self.net = GeneralistNet(
            cfg=self.cfg,
            vocab_size=len(global_dict),
            pad_id=global_dict.pad(),
            active_adaptors=tuple(active_adaptors),
            dtype=dtype,
            mesh=mesh,
        )
        return self

    def init_params(self, rng, sample_slots):
        """``sample_slots`` is one slot list, or a list of slot lists (one per
        task) — flax only materializes params for modules actually called, so
        heterogeneous multi-task fits must trace every task's slot plan once
        or later tasks' adaptor params would be missing."""
        assert self.net is not None, "call initialize(global_dict) first"
        slot_lists = (
            list(sample_slots)
            if sample_slots and isinstance(sample_slots[0], (list, tuple))
            else [sample_slots]
        )

        def init_all(net, lists):
            out = None
            for slots in lists:
                out = net(list(slots), deterministic=True)
            return out

        # jit the whole init: one compiled program instead of one dispatch per
        # parameter (matters on remote/tunneled devices)
        init = jax.jit(
            lambda r, lists: self.net.init({"params": r}, lists, method=init_all)["params"]
        )
        return init(rng, slot_lists)

    def apply(self, params, slots: List[SlotBatch], deterministic: bool = True, rngs=None,
              full_context: bool = False, with_aux_losses: bool = False):
        """``with_aux_losses``: also return the summed 'losses' collection
        (MoE load-balance aux, transformer.py MoEFeedForward) as a scalar —
        (logits, extra, aux). Criteria request this during training."""
        if with_aux_losses:
            (logits, extra), mut = self.net.apply(
                as_variables(params), slots, deterministic=deterministic,
                rngs=rngs, full_context=full_context, mutable=["losses"],
            )
            leaves = jax.tree_util.tree_leaves(mut.get("losses", {}))
            aux = sum(jnp.sum(l) for l in leaves) if leaves else jnp.float32(0.0)
            return logits, extra, aux
        return self.net.apply(as_variables(params), slots, deterministic=deterministic,
                              rngs=rngs, full_context=full_context)

    @property
    def num_params(self):
        return None
