"""GeneralistModel configuration + arch presets.

Mirrors the reference's GeneralistModelConfig surface (ofasys/model/ofa.py:40-121,
module/transformer_config.py) with the default_model.yaml defaults baked in
(pre-LN, learned positions, no embed scaling, layernorm_embedding, gelu,
attn_scale_factor=2, scale_attn/fc/heads on). Arch presets follow
ofasys/model/ofa.py:559-650.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from ofasys_tpu.configure.configs import BaseDataclass


@dataclass
class TransformerStackConfig(BaseDataclass):
    embed_dim: int = 256
    ffn_embed_dim: int = 1024
    layers: int = 4
    attention_heads: int = 4
    normalize_before: bool = True
    # (reference learned_pos deleted: positions are always learned
    # embeddings, the only variant the reference archs ship)
    # LayerDrop (reference layerdrop / LayerDropModuleList): each training
    # step drops whole layers with this probability (loop layout only —
    # scan_layers shares one compiled body across layers)
    layerdrop: float = 0.0


@dataclass
class GeneralistModelConfig(BaseDataclass):
    arch: str = "tiny"
    encoder: TransformerStackConfig = field(default_factory=TransformerStackConfig)
    decoder: TransformerStackConfig = field(default_factory=TransformerStackConfig)

    dropout: float = 0.1
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    activation_fn: str = "gelu"

    max_source_positions: int = 1024
    max_target_positions: int = 1024

    # (reference share_all_embeddings / share_decoder_input_output_embed
    # deleted: sharing is structural here — ONE global embed_tokens serves
    # every adaptor, and the text adaptor's tied output projection is its
    # own knob, adaptor/text.py share_input_output_embed)
    no_scale_embedding: bool = True
    layernorm_embedding: bool = True
    add_type_embedding: bool = True
    entangle_position_embedding: bool = False

    attn_scale_factor: float = 2.0
    scale_attn: bool = True
    scale_fc: bool = True
    scale_heads: bool = True
    scale_resids: bool = False

    use_self_attn_bias: bool = True
    share_attn_bias: bool = False
    modal_ffn: bool = False

    encode_drop_path_rate: float = 0.0
    decode_drop_path_rate: float = 0.0

    # TPU execution knobs (no reference counterpart)
    use_flash_attention: bool = True   # Pallas kernel when on TPU and shapes allow
    # LayerNorm implementation for the transformer stacks:
    #   'xla'    — nn.LayerNorm, fully compiler-fused both directions
    #   'hybrid' — XLA-fusable forward + one-pass Pallas backward
    #   'pallas' — Pallas forward AND backward (loses the in-context A/B;
    #              kept for odd stacks where XLA fusion is unavailable)
    ln_impl: str = "xla"
    # dtype of the materialized (B,H,T,T) attention scores on the XLA path:
    #   'compute' — store scores in the compute dtype; softmax math stays
    #               fp32 over the rounded values. Matches the torch
    #               reference under fp16 (bmm half, softmax(dtype=float32),
    #               multihead_attention.py:334-349) and halves score HBM
    #               traffic: measured 1488 vs 1362 samples/s on the mixed
    #               bench (+9.3%). No-op under fp32 compute.
    #   'fp32'    — full-precision scores end to end.
    attn_logits: str = "compute"
    # fuse the q/k/v projections into ONE GEMM (self-attention 3-way; cross
    # attention fuses k/v). Parameter layout is unchanged (three kernels
    # concatenated at compute time — the concat is loop-invariant, so XLA
    # hoists it out of decode loops): the input activation is read once
    # instead of three times, and decode steps issue one projection GEMV
    # instead of three. Falls back automatically under int8 serving/
    # quantized training (those paths need per-kernel scales). Measured on
    # the mixed bench: 1496 vs 1476 samples/s (+1.4%, 45.0% MFU).
    fuse_qkv: bool = True
    # q/k/v memory layout through the dense (XLA) attention path:
    #   'bthd' — (B,T,H,D), the projection GEMMs' natural reshape; XLA's
    #            layout assignment inserts its own copies around the score
    #            matmuls (~11ms/update on the mixed bench profile)
    #   'bhtd' — transpose to the batched-matmul-native (B,H,T,D) right at
    #            the projections (and back before out_proj) so the layout
    #            change sits where XLA can fuse it into the GEMM epilogues.
    #            Measured on the 5-task mixed bench: 1538 vs 1508 samples/s
    #            (+2.0%, 44.6% MFU). Gated to batch*rows >= 256 per call —
    #            B=1 serving encoders measured ~2-3ms slower transposed.
    # Numerically identical (same contractions, same accumulation dtype).
    attn_layout: str = "bhtd"
    # short-sequence fused attention (ops/pallas_dense_attention.py): whole-T
    # Pallas kernel with rank-4 (B,T,H,D) IO — scores never round-trip HBM,
    # no XLA layout copies around the score matmuls, one fused backward
    # producing dq/dk/dv + batch-accumulated dbias.
    #   'auto'   — use it on TPU when gates pass (training-shape calls,
    #              dropout 0, batch-shared bias, padding-only masks);
    #              XLA dense path otherwise
    #   'xla'    — never (the previous behavior)
    #   'pallas' — same gates as auto but also in interpret mode off-TPU
    #              (tests)
    attn_kernel: str = "auto"
    remat: str = "none"                # 'none' | 'full' | 'dots' — per-layer jax.checkpoint
                                       # ('dots' saves matmul results only; elementwise
                                       # chains recompute in the backward)
    scan_layers: bool = False          # lax.scan over stacked layer params
    # Mixture-of-experts FFN (reference module/base_layer.py BaseLayer —
    # there a separate expert layer per DP rank inserted between blocks;
    # here the Switch-style TPU redesign: every moe_every_n-th layer's FFN
    # becomes top-1-routed experts sharded over the mesh 'expert' axis,
    # all_to_all dispatch, parallel/moe.py). 0 = off.
    moe_experts: int = 0
    moe_every_n: int = 2               # every Nth layer is MoE (1-based)
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01       # load-balance aux loss weight/token
    # GPipe pipeline over the 'pipe' mesh axis (parallel/pipeline.py);
    # requires scan_layers (stacked layout) and layers %% stages == 0
    pipeline_stages: int = 1
    pipeline_microbatches: int = 0     # 0 -> = pipeline_stages
    # context parallelism: route training self-attention through ring
    # attention over the 'sequence' mesh axis (parallel/ring_attention.py);
    # needs the device mesh at initialize() and T divisible by the axis size
    sequence_parallel: bool = False
    # int8 serving (ops/quant.py): matmul mode used when the variables
    # passed to apply/generate carry a 'qkern' collection (the output of
    # quantize_for_serving). 'w8a8' contracts on the int8 MXU (~2x bf16
    # peak, dynamic per-row activation quant); 'w8' dequantizes to the
    # compute dtype instead. Inert during training / without qkern.
    quant_mode: str = "w8a8"
    # int8 quantized TRAINING (beyond-reference experiment; ops/quant.py
    # int8_train_matmul): 'none' (default) or 'fwd' — the transformer
    # stacks' forward projections contract on the int8 MXU (~2x bf16 rate;
    # dynamic per-row activation scales, per-out-channel weight scales from
    # the live fp32 params) with a straight-through bf16/fp32 backward.
    # Training-only: eval and generation always run the exact bf16 path.
    quant_training: str = "none"

    def __post_init__(self):
        # apply the arch preset only when the stacks are untouched defaults —
        # a deserialized config (from_dict) must keep its explicit dims
        if self.arch and self.encoder == TransformerStackConfig() and self.decoder == TransformerStackConfig():
            apply_arch(self, self.arch)


_ARCH_TABLE = {
    # name: (embed_dim, ffn_dim, enc_layers, dec_layers, heads)
    "tiny": (256, 4 * 256, 4, 4, 4),
    "medium": (512, 4 * 512, 4, 4, 8),
    "base": (768, 4 * 768, 6, 6, 12),
    "large": (1024, 4 * 1024, 12, 12, 16),
    "huge": (1280, 4 * 1280, 24, 12, 16),
    "asr_small": (256, 2048, 12, 6, 4),
    "asr_base": (768, 4 * 768, 12, 6, 12),
    "6b": (2560, 4 * 2560, 36, 24, 32),
    "8b": (2560, 4 * 2560, 48, 36, 32),
    "10b": (2816, 4 * 2816, 48, 36, 32),
}


def apply_arch(cfg: GeneralistModelConfig, arch: str):
    if arch not in _ARCH_TABLE:
        raise ValueError(f"unknown arch {arch!r}; available: {sorted(_ARCH_TABLE)}")
    dim, ffn, enc_l, dec_l, heads = _ARCH_TABLE[arch]
    cfg.arch = arch
    cfg.encoder.embed_dim = cfg.decoder.embed_dim = dim
    cfg.encoder.ffn_embed_dim = cfg.decoder.ffn_embed_dim = ffn
    cfg.encoder.layers = enc_l
    cfg.decoder.layers = dec_l
    cfg.encoder.attention_heads = cfg.decoder.attention_heads = heads
    return cfg
