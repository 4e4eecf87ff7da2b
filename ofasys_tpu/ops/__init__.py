from ofasys_tpu.ops.attention import causal_mask, combine_masks, dot_product_attention

__all__ = ["dot_product_attention", "causal_mask", "combine_masks"]
