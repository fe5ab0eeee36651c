from lam_slide_tpu.ops.attention import dot_product_attention, linear_attention

__all__ = ["dot_product_attention", "linear_attention"]
