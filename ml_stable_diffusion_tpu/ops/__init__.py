from .attention import dot_product_attention, AttentionImpl

__all__ = ["dot_product_attention", "AttentionImpl"]
