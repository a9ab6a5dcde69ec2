from .bpe import CLIPTokenizer

__all__ = ["CLIPTokenizer"]
