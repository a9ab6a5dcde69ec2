from .clip import CLIPTextConfig, CLIPTextEncoder

__all__ = ["CLIPTextConfig", "CLIPTextEncoder"]
