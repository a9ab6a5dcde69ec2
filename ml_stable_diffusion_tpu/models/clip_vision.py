"""CLIP vision encoder (transformers CLIPVisionModelWithProjection analog).

The IP-Adapter reference-image encoder.  The tower implementation is shared
with the safety checker (models/safety.py wraps the same ViT with concept
banks); this module exposes the raw projected ``image_embeds`` the adapter
consumes (UNNORMALIZED — IP-Adapter projects the raw embedding, unlike the
safety checker's cosine-space use).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from .safety import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD, _VisionLayer
from .safety import SafetyCheckerConfig as _TowerConfig


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    projection_dim: int = 1024
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_diffusers(cls, raw: dict) -> "CLIPVisionConfig":
        return cls(
            image_size=raw.get("image_size", 224),
            patch_size=raw.get("patch_size", 14),
            hidden_size=raw.get("hidden_size", 1024),
            intermediate_size=raw.get("intermediate_size", 4096),
            num_hidden_layers=raw.get("num_hidden_layers", 24),
            num_attention_heads=raw.get("num_attention_heads", 16),
            projection_dim=raw.get("projection_dim", 1024),
        )

    def _tower(self) -> _TowerConfig:
        return _TowerConfig(
            image_size=self.image_size, patch_size=self.patch_size,
            hidden_size=self.hidden_size,
            intermediate_size=self.intermediate_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            projection_dim=self.projection_dim,
            layer_norm_eps=self.layer_norm_eps)


class CLIPVisionEncoder(nn.Module):
    """Input: images (B, S, S, 3) in [0, 1] NHWC.  Output dict:
    ``image_embeds`` (B, projection_dim) raw projected embedding,
    ``pooled_output`` (B, hidden) post-LN CLS state, ``penultimate``
    (B, tokens, hidden) second-to-last hidden states (ip-adapter-plus
    consumes these)."""

    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        cfg = self.config
        tower = cfg._tower()
        x = (images - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
        x = x.astype(self.dtype)
        patches = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          use_bias=False, dtype=self.dtype,
                          name="patch_embedding")(x)
        B = patches.shape[0]
        S = (cfg.image_size // cfg.patch_size) ** 2
        patches = patches.reshape(B, S, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, cfg.hidden_size)).astype(self.dtype),
             patches], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (S + 1, cfg.hidden_size))
        h = h + pos[None].astype(self.dtype)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="pre_layernorm")(h)
        penultimate = None
        for i in range(cfg.num_hidden_layers):
            if i == cfg.num_hidden_layers - 1:
                penultimate = h
            h = _VisionLayer(tower, dtype=self.dtype, name=f"layers_{i}")(h)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="post_layernorm")(h[:, 0])
        embeds = nn.Dense(cfg.projection_dim, use_bias=False,
                          dtype=self.dtype, name="visual_projection")(pooled)
        return {"image_embeds": embeds, "pooled_output": pooled,
                "penultimate": penultimate}
