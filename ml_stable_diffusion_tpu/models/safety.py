"""Safety checker (CLIP-vision based), Flax NHWC.

TPU-native equivalent of the reference's converted StableDiffusionSafetyChecker
(torch2coreml.py convert_safety_checker :1119-1316, vectorized forward
:1177-1209; Swift SafetyChecker.swift).  Architecture: CLIP ViT image encoder
-> visual projection -> cosine distances against learned "concept" and
"special-care" embedding banks -> per-image NSFW flag.

The decision rule matches the reference exactly (SafetyChecker.swift:92-98 /
HF safety_checker.py semantics): cos_dist - threshold + adjustment > 0 for
any concept flags the image; special-care hits tighten the adjustment.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention

#: CLIP image normalization (reference SafetyChecker.swift:145-147)
CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class SafetyCheckerConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    projection_dim: int = 768
    num_concepts: int = 17
    num_special_care: int = 3
    layer_norm_eps: float = 1e-5


class _VisionLayer(nn.Module):
    config: SafetyCheckerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        H = cfg.num_attention_heads
        D = cfg.hidden_size // H
        residual = x
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ln1")(x)
        B, S, _ = y.shape
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(y).reshape(B, S, H, D)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(y).reshape(B, S, H, D)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(y).reshape(B, S, H, D)
        attn = dot_product_attention(q, k, v, impl="xla").reshape(B, S, cfg.hidden_size)
        x = residual + nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(attn)
        residual = x
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ln2")(x)
        y = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(y)
        y = y * nn.sigmoid(1.702 * y)  # quick_gelu (CLIP ViT)
        y = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(y)
        return residual + y


class SafetyChecker(nn.Module):
    """Input: images (B, 224, 224, 3) in [0, 1].  Output: dict with
    ``has_nsfw`` (B,) bool plus the raw score tensors."""

    config: SafetyCheckerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, adjustment: float = 0.0):
        cfg = self.config
        x = (images - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
        x = x.astype(self.dtype)

        # ViT patch embedding
        patches = nn.Conv(cfg.hidden_size,
                          (cfg.patch_size, cfg.patch_size),
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
        for i in range(cfg.num_hidden_layers):
            h = _VisionLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(h)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="post_layernorm")(h[:, 0])
        embeds = nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                          name="visual_projection")(pooled)
        embeds = embeds / jnp.linalg.norm(embeds.astype(jnp.float32),
                                          axis=-1, keepdims=True)

        concepts = self.param("concept_embeds", nn.initializers.normal(0.02),
                              (cfg.num_concepts, cfg.projection_dim))
        concept_thresh = self.param("concept_embeds_weights",
                                    nn.initializers.zeros, (cfg.num_concepts,))
        special = self.param("special_care_embeds",
                             nn.initializers.normal(0.02),
                             (cfg.num_special_care, cfg.projection_dim))
        special_thresh = self.param("special_care_embeds_weights",
                                    nn.initializers.zeros,
                                    (cfg.num_special_care,))

        def cos(a, b):
            bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
            return a.astype(jnp.float32) @ bn.astype(jnp.float32).T

        special_scores = cos(embeds, special) - special_thresh + adjustment
        has_special = jnp.any(special_scores > 0, axis=1)
        # special-care hit loosens the concept threshold by 0.01 (HF semantics)
        concept_adj = adjustment + jnp.where(has_special, 0.01, 0.0)[:, None]
        concept_scores = cos(embeds, concepts) - concept_thresh + concept_adj
        has_nsfw = jnp.any(concept_scores > 0, axis=1)
        return {
            "has_nsfw": has_nsfw,
            "concept_scores": concept_scores,
            "special_scores": special_scores,
            # normalized CLIP image embedding — reused by utils/clip_score.py
            "image_embeds": embeds,
        }


def check_images(model: SafetyChecker, params, pil_images,
                 adjustment: float = 0.0):
    """PIL images -> (filtered images, nsfw flags).  Flagged images are
    blacked out (reference pipeline.py:286-311, test expectation
    test_stable_diffusion.py:164-168)."""
    from PIL import Image

    size = model.config.image_size
    batch = np.stack([
        np.asarray(im.resize((size, size), Image.BICUBIC), np.float32) / 255.0
        for im in pil_images])
    out = model.apply({"params": params}, jnp.asarray(batch))
    flags = [bool(f) for f in np.asarray(out["has_nsfw"])]
    filtered = [Image.new("RGB", im.size) if flag else im
                for im, flag in zip(pil_images, flags)]
    return filtered, flags
