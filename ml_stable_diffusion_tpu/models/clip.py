"""CLIP text encoder (Flax).

TPU-native replacement for the reference's converted CLIP text encoders
(torch2coreml.py convert_text_encoder :379-498).  Capability parity:

- penultimate-hidden-layer tap for SDXL (torch2coreml.py:416-428 hooks layer
  -2; exposed here as ``hidden_states`` + ``penultimate_hidden_state``),
- pooled output for XL micro-conditioning (torch2coreml.py:439-441),
- -1e4 causal mask (patched_make_causal_mask torch2coreml.py:363-377),
- quick_gelu (SD1.x ViT-L) vs gelu (SD2 ViT-H / SDXL bigG) activation.

Layout is standard (B, S, C) — the reference's BC1S/conv-as-linear layout is
an ANE idiom and deliberately not reproduced (SURVEY.md section 7).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 23
    num_attention_heads: int = 16
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"  # "quick_gelu" for SD1.x ViT-L
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    #: output a projected pooled vector (SDXL text encoder 2 / bigG)
    use_text_projection: bool = False
    projection_dim: int = 1280

    @classmethod
    def sd1(cls) -> "CLIPTextConfig":
        """openai/clip-vit-large-patch14 (SD 1.x)."""
        return cls(hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
                   num_attention_heads=12, hidden_act="quick_gelu")

    @classmethod
    def sd2(cls) -> "CLIPTextConfig":
        """OpenCLIP ViT-H trimmed to 23 layers (SD 2.x checkpoints ship 23)."""
        return cls()

    @classmethod
    def sdxl_g(cls) -> "CLIPTextConfig":
        """OpenCLIP bigG (SDXL text encoder 2)."""
        return cls(hidden_size=1280, intermediate_size=5120, num_hidden_layers=32,
                   num_attention_heads=20, use_text_projection=True,
                   projection_dim=1280)


def _activation(name: str):
    from ..ops.activations import gelu_erf, quick_gelu

    if name == "quick_gelu":
        return quick_gelu
    if name == "gelu":
        return gelu_erf
    raise ValueError(f"unknown activation {name!r}")


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        H = cfg.num_attention_heads
        D = cfg.hidden_size // H

        residual = x
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ln1")(x)
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(y)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(y)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(y)
        B, S, _ = y.shape
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, H, D)
        v = v.reshape(B, S, H, D)
        attn = dot_product_attention(q, k, v, causal=True, impl="xla")
        attn = attn.reshape(B, S, cfg.hidden_size)
        x = residual + nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(attn)

        residual = x
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ln2")(x)
        y = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(y)
        y = _activation(cfg.hidden_act)(y)
        y = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(y)
        return residual + y


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.max_position_embeddings, cfg.hidden_size))
        x = x + pos[None, : x.shape[1]].astype(self.dtype)

        hidden_states = []
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
            hidden_states.append(x)

        last = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="final_layer_norm")(x)

        # pooled = hidden state at the first EOS position (transformers CLIP
        # semantics; the reference exports it as pooled_outputs,
        # torch2coreml.py:439-441)
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=1)
        pooled = jnp.take_along_axis(last, eos_pos[:, None, None], axis=1)[:, 0]
        if cfg.use_text_projection:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False,
                              dtype=self.dtype, name="text_projection")(pooled)

        return {
            "last_hidden_state": last,
            "hidden_states": tuple(hidden_states),
            # layer -2 pre-final-LN tap used by SDXL (torch2coreml.py:416-428)
            "penultimate_hidden_state": hidden_states[-2] if cfg.num_hidden_layers > 1 else x,
            "pooled_output": pooled,
        }
