"""MMDiT — multimodal diffusion transformer for SD3 (Flax, TPU-native).

The reference converts SD3's MMDiT via the external DiffusionKit package
(torch2coreml.py convert_mmdit :1053-1117) and wraps it in Swift
(MultiModalDiffusionTransformer.swift:90-97: latent_image_embeddings /
timestep / token_level_text_embeddings / pooled_text_embeddings).  This is a
from-scratch implementation of the architecture (Esser et al. 2024,
"Scaling Rectified Flow Transformers"), dimensioned by config to cover
SD3-medium and SD3.5 (qk RMSNorm).

Parameter naming mirrors the HF-diffusers SD3Transformer2DModel layout for
mechanical weight porting (convert/mmdit.py).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from ..ops.activations import gelu_tanh
from ..ops.attention import joint_dot_product_attention
from .unet import TimestepEmbedding, get_timestep_embedding


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    depth: int = 24
    hidden_size: int = 1536  # = 64 * depth for SD3-medium
    num_heads: int = 24
    context_dim: int = 4096  # CLIP-L + CLIP-G + T5 concat
    pooled_dim: int = 2048
    pos_embed_max_size: int = 192
    #: SD3.5 uses RMS qk-normalization
    qk_norm: bool = False

    @classmethod
    def sd3_medium(cls) -> "MMDiTConfig":
        return cls()

    @classmethod
    def sd35_large(cls) -> "MMDiTConfig":
        return cls(depth=38, hidden_size=2432, num_heads=38, qk_norm=True)


class _RMSNorm(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        normed = (x.astype(jnp.float32) * (var + 1e-6) ** -0.5).astype(x.dtype)
        return normed * scale.astype(x.dtype)


def _modulate(x, shift, scale):
    return x * (1 + scale[:, None]) + shift[:, None]


class JointTransformerBlock(nn.Module):
    """Dual-stream block with joint attention and adaLN-Zero modulation."""

    config: MMDiTConfig
    context_pre_only: bool = False  # final block: context stream ends
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, c):
        cfg = self.config
        D = cfg.hidden_size
        H = cfg.num_heads
        Dh = D // H

        # adaLN parameters from the conditioning vector
        mod_x = nn.Dense(6 * D, dtype=self.dtype, name="norm1_linear")(nn.silu(c))
        (sh1, sc1, g1, sh2, sc2, g2) = jnp.split(mod_x, 6, axis=-1)
        if self.context_pre_only:
            # AdaLayerNormContinuous convention: [scale, shift]
            mod_c = nn.Dense(2 * D, dtype=self.dtype, name="norm1_context_linear")(
                nn.silu(c))
            csc1, csh1 = jnp.split(mod_c, 2, axis=-1)
            cg1 = csh2 = csc2 = cg2 = None
        else:
            mod_c = nn.Dense(6 * D, dtype=self.dtype, name="norm1_context_linear")(
                nn.silu(c))
            (csh1, csc1, cg1, csh2, csc2, cg2) = jnp.split(mod_c, 6, axis=-1)

        ln = lambda name: nn.LayerNorm(use_bias=False, use_scale=False,
                                       epsilon=1e-6, dtype=self.dtype, name=name)

        xm = _modulate(ln("norm1")(x), sh1, sc1)
        cm = _modulate(ln("norm1_context")(ctx), csh1, csc1)

        B, Nx, _ = xm.shape
        Nc = cm.shape[1]
        q_x = nn.Dense(D, dtype=self.dtype, name="to_q")(xm).reshape(B, Nx, H, Dh)
        k_x = nn.Dense(D, dtype=self.dtype, name="to_k")(xm).reshape(B, Nx, H, Dh)
        v_x = nn.Dense(D, dtype=self.dtype, name="to_v")(xm).reshape(B, Nx, H, Dh)
        q_c = nn.Dense(D, dtype=self.dtype, name="add_q_proj")(cm).reshape(B, Nc, H, Dh)
        k_c = nn.Dense(D, dtype=self.dtype, name="add_k_proj")(cm).reshape(B, Nc, H, Dh)
        v_c = nn.Dense(D, dtype=self.dtype, name="add_v_proj")(cm).reshape(B, Nc, H, Dh)

        if cfg.qk_norm:
            q_x = _RMSNorm(Dh, dtype=self.dtype, name="norm_q")(q_x)
            k_x = _RMSNorm(Dh, dtype=self.dtype, name="norm_k")(k_x)
            q_c = _RMSNorm(Dh, dtype=self.dtype, name="norm_added_q")(q_c)
            k_c = _RMSNorm(Dh, dtype=self.dtype, name="norm_added_k")(k_c)

        # joint attention over [latent, context] (MMDiT paper fig. 2) — the
        # latent and context query streams share one packed KV; keeping the
        # streams separate lets the flash path tile the 4096-row latent axis
        # exactly instead of padding the ragged 4250-row concat (see
        # ops/attention.joint_dot_product_attention)
        k = jnp.concatenate([k_x, k_c], axis=1)
        v = jnp.concatenate([v_x, v_c], axis=1)
        attn_x, attn_c = joint_dot_product_attention([q_x, q_c], k, v)
        attn_x = attn_x.reshape(B, Nx, D)
        attn_c = attn_c.reshape(B, Nc, D)

        x = x + g1[:, None] * nn.Dense(D, dtype=self.dtype, name="to_out_0")(attn_x)
        xm2 = _modulate(ln("norm2")(x), sh2, sc2)
        h = nn.Dense(4 * D, dtype=self.dtype, name="ff_proj")(xm2)
        h = gelu_tanh(h)
        x = x + g2[:, None] * nn.Dense(D, dtype=self.dtype, name="ff_out")(h)

        if self.context_pre_only:
            return x, ctx
        ctx = ctx + cg1[:, None] * nn.Dense(D, dtype=self.dtype,
                                            name="to_add_out")(attn_c)
        cm2 = _modulate(ln("norm2_context")(ctx), csh2, csc2)
        hc = nn.Dense(4 * D, dtype=self.dtype, name="ff_context_proj")(cm2)
        hc = gelu_tanh(hc)
        ctx = ctx + cg2[:, None] * nn.Dense(D, dtype=self.dtype,
                                            name="ff_context_out")(hc)
        return x, ctx


class MMDiT(nn.Module):
    """Inputs: latents (B, H, W, C), timestep (B,) float (sigma*1000),
    context (B, S, context_dim), pooled (B, pooled_dim).
    Output: velocity prediction (B, H, W, out_channels)."""

    config: MMDiTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents, timesteps, context, pooled,
                 controlnet_residuals=None):
        cfg = self.config
        P = cfg.patch_size
        D = cfg.hidden_size
        B, H, W, C = latents.shape
        hp, wp = H // P, W // P
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (B,))

        latents = latents.astype(self.dtype)
        context = context.astype(self.dtype)

        # patchify
        x = nn.Conv(D, (P, P), strides=(P, P), dtype=self.dtype,
                    name="patch_proj")(latents)
        x = x.reshape(B, hp * wp, D)

        # center-cropped learned positional table (SD3 cropped pos embed)
        M = cfg.pos_embed_max_size
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (M, M, D))
        top, left = (M - hp) // 2, (M - wp) // 2
        x = x + pos[top:top + hp, left:left + wp].reshape(
            1, hp * wp, D).astype(self.dtype)

        # conditioning vector: timestep + pooled text
        t_emb = get_timestep_embedding(timesteps, 256, flip_sin_to_cos=True,
                                       freq_shift=0)
        c = TimestepEmbedding(D, dtype=self.dtype, name="timestep_embedder")(
            t_emb.astype(self.dtype))
        c = c + TimestepEmbedding(D, dtype=self.dtype, name="text_embedder")(
            pooled.astype(self.dtype))

        ctx = nn.Dense(D, dtype=self.dtype, name="context_embedder")(context)

        for i in range(cfg.depth):
            context_pre_only = i == cfg.depth - 1
            x, ctx = JointTransformerBlock(
                cfg, context_pre_only=context_pre_only, dtype=self.dtype,
                name=f"blocks_{i}")(x, ctx, c)
            if controlnet_residuals and not context_pre_only:
                # SD3 ControlNet: block i consumes residual i // interval with
                # interval = ceil(depth / n) and no add on the final
                # context_pre_only block (ecosystem SD3Transformer2DModel
                # scheme; handles non-divisor residual counts, e.g. the
                # 18-layer controlnet against the 24-deep medium MMDiT).
                n = len(controlnet_residuals)
                interval = -(-cfg.depth // n)  # ceil
                x = x + controlnet_residuals[i // interval].astype(x.dtype)

        # final adaLN + projection (AdaLayerNormContinuous: [scale, shift])
        mod = nn.Dense(2 * D, dtype=self.dtype, name="norm_out_linear")(nn.silu(c))
        scale, shift = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=self.dtype, name="norm_out")(x)
        x = _modulate(x, shift, scale)
        x = nn.Dense(P * P * cfg.out_channels, dtype=self.dtype,
                     name="proj_out")(x)

        # unpatchify
        x = x.reshape(B, hp, wp, P, P, cfg.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, cfg.out_channels)
        return x.astype(jnp.float32)
