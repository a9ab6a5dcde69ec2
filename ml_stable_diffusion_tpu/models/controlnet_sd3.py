"""SD3 ControlNet — MMDiT-style control branch (beyond the reference).

The reference supports ControlNet only for the UNet families
(controlnet.py:49-250, ControlNet.swift); SD3 control is absent there.  This
follows the ecosystem SD3 design (diffusers SD3ControlNetModel): a truncated
stack of joint transformer blocks sharing the MMDiT stem, whose conditioning
image enters as VAE-encoded LATENTS through a zero-initialized patch
embedding, and whose per-block hidden states pass through zero-initialized
linear projections to become residuals added to the main MMDiT's latent
stream (block ``i`` of the MMDiT consumes residual ``i // interval`` where
``interval = mmdit_depth // controlnet_depth``).

Interface parity with ``models/controlnet.py``: ``__call__`` returns
``(block_residuals, None)`` so the pipelines' multi-net accumulation and CFG
duplication treat both families uniformly (mid residual unused here).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from .mmdit import JointTransformerBlock, MMDiTConfig
from .unet import TimestepEmbedding, get_timestep_embedding


@dataclasses.dataclass(frozen=True)
class SD3ControlNetConfig:
    """MMDiT geometry + control-branch depth.

    ``mmdit`` carries the per-block geometry (hidden size, heads, context
    dims) shared with the paired MMDiT.  Note ``mmdit.depth`` here is the
    CONTROL BRANCH depth (== ``num_layers``) when built from a diffusers
    controlnet config.json, NOT the paired MMDiT's depth — no code reads it;
    the block count used everywhere is ``num_layers``."""

    mmdit: MMDiTConfig = MMDiTConfig()
    #: number of joint blocks in the control branch (e.g. 12 for the
    #: published SD3-medium canny/pose/tile nets vs the MMDiT's 24)
    num_layers: int = 12
    #: InstantX-trained SD3 nets (config force_zeros_for_pooled_projection
    #: true) are run with ZEROED pooled text projections and control latents
    #: encoded WITHOUT the VAE shift factor; SD3.5-family nets (false) take
    #: the real pooled embedding and ``(x - shift) * scale`` control latents
    #: (ecosystem StableDiffusion3ControlNetPipeline conventions).
    force_zeros_for_pooled_projection: bool = True

    @classmethod
    def sd3_medium(cls, num_layers: int = 12) -> "SD3ControlNetConfig":
        return cls(mmdit=MMDiTConfig.sd3_medium(), num_layers=num_layers)


class SD3ControlNetModel(nn.Module):
    """Inputs: latents (B, H, W, C), timestep (B,), context (B, S, ctx_dim),
    pooled (B, pooled_dim), cond_latents (B, H, W, C) — the VAE-encoded
    control image.  Output: (tuple of (B, hp*wp, D) residuals, None)."""

    config: SD3ControlNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents, timesteps, context, pooled, cond_latents,
                 conditioning_scale: float = 1.0):
        cfg = self.config.mmdit
        P = cfg.patch_size
        D = cfg.hidden_size
        B, H, W, _ = latents.shape
        hp, wp = H // P, W // P
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (B,))

        latents = latents.astype(self.dtype)
        context = context.astype(self.dtype)

        # shared MMDiT stem: patchify + cropped positional table
        x = nn.Conv(D, (P, P), strides=(P, P), dtype=self.dtype,
                    name="patch_proj")(latents)
        x = x.reshape(B, hp * wp, D)
        M = cfg.pos_embed_max_size
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (M, M, D))
        top, left = (M - hp) // 2, (M - wp) // 2
        x = x + pos[top:top + hp, left:left + wp].reshape(
            1, hp * wp, D).astype(self.dtype)

        # conditioning latents enter through a ZERO patch embedding (the SD3
        # analog of the UNet ControlNet's zero convs: at init the branch sees
        # no control signal and its residuals are exactly zero)
        cx = nn.Conv(D, (P, P), strides=(P, P), dtype=self.dtype,
                     kernel_init=nn.initializers.zeros,
                     name="patch_proj_input")(cond_latents.astype(self.dtype))
        x = x + cx.reshape(B, hp * wp, D)

        t_emb = get_timestep_embedding(timesteps, 256, flip_sin_to_cos=True,
                                       freq_shift=0)
        c = TimestepEmbedding(D, dtype=self.dtype, name="timestep_embedder")(
            t_emb.astype(self.dtype))
        c = c + TimestepEmbedding(D, dtype=self.dtype, name="text_embedder")(
            pooled.astype(self.dtype))
        ctx = nn.Dense(D, dtype=self.dtype, name="context_embedder")(context)

        residuals = []
        for i in range(self.config.num_layers):
            x, ctx = JointTransformerBlock(
                cfg, context_pre_only=False, dtype=self.dtype,
                name=f"blocks_{i}")(x, ctx, c)
            # zero-initialized per-block projection (controlnet_blocks.{i})
            z = nn.Dense(D, kernel_init=nn.initializers.zeros,
                         dtype=self.dtype, name=f"controlnet_blocks_{i}")(x)
            residuals.append(conditioning_scale * z.astype(jnp.float32))
        return tuple(residuals), None
