"""ControlNet (Flax, NHWC).

TPU-native equivalent of the reference's ANE ControlNet (controlnet.py:15-250
+ Swift executor ControlNet.swift): the UNet's down+mid stack with zero-conv
projections, producing one residual per UNet skip connection plus a mid
residual (get_num_residuals, controlnet.py:191-197).  Multi-ControlNet
summation happens in the pipeline (pipeline.py:276-280).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .unet import (
    Downsample2D,
    ResnetBlock2D,
    SpatialTransformer,
    TimestepEmbedding,
    UNetConfig,
    get_timestep_embedding,
)


class ControlNetConditioningEmbedding(nn.Module):
    """RGB conditioning image -> latent-resolution feature map
    (reference ControlNetConditioningEmbedding controlnet.py:15-46)."""

    out_channels: int
    block_channels: tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):
        h = nn.Conv(self.block_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(cond)
        h = nn.silu(h)
        for i in range(len(self.block_channels) - 1):
            h = nn.Conv(self.block_channels[i], (3, 3), padding=1,
                        dtype=self.dtype, name=f"blocks_{2 * i}")(h)
            h = nn.silu(h)
            h = nn.Conv(self.block_channels[i + 1], (3, 3), strides=(2, 2),
                        padding=1, dtype=self.dtype, name=f"blocks_{2 * i + 1}")(h)
            h = nn.silu(h)
        # zero-initialized output conv (trained weights are loaded over this)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="conv_out")(h)


class ControlNetModel(nn.Module):
    """Returns (down_residuals tuple, mid_residual), both scaled by
    ``conditioning_scale``."""

    config: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states, cond_image,
                 conditioning_scale: float = 1.0, added_cond=None):
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        t_emb = get_timestep_embedding(timesteps, cfg.block_out_channels[0],
                                       cfg.flip_sin_to_cos, cfg.freq_shift)
        emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                name="time_embedding")(t_emb.astype(self.dtype))
        if cfg.addition_embed_type == "text_time":
            # SDXL-family ControlNets carry the UNet's micro-conditioning
            # embedding (diffusers ControlNetModel addition_embed_type)
            assert added_cond is not None, "SDXL ControlNet needs added_cond"
            time_ids = added_cond["time_ids"].reshape(-1)
            id_emb = get_timestep_embedding(
                time_ids, cfg.addition_time_embed_dim, cfg.flip_sin_to_cos,
                cfg.freq_shift)
            id_emb = id_emb.reshape(sample.shape[0], -1)
            add = jnp.concatenate(
                [added_cond["text_embeds"].astype(jnp.float32), id_emb],
                axis=-1)
            emb = emb + TimestepEmbedding(
                cfg.time_embed_dim, dtype=self.dtype,
                name="add_embedding")(add.astype(self.dtype))

        sample = sample.astype(self.dtype)
        encoder_hidden_states = encoder_hidden_states.astype(self.dtype)

        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(sample)
        h = h + ControlNetConditioningEmbedding(
            cfg.block_out_channels[0], dtype=self.dtype,
            name="controlnet_cond_embedding")(cond_image.astype(self.dtype))

        residuals = [h]
        for bi, btype in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[bi]
            is_final = bi == len(cfg.down_block_types) - 1
            for li in range(cfg.layers_per_block):
                h = ResnetBlock2D(out_ch, cfg.norm_num_groups, cfg.norm_eps,
                                  dtype=self.dtype,
                                  name=f"down_blocks_{bi}_resnets_{li}")(h, emb)
                if btype == "CrossAttnDownBlock2D":
                    h = SpatialTransformer(
                        out_ch, cfg.num_attention_heads[bi],
                        cfg.transformer_layers_per_block[bi],
                        cfg.cross_attention_dim, cfg.norm_num_groups,
                        dtype=self.dtype,
                        name=f"down_blocks_{bi}_attentions_{li}")(h, encoder_hidden_states)
                residuals.append(h)
            if not is_final:
                h = Downsample2D(out_ch, dtype=self.dtype,
                                 name=f"down_blocks_{bi}_downsamplers_0")(h)
                residuals.append(h)

        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, cfg.norm_eps,
                          dtype=self.dtype, name="mid_block_resnets_0")(h, emb)
        h = SpatialTransformer(mid_ch, cfg.num_attention_heads[-1],
                               cfg.transformer_layers_per_block[-1],
                               cfg.cross_attention_dim, cfg.norm_num_groups,
                               dtype=self.dtype,
                               name="mid_block_attentions_0")(h, encoder_hidden_states)
        h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, cfg.norm_eps,
                          dtype=self.dtype, name="mid_block_resnets_1")(h, emb)

        # zero convs (one per skip residual, controlnet.py:131-189)
        down_out = []
        for i, r in enumerate(residuals):
            z = nn.Conv(r.shape[-1], (1, 1), dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        name=f"controlnet_down_blocks_{i}")(r)
            down_out.append(conditioning_scale * z.astype(jnp.float32))
        mid = nn.Conv(h.shape[-1], (1, 1), dtype=self.dtype,
                      kernel_init=nn.initializers.zeros,
                      name="controlnet_mid_block")(h)
        return tuple(down_out), conditioning_scale * mid.astype(jnp.float32)
