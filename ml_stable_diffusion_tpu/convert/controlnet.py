"""ControlNet weight porting: diffusers ControlNetModel -> Flax params."""

from __future__ import annotations

from ..models.unet import UNetConfig
from .unet import _conv, _dense, _norm, _resnet, _spatial_transformer


def port_controlnet(state_dict, config: UNetConfig) -> dict:
    sd = dict(state_dict)
    p: dict = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _dense(sd, "time_embedding.linear_1"),
            "linear_2": _dense(sd, "time_embedding.linear_2"),
        },
    }

    if config.addition_embed_type == "text_time":
        p["add_embedding"] = {
            "linear_1": _dense(sd, "add_embedding.linear_1"),
            "linear_2": _dense(sd, "add_embedding.linear_2"),
        }

    cond = {"conv_in": _conv(sd, "controlnet_cond_embedding.conv_in"),
            "conv_out": _conv(sd, "controlnet_cond_embedding.conv_out")}
    bi = 0
    while f"controlnet_cond_embedding.blocks.{bi}.weight" in sd:
        cond[f"blocks_{bi}"] = _conv(sd, f"controlnet_cond_embedding.blocks.{bi}")
        bi += 1
    p["controlnet_cond_embedding"] = cond

    n_blocks = len(config.block_out_channels)
    for bi, btype in enumerate(config.down_block_types):
        for li in range(config.layers_per_block):
            p[f"down_blocks_{bi}_resnets_{li}"] = _resnet(
                sd, f"down_blocks.{bi}.resnets.{li}")
            if btype == "CrossAttnDownBlock2D":
                p[f"down_blocks_{bi}_attentions_{li}"] = _spatial_transformer(
                    sd, f"down_blocks.{bi}.attentions.{li}",
                    config.transformer_layers_per_block[bi])
        if bi < n_blocks - 1:
            p[f"down_blocks_{bi}_downsamplers_0"] = {
                "conv": _conv(sd, f"down_blocks.{bi}.downsamplers.0.conv")}

    p["mid_block_resnets_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_block_resnets_1"] = _resnet(sd, "mid_block.resnets.1")
    p["mid_block_attentions_0"] = _spatial_transformer(
        sd, "mid_block.attentions.0", config.transformer_layers_per_block[-1])

    i = 0
    while f"controlnet_down_blocks.{i}.weight" in sd:
        p[f"controlnet_down_blocks_{i}"] = _conv(sd, f"controlnet_down_blocks.{i}")
        i += 1
    p["controlnet_mid_block"] = _conv(sd, "controlnet_mid_block")
    return p
