"""VAE weight porting: diffusers AutoencoderKL state dict -> Flax params."""

from __future__ import annotations

from ..models.vae import VAEConfig
from .unet import _conv, _dense, _key, _norm


def _vae_resnet(sd, prefix):
    p = {
        "norm1": _norm(sd, _key(prefix, "norm1")),
        "conv1": _conv(sd, _key(prefix, "conv1")),
        "norm2": _norm(sd, _key(prefix, "norm2")),
        "conv2": _conv(sd, _key(prefix, "conv2")),
    }
    if _key(prefix, "conv_shortcut.weight") in sd:
        p["conv_shortcut"] = _conv(sd, _key(prefix, "conv_shortcut"))
    return p


def _vae_attention(sd, prefix):
    return {
        "group_norm": _norm(sd, _key(prefix, "group_norm")),
        "to_q": _dense(sd, _key(prefix, "to_q")),
        "to_k": _dense(sd, _key(prefix, "to_k")),
        "to_v": _dense(sd, _key(prefix, "to_v")),
        "to_out_0": _dense(sd, _key(prefix, "to_out.0")),
    }


def _mid_block(sd, prefix):
    return {
        "resnets_0": _vae_resnet(sd, _key(prefix, "resnets.0")),
        "attentions_0": _vae_attention(sd, _key(prefix, "attentions.0")),
        "resnets_1": _vae_resnet(sd, _key(prefix, "resnets.1")),
    }


def port_vae_encoder(state_dict, config: VAEConfig) -> dict:
    sd = dict(state_dict)
    p: dict = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "mid_block": _mid_block(sd, "encoder.mid_block"),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
    }
    for bi in range(len(config.block_out_channels)):
        for li in range(config.layers_per_block):
            p[f"down_blocks_{bi}_resnets_{li}"] = _vae_resnet(
                sd, f"encoder.down_blocks.{bi}.resnets.{li}")
        if bi < len(config.block_out_channels) - 1:
            p[f"down_blocks_{bi}_downsamplers_0_conv"] = _conv(
                sd, f"encoder.down_blocks.{bi}.downsamplers.0.conv")
    if config.use_quant_conv:
        p["quant_conv"] = _conv(sd, "quant_conv")
    return p


def port_vae_decoder(state_dict, config: VAEConfig) -> dict:
    sd = dict(state_dict)
    p: dict = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_block": _mid_block(sd, "decoder.mid_block"),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    for bi in range(len(config.block_out_channels)):
        for li in range(config.layers_per_block + 1):
            p[f"up_blocks_{bi}_resnets_{li}"] = _vae_resnet(
                sd, f"decoder.up_blocks.{bi}.resnets.{li}")
        if bi < len(config.block_out_channels) - 1:
            p[f"up_blocks_{bi}_upsamplers_0_conv"] = _conv(
                sd, f"decoder.up_blocks.{bi}.upsamplers.0.conv")
    if config.use_quant_conv:
        p["post_quant_conv"] = _conv(sd, "post_quant_conv")
    return p
