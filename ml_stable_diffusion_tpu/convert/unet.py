"""UNet weight porting: HF-diffusers checkpoint layout -> Flax params.

The TPU analog of the reference's convert_unet (torch2coreml.py:799-1051):
where the reference re-keys Linear weights into 1x1 convs for the ANE
(linear_to_conv2d_map, unet.py:121-127), we transpose convs OIHW->HWIO and
Linears (out,in)->(in,out) for NHWC/XLA.
"""

from __future__ import annotations

import numpy as np

from ..models.unet import UNetConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _key(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def _conv(sd, prefix):
    out = {"kernel": _np(sd[_key(prefix, "weight")]).transpose(2, 3, 1, 0)}
    if _key(prefix, "bias") in sd:
        out["bias"] = _np(sd[_key(prefix, "bias")])
    return out


def _dense(sd, prefix):
    w = _np(sd[_key(prefix, "weight")])
    if w.ndim == 4:  # 1x1 conv used as linear (SD1.x proj_in/out)
        w = w[:, :, 0, 0]
    out = {"kernel": w.T}
    if _key(prefix, "bias") in sd:
        out["bias"] = _np(sd[_key(prefix, "bias")])
    return out


def _norm(sd, prefix):
    return {"scale": _np(sd[_key(prefix, "weight")]),
            "bias": _np(sd[_key(prefix, "bias")])}


def _resnet(sd, prefix):
    p = {
        "norm1": _norm(sd, _key(prefix, "norm1")),
        "conv1": _conv(sd, _key(prefix, "conv1")),
        "time_emb_proj": _dense(sd, _key(prefix, "time_emb_proj")),
        "norm2": _norm(sd, _key(prefix, "norm2")),
        "conv2": _conv(sd, _key(prefix, "conv2")),
    }
    if _key(prefix, "conv_shortcut.weight") in sd:
        p["conv_shortcut"] = _conv(sd, _key(prefix, "conv_shortcut"))
    return p


def _transformer_block(sd, prefix):
    return {
        "norm1": _norm(sd, _key(prefix, "norm1")),
        "attn1": {
            "to_q": _dense(sd, _key(prefix, "attn1.to_q")),
            "to_k": _dense(sd, _key(prefix, "attn1.to_k")),
            "to_v": _dense(sd, _key(prefix, "attn1.to_v")),
            "to_out_0": _dense(sd, _key(prefix, "attn1.to_out.0")),
        },
        "norm2": _norm(sd, _key(prefix, "norm2")),
        "attn2": {
            "to_q": _dense(sd, _key(prefix, "attn2.to_q")),
            "to_k": _dense(sd, _key(prefix, "attn2.to_k")),
            "to_v": _dense(sd, _key(prefix, "attn2.to_v")),
            "to_out_0": _dense(sd, _key(prefix, "attn2.to_out.0")),
        },
        "norm3": _norm(sd, _key(prefix, "norm3")),
        "ff": {
            "geglu_proj": _dense(sd, _key(prefix, "ff.net.0.proj")),
            "proj_out": _dense(sd, _key(prefix, "ff.net.2")),
        },
    }


def _spatial_transformer(sd, prefix, depth):
    p = {
        "norm": _norm(sd, _key(prefix, "norm")),
        "proj_in": _dense(sd, _key(prefix, "proj_in")),
        "proj_out": _dense(sd, _key(prefix, "proj_out")),
    }
    for k in range(depth):
        p[f"transformer_blocks_{k}"] = _transformer_block(
            sd, _key(prefix, f"transformer_blocks.{k}"))
    return p


def port_unet(state_dict, config: UNetConfig) -> dict:
    """diffusers UNet2DConditionModel state dict -> Flax params for
    models.unet.UNet2DConditionModel."""
    sd = dict(state_dict)
    p: dict = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _dense(sd, "time_embedding.linear_1"),
            "linear_2": _dense(sd, "time_embedding.linear_2"),
        },
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    if "time_embedding.cond_proj.weight" in sd:
        # fully-distilled LCM guidance embedding (time_cond_proj_dim)
        p["time_embedding"]["cond_proj"] = _dense(sd,
                                                  "time_embedding.cond_proj")
    if config.addition_embed_type == "text_time":
        p["add_embedding"] = {
            "linear_1": _dense(sd, "add_embedding.linear_1"),
            "linear_2": _dense(sd, "add_embedding.linear_2"),
        }

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

    for bi, btype in enumerate(config.up_block_types):
        down_bi = n_blocks - 1 - bi
        for li in range(config.layers_per_block + 1):
            p[f"up_blocks_{bi}_resnets_{li}"] = _resnet(
                sd, f"up_blocks.{bi}.resnets.{li}")
            if btype == "CrossAttnUpBlock2D":
                p[f"up_blocks_{bi}_attentions_{li}"] = _spatial_transformer(
                    sd, f"up_blocks.{bi}.attentions.{li}",
                    config.transformer_layers_per_block[down_bi])
        if bi < n_blocks - 1:
            p[f"up_blocks_{bi}_upsamplers_0"] = {
                "conv": _conv(sd, f"up_blocks.{bi}.upsamplers.0.conv")}
    return p
