"""MMDiT weight porting: diffusers SD3Transformer2DModel -> Flax params."""

from __future__ import annotations

from ..models.mmdit import MMDiTConfig
from .unet import _conv, _dense, _np


def port_mmdit(state_dict, config: MMDiTConfig) -> dict:
    sd = dict(state_dict)
    D = config.hidden_size
    M = config.pos_embed_max_size
    p: dict = {
        "patch_proj": _conv(sd, "pos_embed.proj"),
        "pos_embed": _np(sd["pos_embed.pos_embed"]).reshape(M, M, D),
        "timestep_embedder": {
            "linear_1": _dense(sd, "time_text_embed.timestep_embedder.linear_1"),
            "linear_2": _dense(sd, "time_text_embed.timestep_embedder.linear_2"),
        },
        "text_embedder": {
            "linear_1": _dense(sd, "time_text_embed.text_embedder.linear_1"),
            "linear_2": _dense(sd, "time_text_embed.text_embedder.linear_2"),
        },
        "context_embedder": _dense(sd, "context_embedder"),
        "norm_out_linear": _dense(sd, "norm_out.linear"),
        "proj_out": _dense(sd, "proj_out"),
    }
    for i in range(config.depth):
        p[f"blocks_{i}"] = _port_joint_block(
            sd, f"transformer_blocks.{i}", config,
            context_pre_only=(i == config.depth - 1))
    return p


def _port_joint_block(sd, b: str, config, context_pre_only: bool) -> dict:
    blk = {
        "norm1_linear": _dense(sd, f"{b}.norm1.linear"),
        "norm1_context_linear": _dense(sd, f"{b}.norm1_context.linear"),
        "to_q": _dense(sd, f"{b}.attn.to_q"),
        "to_k": _dense(sd, f"{b}.attn.to_k"),
        "to_v": _dense(sd, f"{b}.attn.to_v"),
        "add_q_proj": _dense(sd, f"{b}.attn.add_q_proj"),
        "add_k_proj": _dense(sd, f"{b}.attn.add_k_proj"),
        "add_v_proj": _dense(sd, f"{b}.attn.add_v_proj"),
        "to_out_0": _dense(sd, f"{b}.attn.to_out.0"),
        "ff_proj": _dense(sd, f"{b}.ff.net.0.proj"),
        "ff_out": _dense(sd, f"{b}.ff.net.2"),
    }
    if config.qk_norm:
        blk["norm_q"] = {"scale": _np(sd[f"{b}.attn.norm_q.weight"])}
        blk["norm_k"] = {"scale": _np(sd[f"{b}.attn.norm_k.weight"])}
        blk["norm_added_q"] = {"scale": _np(sd[f"{b}.attn.norm_added_q.weight"])}
        blk["norm_added_k"] = {"scale": _np(sd[f"{b}.attn.norm_added_k.weight"])}
    if not context_pre_only:
        blk["to_add_out"] = _dense(sd, f"{b}.attn.to_add_out")
        blk["ff_context_proj"] = _dense(sd, f"{b}.ff_context.net.0.proj")
        blk["ff_context_out"] = _dense(sd, f"{b}.ff_context.net.2")
    return blk


def port_sd3_controlnet(state_dict, config) -> dict:
    """diffusers SD3ControlNetModel -> models/controlnet_sd3.py params.

    Layout mirrors port_mmdit's stem plus the zero patch embedding for the
    conditioning latents (``pos_embed_input``) and the per-block zero linear
    projections (``controlnet_blocks.{i}``)."""
    sd = dict(state_dict)
    mm = config.mmdit
    M = mm.pos_embed_max_size
    p: dict = {
        "patch_proj": _conv(sd, "pos_embed.proj"),
        "pos_embed": _np(sd["pos_embed.pos_embed"]).reshape(
            M, M, mm.hidden_size),
        "patch_proj_input": _conv(sd, "pos_embed_input.proj"),
        "timestep_embedder": {
            "linear_1": _dense(sd, "time_text_embed.timestep_embedder.linear_1"),
            "linear_2": _dense(sd, "time_text_embed.timestep_embedder.linear_2"),
        },
        "text_embedder": {
            "linear_1": _dense(sd, "time_text_embed.text_embedder.linear_1"),
            "linear_2": _dense(sd, "time_text_embed.text_embedder.linear_2"),
        },
        "context_embedder": _dense(sd, "context_embedder"),
    }
    for i in range(config.num_layers):
        p[f"blocks_{i}"] = _port_joint_block(
            sd, f"transformer_blocks.{i}", mm, context_pre_only=False)
        p[f"controlnet_blocks_{i}"] = _dense(sd, f"controlnet_blocks.{i}")
    return p
