"""CLIP vision encoder weight porting (transformers
CLIPVisionModelWithProjection -> models/clip_vision.CLIPVisionEncoder).

Same tower mapping as the safety checker's (convert/safety.py) with the
single-``vision_model`` prefix transformers uses for the standalone model
(the safety checker nests it twice)."""

from __future__ import annotations

from ..models.clip_vision import CLIPVisionConfig
from .unet import _dense, _norm, _np


def port_clip_vision(state_dict, config: CLIPVisionConfig) -> dict:
    sd = dict(state_dict)
    vm = ("vision_model.vision_model"
          if any(k.startswith("vision_model.vision_model.") for k in sd)
          else "vision_model")
    # HF's key really is spelled "pre_layrnorm"
    pre = (f"{vm}.pre_layrnorm" if f"{vm}.pre_layrnorm.weight" in sd
           else f"{vm}.pre_layernorm")
    p: dict = {
        "patch_embedding": {
            "kernel": _np(sd[f"{vm}.embeddings.patch_embedding.weight"])
            .transpose(2, 3, 1, 0)
        },
        "class_embedding": _np(sd[f"{vm}.embeddings.class_embedding"]),
        "position_embedding": _np(
            sd[f"{vm}.embeddings.position_embedding.weight"]),
        "pre_layernorm": _norm(sd, pre),
        "post_layernorm": _norm(sd, f"{vm}.post_layernorm"),
        "visual_projection": {
            "kernel": _np(sd["visual_projection.weight"]).T},
    }
    for i in range(config.num_hidden_layers):
        b = f"{vm}.encoder.layers.{i}"
        p[f"layers_{i}"] = {
            "ln1": _norm(sd, f"{b}.layer_norm1"),
            "q_proj": _dense(sd, f"{b}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{b}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{b}.self_attn.v_proj"),
            "out_proj": _dense(sd, f"{b}.self_attn.out_proj"),
            "ln2": _norm(sd, f"{b}.layer_norm2"),
            "fc1": _dense(sd, f"{b}.mlp.fc1"),
            "fc2": _dense(sd, f"{b}.mlp.fc2"),
        }
    return p


def load_clip_vision(directory, dtype=None):
    """Load a CLIPVisionModelWithProjection checkpoint directory
    (config.json + safetensors) -> (CLIPVisionEncoder, params)."""
    import json
    from pathlib import Path

    import jax.numpy as jnp

    from ..models.clip_vision import CLIPVisionEncoder
    from .load import load_safetensors_state_dict

    directory = Path(directory)
    raw = json.loads((directory / "config.json").read_text())
    config = CLIPVisionConfig.from_diffusers(raw.get("vision_config", raw))
    if "projection_dim" in raw:
        import dataclasses

        config = dataclasses.replace(config,
                                     projection_dim=raw["projection_dim"])
    sd = load_safetensors_state_dict(directory)
    model = CLIPVisionEncoder(config,
                              dtype=dtype if dtype is not None
                              else jnp.float32)
    return model, port_clip_vision(sd, config)
