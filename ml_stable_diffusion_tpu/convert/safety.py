"""Safety checker weight porting: HF StableDiffusionSafetyChecker -> Flax.

The reference converts this module with a vectorized forward
(torch2coreml.py convert_safety_checker :1119-1316).  HF layout: a CLIP
vision tower under ``vision_model.vision_model.*`` plus ``visual_projection``
and the concept/special-care embedding banks (buffers).
"""

from __future__ import annotations

from ..models.safety import SafetyCheckerConfig
from .unet import _dense, _norm, _np


def safety_config_from_diffusers(cfg: dict) -> SafetyCheckerConfig:
    v = cfg.get("vision_config", cfg)
    return SafetyCheckerConfig(
        image_size=v.get("image_size", 224),
        patch_size=v.get("patch_size", 14),
        hidden_size=v.get("hidden_size", 1024),
        intermediate_size=v.get("intermediate_size", 4096),
        num_hidden_layers=v.get("num_hidden_layers", 24),
        num_attention_heads=v.get("num_attention_heads", 16),
        projection_dim=cfg.get("projection_dim", 768),
    )


def port_safety_checker(state_dict, config: SafetyCheckerConfig) -> dict:
    sd = dict(state_dict)
    vm = "vision_model.vision_model"
    p: dict = {
        "patch_embedding": {
            "kernel": _np(sd[f"{vm}.embeddings.patch_embedding.weight"])
            .transpose(2, 3, 1, 0)
        },
        "class_embedding": _np(sd[f"{vm}.embeddings.class_embedding"]),
        "position_embedding": _np(sd[f"{vm}.embeddings.position_embedding.weight"]),
        # HF's key really is spelled "pre_layrnorm"
        "pre_layernorm": _norm(sd, f"{vm}.pre_layrnorm"),
        "post_layernorm": _norm(sd, f"{vm}.post_layernorm"),
        "visual_projection": {"kernel": _np(sd["visual_projection.weight"]).T},
        "concept_embeds": _np(sd["concept_embeds"]),
        "concept_embeds_weights": _np(sd["concept_embeds_weights"]),
        "special_care_embeds": _np(sd["special_care_embeds"]),
        "special_care_embeds_weights": _np(sd["special_care_embeds_weights"]),
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
