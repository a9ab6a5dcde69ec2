"""CLIP text encoder weight porting.

Maps a transformers ``CLIPTextModel`` / ``CLIPTextModelWithProjection``
state dict (torch or safetensors tensors) onto the Flax parameter tree of
``models.clip.CLIPTextEncoder``.  This is the TPU analog of the reference's
conversion step (torch2coreml.py convert_text_encoder :379-498): instead of
tracing + compiling to an .mlpackage, we permute weights into a pytree.
"""

from __future__ import annotations

import numpy as np

from ..models.clip import CLIPTextConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _dense(sd, prefix):
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _ln(sd, prefix):
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def port_clip_text_encoder(state_dict, config: CLIPTextConfig) -> dict:
    """torch/safetensors state dict -> Flax params for CLIPTextEncoder."""
    sd = dict(state_dict)
    # strip an optional top-level wrapper
    if any(k.startswith("text_model.") for k in sd):
        pass
    else:
        sd = {f"text_model.{k}": v for k, v in sd.items()}

    p: dict = {
        "token_embedding": {
            "embedding": _np(sd["text_model.embeddings.token_embedding.weight"])
        },
        "position_embedding": _np(sd["text_model.embeddings.position_embedding.weight"]),
        "final_layer_norm": _ln(sd, "text_model.final_layer_norm"),
    }
    for i in range(config.num_hidden_layers):
        base = f"text_model.encoder.layers.{i}"
        p[f"layers_{i}"] = {
            "ln1": _ln(sd, f"{base}.layer_norm1"),
            "q_proj": _dense(sd, f"{base}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{base}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{base}.self_attn.v_proj"),
            "out_proj": _dense(sd, f"{base}.self_attn.out_proj"),
            "ln2": _ln(sd, f"{base}.layer_norm2"),
            "fc1": _dense(sd, f"{base}.mlp.fc1"),
            "fc2": _dense(sd, f"{base}.mlp.fc2"),
        }
    if config.use_text_projection:
        # CLIPTextModelWithProjection stores it at the top level
        key = ("text_model.text_projection.weight"
               if "text_model.text_projection.weight" in sd
               else "text_projection.weight")
        p["text_projection"] = {"kernel": _np(sd[key]).T}
    return p
