"""T5 encoder weight porting: HF T5EncoderModel -> Flax params."""

from __future__ import annotations

from ..models.t5 import T5Config
from .unet import _np


def _w(sd, name):
    return {"kernel": _np(sd[name + ".weight"]).T}


def port_t5_encoder(state_dict, config: T5Config) -> dict:
    sd = dict(state_dict)
    p: dict = {
        "shared": {"embedding": _np(sd["shared.weight"])},
        "relative_attention_bias": _np(
            sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]),
        "final_layer_norm": {"scale": _np(sd["encoder.final_layer_norm.weight"])},
    }
    for i in range(config.num_layers):
        b = f"encoder.block.{i}"
        p[f"block_{i}"] = {
            "attn_layer_norm": {"scale": _np(sd[f"{b}.layer.0.layer_norm.weight"])},
            "q": _w(sd, f"{b}.layer.0.SelfAttention.q"),
            "k": _w(sd, f"{b}.layer.0.SelfAttention.k"),
            "v": _w(sd, f"{b}.layer.0.SelfAttention.v"),
            "o": _w(sd, f"{b}.layer.0.SelfAttention.o"),
            "ff_layer_norm": {"scale": _np(sd[f"{b}.layer.1.layer_norm.weight"])},
            "wi_0": _w(sd, f"{b}.layer.1.DenseReluDense.wi_0"),
            "wi_1": _w(sd, f"{b}.layer.1.DenseReluDense.wi_1"),
            "wo": _w(sd, f"{b}.layer.1.DenseReluDense.wo"),
        }
    return p
