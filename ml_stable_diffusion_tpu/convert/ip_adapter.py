"""IP-Adapter weight loading/porting (beyond the reference).

On-disk format (h94/IP-Adapter): two groups —
- ``image_proj``: ``proj.weight/bias`` + ``norm.weight/bias`` (the BASE
  projection; "plus" variants carry a perceiver resampler instead —
  ``latents``/``proj_in``/... keys — and are rejected with a clear error).
- ``ip_adapter``: ``{2i+1}.to_k_ip.weight`` / ``.to_v_ip.weight`` where the
  integer indexes diffusers' ``unet.attn_processors`` enumeration — attn1
  and attn2 of every transformer block in down -> mid -> up order, so the
  i-th CROSS-attention holds index ``2*i + 1``.

Porting maps those onto the decoupled-attention params ``models/unet.py``
creates (``.../attn2/to_k_ip/kernel``, torch (out,in) -> (in,out)).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..models.unet import UNetConfig
from .native_io import load_file
from .unet import _np


def load_ip_adapter_state(source) -> tuple[dict, dict]:
    """-> (image_proj: {name: np}, ip_layers: {"1.to_k_ip.weight": np, ...}).

    ``source``: .safetensors (flat ``image_proj.*`` / ``ip_adapter.*``
    keys), a torch-pickled .bin (nested dicts), or an already-nested
    dict."""
    if isinstance(source, dict):
        raw = source
    else:
        path = Path(source)
        if path.suffix == ".safetensors":
            flat = load_file(path)
            raw = {"image_proj": {}, "ip_adapter": {}}
            for k, v in flat.items():
                group, _, rest = k.partition(".")
                if group not in raw:
                    raise ValueError(f"unexpected IP-Adapter key: {k}")
                raw[group][rest] = v
        else:
            import torch

            raw = torch.load(path, map_location="cpu", weights_only=True)
    if "image_proj" not in raw or "ip_adapter" not in raw:
        raise ValueError(
            f"not an IP-Adapter checkpoint (groups: {sorted(raw)})")
    image_proj = {k: _np(v) for k, v in raw["image_proj"].items()}
    if "proj.weight" not in image_proj:
        raise NotImplementedError(
            "this checkpoint uses the ip-adapter-plus perceiver resampler "
            f"(image_proj keys: {sorted(image_proj)}); only the BASE "
            "projection (proj/norm) is supported")
    ip_layers = {k: _np(v) for k, v in raw["ip_adapter"].items()}
    return image_proj, ip_layers


def cross_attention_paths(config: UNetConfig) -> list[tuple[str, ...]]:
    """Flax param paths of every cross-attention (attn2) module, in the
    diffusers attn_processors enumeration order: down blocks (ascending),
    mid, up blocks (ascending)."""
    paths: list[tuple[str, ...]] = []

    def spatial(prefix: str, depth: int):
        for k in range(depth):
            paths.append((prefix, f"transformer_blocks_{k}", "attn2"))

    n_blocks = len(config.block_out_channels)
    for bi, btype in enumerate(config.down_block_types):
        if btype != "CrossAttnDownBlock2D":
            continue
        for li in range(config.layers_per_block):
            spatial(f"down_blocks_{bi}_attentions_{li}",
                    config.transformer_layers_per_block[bi])
    spatial("mid_block_attentions_0",
            config.transformer_layers_per_block[-1])
    for bi, btype in enumerate(config.up_block_types):
        if btype != "CrossAttnUpBlock2D":
            continue
        down_bi = n_blocks - 1 - bi
        for li in range(config.layers_per_block + 1):
            spatial(f"up_blocks_{bi}_attentions_{li}",
                    config.transformer_layers_per_block[down_bi])
    return paths


def port_ip_adapter(config: UNetConfig, ip_layers: dict) -> dict:
    """-> {flax attn2 path: {"to_k_ip": {"kernel"}, "to_v_ip": {"kernel"}}}
    for merging into UNet params."""
    paths = cross_attention_paths(config)
    expect = 2 * len(paths)
    have = {int(k.split(".")[0]) for k in ip_layers}
    want = {2 * i + 1 for i in range(len(paths))}
    if have != want:
        raise ValueError(
            f"IP-Adapter layer indices {sorted(have)} do not match this "
            f"UNet's {len(paths)} cross-attentions (expected odd indices "
            f"up to {expect - 1}) — wrong base model?")
    out = {}
    for i, path in enumerate(paths):
        idx = 2 * i + 1
        out[path] = {
            "to_k_ip": {"kernel": _np(ip_layers[f"{idx}.to_k_ip.weight"]).T},
            "to_v_ip": {"kernel": _np(ip_layers[f"{idx}.to_v_ip.weight"]).T},
        }
    return out


def port_ip_image_projection(image_proj: dict) -> dict:
    """image_proj group -> IPImageProjection params."""
    return {
        "proj": {"kernel": _np(image_proj["proj.weight"]).T,
                 "bias": _np(image_proj["proj.bias"])},
        "norm": {"scale": _np(image_proj["norm.weight"]),
                 "bias": _np(image_proj["norm.bias"])},
    }
