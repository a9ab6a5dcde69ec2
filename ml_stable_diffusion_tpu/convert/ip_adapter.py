"""IP-Adapter weight loading/porting (beyond the reference).

On-disk format (h94/IP-Adapter): two groups —
- ``image_proj``: the BASE projection (``proj.weight/bias`` +
  ``norm.weight/bias``) or the PLUS perceiver resampler
  (``latents``/``proj_in``/``layers.*``/``proj_out``/``norm_out``).
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
    if "proj.weight" not in image_proj and "latents" not in image_proj:
        raise ValueError(
            "unrecognized IP-Adapter projection layout (image_proj keys: "
            f"{sorted(image_proj)}); expected the BASE (proj/norm) or PLUS "
            "(latents/proj_in/layers.*) format")
    ip_layers = {k: _np(v) for k, v in raw["ip_adapter"].items()}
    return image_proj, ip_layers


def cross_attention_paths(config: UNetConfig) -> list[tuple[str, ...]]:
    """Flax param paths of every cross-attention (attn2) module, in the
    diffusers attn_processors enumeration order: down blocks (ascending),
    UP blocks (ascending), MID LAST — torch registers submodules at
    attribute-assignment time, and UNet2DConditionModel assigns the empty
    ``up_blocks`` ModuleList before ``mid_block``, so named_modules (and
    every published adapter's indices) put the mid attention at the END
    (e.g. SD-1.5 index 31 of 0..31)."""
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
    for bi, btype in enumerate(config.up_block_types):
        if btype != "CrossAttnUpBlock2D":
            continue
        down_bi = n_blocks - 1 - bi
        for li in range(config.layers_per_block + 1):
            spatial(f"up_blocks_{bi}_attentions_{li}",
                    config.transformer_layers_per_block[down_bi])
    spatial("mid_block_attentions_0",
            config.transformer_layers_per_block[-1])
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


def resampler_geometry(image_proj: dict) -> dict:
    """Infer IPResampler constructor kwargs from a PLUS image_proj group.

    resampler.py geometry: latents (1, num_queries, dim); to_q
    (inner, dim) with inner = heads*64 (dim_head is 64 in every published
    plus adapter); proj_out (output_dim, dim); layers.{i}.* for depth i."""
    lat = image_proj["latents"]
    dim = lat.shape[-1]
    inner = image_proj["layers.0.0.to_q.weight"].shape[0]
    depth = 1 + max(int(k.split(".")[1]) for k in image_proj
                    if k.startswith("layers."))
    ff_in = image_proj["layers.0.1.1.weight"].shape[0]
    return {
        "output_dim": image_proj["proj_out.weight"].shape[0],
        "dim": dim,
        "depth": depth,
        "dim_head": 64,
        "heads": inner // 64,
        "num_queries": lat.shape[1],
        "ff_mult": ff_in // dim,
    }


def port_ip_resampler(image_proj: dict) -> dict:
    """PLUS image_proj group -> IPResampler params.

    h94 resampler key map: layers.{i}.0 = PerceiverAttention
    (norm1/norm2/to_q/to_kv/to_out), layers.{i}.1 = Sequential
    [0]=LayerNorm, [1]=Linear(in), [3]=Linear(out)."""
    g = resampler_geometry(image_proj)
    p: dict = {
        "latents": _np(image_proj["latents"]),
        "proj_in": {"kernel": _np(image_proj["proj_in.weight"]).T,
                    "bias": _np(image_proj["proj_in.bias"])},
        "proj_out": {"kernel": _np(image_proj["proj_out.weight"]).T,
                     "bias": _np(image_proj["proj_out.bias"])},
        "norm_out": {"scale": _np(image_proj["norm_out.weight"]),
                     "bias": _np(image_proj["norm_out.bias"])},
    }
    for i in range(g["depth"]):
        a = f"layers.{i}.0"
        p[f"layers_{i}_attn"] = {
            "norm1": {"scale": _np(image_proj[f"{a}.norm1.weight"]),
                      "bias": _np(image_proj[f"{a}.norm1.bias"])},
            "norm2": {"scale": _np(image_proj[f"{a}.norm2.weight"]),
                      "bias": _np(image_proj[f"{a}.norm2.bias"])},
            "to_q": {"kernel": _np(image_proj[f"{a}.to_q.weight"]).T},
            "to_kv": {"kernel": _np(image_proj[f"{a}.to_kv.weight"]).T},
            "to_out": {"kernel": _np(image_proj[f"{a}.to_out.weight"]).T},
        }
        f = f"layers.{i}.1"
        p[f"layers_{i}_ff_norm"] = {
            "scale": _np(image_proj[f"{f}.0.weight"]),
            "bias": _np(image_proj[f"{f}.0.bias"])}
        p[f"layers_{i}_ff_in"] = {
            "kernel": _np(image_proj[f"{f}.1.weight"]).T}
        p[f"layers_{i}_ff_out"] = {
            "kernel": _np(image_proj[f"{f}.3.weight"]).T}
    return p
