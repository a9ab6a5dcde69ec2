"""Artifact store: converted weights on disk.

Plays the role of the reference's compiled ``.mlmodelc`` bundle + its
``metadata.json`` input schema (coreml_model.py:65-84, bundle table
torch2coreml.py:282-296): a safetensors file of the Flax pytree (keys are
'/'-joined paths) plus a JSON manifest carrying the model config and dtypes,
so a pipeline can be reconstructed without re-porting from torch.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import numpy as np

# own reader/writer (native C++ header parse + zero-copy mmap views);
# byte-compatible with the ecosystem's safetensors libraries
from .native_io import load_file, save_file


def _is_palettized(leaf) -> bool:
    from ..compress.palettize import PalettizedTensor

    return isinstance(leaf, PalettizedTensor)


def _flatten(params) -> tuple[dict[str, np.ndarray], dict[str, dict]]:
    """-> (tensors, palettized manifest entries).  PalettizedTensor leaves
    are stored bit-packed as ``<key>::idx`` + ``<key>::lut`` — the on-disk
    analog of the reference's palettized .mlpackage weights, which the ANE
    decompresses at execution (README.md:165)."""
    from ..ops.palettized import pack_bits

    out, palettized = {}, {}
    for p, leaf in jax.tree_util.tree_leaves_with_path(
            params, is_leaf=_is_palettized):
        key = "/".join(x.key for x in p if hasattr(x, "key"))
        if _is_palettized(leaf):
            out[key + "::idx"] = pack_bits(leaf.indices, leaf.nbits)
            out[key + "::lut"] = np.asarray(leaf.lut, np.float32)
            palettized[key] = {"nbits": leaf.nbits,
                               "shape": list(leaf.shape),
                               "count": int(np.prod(leaf.shape))}
            continue
        # safetensors silently corrupts non-contiguous views (transposed
        # ported weights are views) — force contiguous
        out[key] = np.ascontiguousarray(np.asarray(leaf))
    return out, palettized


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def save_module(path: str | Path, params, config=None, name: str = "module"):
    """Write <path>/<name>.safetensors + <path>/<name>.json manifest.
    PalettizedTensor leaves are stored compressed (bit-packed indices + LUT)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    flat, palettized = _flatten(params)
    save_file(flat, str(path / f"{name}.safetensors"))
    manifest = {
        "name": name,
        "tensors": {k: {"shape": list(v.shape), "dtype": str(v.dtype)}
                    for k, v in flat.items()},
    }
    if palettized:
        manifest["palettized"] = palettized
    if config is not None:
        manifest["config"] = dataclasses.asdict(config)
        manifest["config_class"] = type(config).__name__
    (path / f"{name}.json").write_text(json.dumps(manifest, indent=1))


def load_module(path: str | Path, name: str = "module",
                dequantize: bool = True):
    """-> (params pytree, manifest dict).

    Palettized entries come back as dense float32 (``dequantize=True``,
    default) or as PalettizedTensor leaves for compressed serving
    (``dequantize=False`` — see compress/palettize.split_palettized_tree).
    """
    path = Path(path)
    flat = dict(load_file(str(path / f"{name}.safetensors")))
    manifest = json.loads((path / f"{name}.json").read_text())
    for key, info in manifest.get("palettized", {}).items():
        from ..compress.palettize import PalettizedTensor
        from ..ops.palettized import unpack_bits

        idx = unpack_bits(flat.pop(key + "::idx"), info["nbits"],
                          info["count"])
        pt = PalettizedTensor(idx, flat.pop(key + "::lut"),
                              tuple(info["shape"]), info["nbits"])
        flat[key] = pt.dequantize() if dequantize else pt
    return _unflatten(flat), manifest
