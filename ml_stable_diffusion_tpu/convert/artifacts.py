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
from safetensors.numpy import load_file, save_file


def _flatten(params) -> dict[str, np.ndarray]:
    out = {}
    for p, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(x.key for x in p if hasattr(x, "key"))
        # safetensors silently corrupts non-contiguous views (transposed
        # ported weights are views) — force contiguous
        out[key] = np.ascontiguousarray(np.asarray(leaf))
    return out


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
    """Write <path>/<name>.safetensors + <path>/<name>.json manifest."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    flat = _flatten(params)
    save_file(flat, str(path / f"{name}.safetensors"))
    manifest = {
        "name": name,
        "tensors": {k: {"shape": list(v.shape), "dtype": str(v.dtype)}
                    for k, v in flat.items()},
    }
    if config is not None:
        manifest["config"] = dataclasses.asdict(config)
        manifest["config_class"] = type(config).__name__
    (path / f"{name}.json").write_text(json.dumps(manifest, indent=1))


def load_module(path: str | Path, name: str = "module"):
    """-> (params pytree, manifest dict)."""
    path = Path(path)
    flat = load_file(str(path / f"{name}.safetensors"))
    manifest = json.loads((path / f"{name}.json").read_text())
    return _unflatten(dict(flat)), manifest
