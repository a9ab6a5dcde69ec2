"""Mixed-bit palettization (MBP): per-layer sensitivity analysis + recipes.

TPU-native port of the reference's recipe machinery
(mixed_bit_compression_pre_analysis.py / mixed_bit_compression_apply.py):

- single-layer sweep: simulate {1,2,4,6,8}-bit palettization of each layer in
  isolation, measure end-to-end denoised-latent PSNR vs the uncompressed
  model (benchmark_signal_integrity :280, cumulative=False)
- cumulative sweep in ascending-impact order (:482-499)
- build_recipe: per layer, the smallest nbits whose PSNR clears a threshold
  (:352-375); recipes serialize to JSON keyed by layer path, matching the
  reference's published recipe shape (README.md:212-235)
- apply_recipe: palettize each layer at its recipe bit width
  (mixed_bit_compression_apply.py:23-87 — by explicit path instead of the
  reference's tensor-hash matching :45-47, since we own the pytree)

The model runner is injected (``run_fn(params) -> latent ndarray``) so the
same machinery serves SD/SDXL/SD3; incremental JSON checkpointing mirrors
the reference's resumability (pre_analysis.py:464-480).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Callable, Sequence

import jax
import numpy as np

from ..convert.report import compute_psnr
from .palettize import NBITS, PALETTIZE_MIN_SIZE, palettize_array

logger = logging.getLogger(__name__)


def _get(params, path):
    node = params
    for k in path:
        node = node[k]
    return node


def _set(params, path, value):
    """Functional set returning a new tree (shallow copies along the path)."""
    if not path:
        return value
    out = dict(params)
    out[path[0]] = _set(params[path[0]], path[1:], value)
    return out


def palettizable_paths(params, min_size: int = PALETTIZE_MIN_SIZE):
    """All kernel paths above the size threshold (reference
    get_palettizable_modules pre_analysis.py:194)."""
    paths = []
    for p, leaf in jax.tree_util.tree_leaves_with_path(params):
        names = tuple(x.key for x in p if hasattr(x, "key"))
        if names[-1] == "kernel" and int(np.prod(leaf.shape)) >= min_size:
            paths.append(names)
    return paths


def _fake_palettize(params, path, nbits):
    w = np.asarray(_get(params, path))
    return _set(params, path, palettize_array(w, nbits).dequantize().astype(w.dtype))


def benchmark_signal_integrity(run_fn: Callable, params,
                               nbits_list: Sequence[int] = NBITS,
                               paths=None,
                               cumulative: bool = False,
                               out_json: str | Path | None = None) -> dict:
    """-> {"single_layer": {path_str: {nbits: psnr}}} or
    {"cumulative": {nbits: {path_str: psnr}}} (reference :280-327)."""
    if paths is None:
        paths = palettizable_paths(params)
    ref_out = np.asarray(run_fn(params))
    results: dict = {"single_layer": {}, "cumulative": {}}

    def flush():
        if out_json is not None:
            Path(out_json).write_text(json.dumps(results, indent=1))

    if not cumulative:
        for path in paths:
            key = "/".join(path)
            results["single_layer"][key] = {}
            for nbits in nbits_list:
                mutated = _fake_palettize(params, path, nbits)
                psnr = compute_psnr(np.asarray(run_fn(mutated)), ref_out)
                results["single_layer"][key][str(nbits)] = round(psnr, 2)
                logger.info("single %s @%db: %.1f dB", key, nbits, psnr)
            flush()
    else:
        for nbits in nbits_list:
            results["cumulative"][str(nbits)] = {}
            mutated = params
            for path in paths:
                key = "/".join(path)
                mutated = _fake_palettize(mutated, path, nbits)
                psnr = compute_psnr(np.asarray(run_fn(mutated)), ref_out)
                results["cumulative"][str(nbits)][key] = round(psnr, 2)
                logger.info("cumulative %s @%db: %.1f dB", key, nbits, psnr)
            flush()
    flush()  # always leave a (possibly empty) checkpoint on disk
    return results


def descending_psnr_order(single_layer: dict, nbits: int = 1):
    """Layer keys in ascending impact order (highest PSNR under 1-bit quant
    first — reference descending_psnr_order pre_analysis.py:329)."""
    return sorted(single_layer,
                  key=lambda k: -single_layer[k][str(nbits)])


def build_recipe(single_layer: dict, psnr_threshold: float,
                 default_nbits: int = 16) -> dict:
    """Per layer: the smallest nbits whose single-layer PSNR clears the
    threshold (reference build_recipe :352-375).  16 = keep uncompressed."""
    recipe = {}
    for key, by_bits in single_layer.items():
        chosen = default_nbits
        for nbits in sorted(int(b) for b in by_bits):
            if by_bits[str(nbits)] >= psnr_threshold:
                chosen = nbits
                break
        recipe[key] = chosen
    return recipe


def recipe_average_bits(recipe: dict, params) -> float:
    total = weighted = 0
    for key, nbits in recipe.items():
        n = int(np.prod(np.asarray(_get(params, tuple(key.split("/")))).shape))
        total += n
        weighted += n * min(nbits, 16)
    return weighted / max(total, 1)


def apply_recipe(params, recipe: dict):
    """Fake-quantize every layer at its recipe bit width; 16 leaves a layer
    untouched (reference apply.py:23-87)."""
    out = params
    for key, nbits in recipe.items():
        if nbits >= 16:
            continue
        out = _fake_palettize(out, tuple(key.split("/")), nbits)
    return out


def apply_recipe_palettized(params, recipe: dict):
    """Like apply_recipe but keeps PalettizedTensor leaves, so artifacts
    store packed indices+LUT and serve compressed (the reference's applied
    recipe produces a genuinely smaller .mlpackage, apply.py:85-87)."""
    out = params
    for key, nbits in recipe.items():
        if nbits >= 16:
            continue
        path = tuple(key.split("/"))
        w = np.asarray(_get(out, path))
        out = _set(out, path, palettize_array(w, nbits))
    return out
