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


def _linear_quantize_int8(w: np.ndarray) -> np.ndarray:
    """Uniform symmetric per-tensor int8 fake quantization (the reference's
    linear-8-bit baseline variant, pre_analysis.py:376-434)."""
    scale = max(float(np.abs(w).max()), 1e-8) / 127.0
    return (np.clip(np.round(w / scale), -127, 127) * scale).astype(w.dtype)


def benchmark_baselines(run_fn: Callable, params, paths=None) -> dict:
    """PSNR anchors the reference's pre-analysis emits next to the sweeps
    (pre_analysis.py:376-434): the serving-dtype cast ("original") and a
    uniform linear-8-bit weight quantization.  Sweep numbers only mean
    something relative to these."""
    import jax.numpy as jnp

    if paths is None:
        paths = palettizable_paths(params)
    ref = np.asarray(run_fn(params))

    def cast_leaf(x):
        if hasattr(x, "astype") and np.asarray(x).dtype.kind == "f":
            return np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))
        return x

    bf16 = jax.tree.map(cast_leaf, params)
    out = {"serving_bf16": round(compute_psnr(
        np.asarray(run_fn(bf16)), ref), 2)}

    q = params
    for p in paths:
        q = _set(q, p, _linear_quantize_int8(np.asarray(_get(q, p))))
    out["linear_8bit"] = round(compute_psnr(np.asarray(run_fn(q)), ref), 2)
    return out


def recipe_estimated_psnr(recipe: dict, single_layer: dict) -> float:
    """Conservative quality proxy for a recipe: the worst single-layer PSNR
    among the chosen bit widths (the cumulative sweep gives the measured
    number; this reads directly off the single-layer analysis)."""
    worst = float("inf")
    for key, nbits in recipe.items():
        if nbits >= 16:
            continue
        worst = min(worst, single_layer[key][str(nbits)])
    return worst if worst != float("inf") else 999.0


def mbp_report_rows(single_layer: dict, recipes: dict, params,
                    baselines: dict | None = None) -> dict:
    """Machine-readable size/quality tradeoff data — the (size, PSNR)
    series behind the reference's matplotlib plot
    (pre_analysis.py:376-434), as JSON-ready rows so the curve can be
    reproduced downstream."""
    total = sum(int(np.prod(np.asarray(_get(params, tuple(k.split("/")))
                                       ).shape)) for k in single_layer)
    rows = []
    for name, recipe in sorted(recipes.items()):
        bits = recipe_average_bits(recipe, params)
        rows.append({
            "recipe": name,
            "avg_bits": round(bits, 3),
            "size_mb": round(total * bits / 8 / 2**20, 2),
            "estimated_psnr_db": round(
                recipe_estimated_psnr(recipe, single_layer), 2),
        })
    return {
        "rows": rows,
        "baselines": dict(baselines or {}),
        "analyzed_layers": len(single_layer),
        "total_weights": total,
    }


def mbp_report(single_layer: dict, recipes: dict, params,
               baselines: dict | None = None) -> str:
    """Human-readable size/quality tradeoff report (markdown).

    The reference renders a PSNR-vs-size matplotlib plot
    (pre_analysis.py:501-507); the same decision data lands here as a table
    (no plotting dependency in the serving image).  For the raw series use
    ``mbp_report_rows`` (CLI: ``mbp-report --output-json``)."""
    data = mbp_report_rows(single_layer, recipes, params, baselines)
    lines = ["# Mixed-bit palettization report", ""]
    if baselines:
        lines += ["Baselines: " + ", ".join(
            f"{k} = {v} dB" for k, v in baselines.items()), ""]
    lines += [
        "| recipe | avg bits | est. payload (MB) | worst single-layer PSNR (dB) |",
        "|---|---|---|---|",
    ]
    for row in data["rows"]:
        lines.append(f"| {row['recipe']} | {row['avg_bits']:.2f} | "
                     f"{row['size_mb']:.1f} | "
                     f"{row['estimated_psnr_db']:.1f} |")
    lines.append("")
    lines.append(f"(analyzed layers: {data['analyzed_layers']}, "
                 f"{data['total_weights'] / 1e6:.1f}M weights; payload at "
                 "fp16-equivalent storage for unpalettized layers)")
    return "\n".join(lines)


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
