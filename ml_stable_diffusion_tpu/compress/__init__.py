from .palettize import (
    NBITS,
    PALETTIZE_MIN_SIZE,
    palettize_tree,
    dequantize_tree,
    palettize_weights,
)
from .mixed_bit import build_recipe, apply_recipe, benchmark_signal_integrity

__all__ = [
    "NBITS",
    "PALETTIZE_MIN_SIZE",
    "palettize_tree",
    "dequantize_tree",
    "palettize_weights",
    "build_recipe",
    "apply_recipe",
    "benchmark_signal_integrity",
]
