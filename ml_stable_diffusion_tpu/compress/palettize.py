"""K-means weight palettization.

TPU-native replacement for the reference's coremltools palettization
(quantize_weights torch2coreml.py:182-230: k-means ``OpPalettizerConfig`` with
{1,2,4,6,8}-bit LUTs, skipping embedding/gather ops :218-221; and
fake_palettize in mixed_bit_compression_pre_analysis.py:139-192).

Each palettized tensor is stored as (uint8 indices, float32 LUT of 2^nbits
centroids).  1-D k-means runs as vectorized Lloyd iterations under jit —
fast on TPU even for the 1280x1280 SDXL projections.  Dequantization is a
LUT gather; ops/palettized.py fuses it into the matmul for serving.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

#: reference pre_analysis.py:27
NBITS = (1, 2, 4, 6, 8)
#: do not palettize tensors smaller than this (reference pre_analysis.py:31)
PALETTIZE_MIN_SIZE = 100_000


@dataclasses.dataclass
class PalettizedTensor:
    indices: np.ndarray  # uint8, flat
    lut: np.ndarray      # float32 (2**nbits,)
    shape: tuple[int, ...]
    nbits: int

    @property
    def compressed_bytes(self) -> int:
        return int(np.prod(self.shape)) * self.nbits // 8 + self.lut.nbytes

    def dequantize(self) -> np.ndarray:
        return self.lut[self.indices].reshape(self.shape).astype(np.float32)


def _lloyd_step(centroids, x):
    """One Lloyd iteration for 1-D k-means without the NxK distance matrix:
    sort centroids, bucketize by midpoints, segment-mean.  O(N log K)."""
    k = centroids.shape[0]
    c = jnp.sort(centroids)
    mid = (c[1:] + c[:-1]) / 2
    assign = jnp.searchsorted(mid, x)
    sums = jax.ops.segment_sum(x, assign, num_segments=k)
    counts = jax.ops.segment_sum(jnp.ones_like(x), assign, num_segments=k)
    return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), c)


@jax.jit
def _lloyd_iters(centroids, x):
    return jax.lax.fori_loop(0, 12, lambda _, c: _lloyd_step(c, x), centroids)


def _kmeans_1d(x: np.ndarray, k: int) -> np.ndarray:
    """-> sorted centroids (k,).  Quantile init (robust + fast, the standard
    init for 1-D weight palettization)."""
    xj = jnp.asarray(x, jnp.float32)
    qs = np.linspace(0, 1, k)
    centroids = jnp.asarray(np.quantile(x, qs).astype(np.float32))
    centroids = _lloyd_iters(centroids, xj)
    return np.sort(np.asarray(centroids))


def palettize_array(w: np.ndarray, nbits: int) -> PalettizedTensor:
    flat = np.asarray(w, np.float32).ravel()
    k = 2 ** nbits
    if flat.size <= k:
        lut = np.pad(flat, (0, k - flat.size)).astype(np.float32)
        return PalettizedTensor(np.arange(flat.size, dtype=np.uint8), lut,
                                tuple(w.shape), nbits)
    # subsample very large tensors for centroid fitting (k-means cost control)
    fit = flat if flat.size <= 1 << 22 else np.random.RandomState(0).choice(
        flat, 1 << 22, replace=False)
    lut = _kmeans_1d(fit, k)
    # assign all weights to nearest centroid (vectorized via searchsorted)
    mid = (lut[1:] + lut[:-1]) / 2
    assign = np.searchsorted(mid, flat).astype(np.uint8)
    return PalettizedTensor(assign, lut.astype(np.float32), tuple(w.shape), nbits)


def _eligible(path_names: tuple[str, ...], leaf, min_size: int) -> bool:
    # only matmul/conv kernels; embedding tables are gather operands and the
    # reference skips those (torch2coreml.py:218-221)
    if path_names[-1] != "kernel":
        return False
    return int(np.prod(leaf.shape)) >= min_size


def palettize_tree(params, nbits: int, min_size: int = PALETTIZE_MIN_SIZE,
                   should_palettize: Callable | None = None):
    """params pytree -> (pytree with PalettizedTensor leaves where eligible,
    stats dict)."""
    stats = {"palettized": 0, "skipped": 0, "orig_bytes": 0, "new_bytes": 0}

    def visit(path, leaf):
        names = tuple(p.key for p in path if hasattr(p, "key"))
        leaf_np = np.asarray(leaf)
        nbytes = leaf_np.size * 2  # fp16/bf16 storage baseline
        stats["orig_bytes"] += nbytes
        eligible = (_eligible(names, leaf_np, min_size)
                    if should_palettize is None else
                    should_palettize(names, leaf_np))
        if not eligible:
            stats["skipped"] += 1
            stats["new_bytes"] += nbytes
            return leaf
        pt = palettize_array(leaf_np, nbits)
        stats["palettized"] += 1
        stats["new_bytes"] += pt.compressed_bytes
        return pt

    out = jax.tree_util.tree_map_with_path(visit, params)
    return out, stats


def dequantize_tree(tree):
    """Inverse of palettize_tree: materialize dense float32 params."""
    return jax.tree.map(
        lambda l: l.dequantize() if isinstance(l, PalettizedTensor) else l,
        tree, is_leaf=lambda l: isinstance(l, PalettizedTensor))


def palettize_weights(params, nbits: int, min_size: int = PALETTIZE_MIN_SIZE):
    """Global palettize -> dense fake-quantized params + stats (the reference's
    --quantize-nbits path, torch2coreml.py:1592)."""
    tree, stats = palettize_tree(params, nbits, min_size)
    return dequantize_tree(tree), stats


# -- compressed serving ---------------------------------------------------------
#
# The ANE executes palettized models by decompressing weights on the fly
# (reference README.md:165).  The TPU analog: HBM holds uint8 indices + the
# LUT; the jitted program expands them ONCE at entry (a LUT gather), so the
# dense tensors exist only as in-program values.  Disk artifacts bit-pack the
# indices (ops/palettized.pack_bits) for the full ~(16/nbits)x size win.


def split_palettized_tree(tree):
    """Tree with PalettizedTensor leaves -> (dense_rest, side, meta).

    ``dense_rest``: the tree with palettized leaves REMOVED (re-inserted by
    ``materialize_palettized`` inside the program).
    ``side``: {path: {"idx": uint8, "lut": float32}} — a jit-argument pytree.
    ``meta``: {path: (shape, nbits)} — static, kept on the host object.
    """
    side, meta = {}, {}

    def walk(node, prefix):
        if isinstance(node, PalettizedTensor):
            path = "/".join(prefix)
            side[path] = {"idx": np.asarray(node.indices, np.uint8),
                          "lut": np.asarray(node.lut, np.float32)}
            meta[path] = (tuple(node.shape), node.nbits)
            return None
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                r = walk(v, prefix + (k,))
                if r is not None:
                    out[k] = r
            return out
        return node

    dense = walk(tree, ())
    return dense or {}, side, meta


def materialize_palettized(dense, side, meta, dtype=None):
    """Re-insert dequantized palettized tensors into ``dense`` (traceable —
    call INSIDE the jitted program so dense weights never live in HBM
    between invocations)."""
    import jax

    out = jax.tree.map(lambda x: x, dense)  # shallow structural copy
    for path, arrs in side.items():
        shape, _nbits = meta[path]
        w = jnp.take(arrs["lut"], arrs["idx"].astype(jnp.int32)).reshape(shape)
        if dtype is not None:
            w = w.astype(dtype)
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = w
    return out
