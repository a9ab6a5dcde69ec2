"""Palettized (LUT-compressed) weight serving.

The ANE decompresses palettized weights on the fly (reference README.md:165);
the TPU analog keeps indices (uint8 / packed uint4) + LUT in HBM and expands
through the LUT on load.  XLA fuses the small-table gather with the consumer
matmul's operand fetch; a dedicated Pallas dequant-matmul is a planned
optimization for the bandwidth-bound decode path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_bits(indices: np.ndarray, nbits: int) -> np.ndarray:
    """uint8 indices < 2^nbits -> dense little-endian bitstream (uint8).
    Exact nbits/8 bytes per index (+padding to a byte boundary) — the on-disk
    artifact format (the analog of the reference's palettized .mlpackage
    weight blobs, torch2coreml.py:182-230)."""
    idx = np.asarray(indices, np.uint8).ravel()
    bits = np.unpackbits(idx[:, None], axis=1, bitorder="little")[:, :nbits]
    return np.packbits(bits.ravel(), bitorder="little")


def unpack_bits(packed: np.ndarray, nbits: int, count: int) -> np.ndarray:
    """Inverse of pack_bits -> uint8 indices (count,)."""
    bits = np.unpackbits(np.asarray(packed, np.uint8), bitorder="little")
    bits = bits[: count * nbits].reshape(count, nbits)
    out = np.zeros(count, np.uint8)
    for b in range(nbits):
        out |= (bits[:, b] << b).astype(np.uint8)
    return out


def pack_4bit(indices: np.ndarray) -> np.ndarray:
    """uint8 values < 16, even length -> packed uint8 (two nibbles each)."""
    flat = indices.ravel()
    if flat.size % 2:
        flat = np.pad(flat, (0, 1))
    return (flat[0::2] | (flat[1::2] << 4)).astype(np.uint8)


def unpack_4bit(packed, n: int):
    lo = packed & 0xF
    hi = packed >> 4
    out = jnp.stack([lo, hi], axis=1).reshape(-1)
    return out[:n]


def palettized_dense(x, indices, lut, shape, bias=None):
    """x (..., K) @ dequant(indices -> lut).reshape(K, N).

    ``indices`` uint8 flat (or 4-bit packed when lut has <=16 entries and
    indices.size*2 >= prod(shape)); ``lut`` (2^n,) float.
    """
    n = int(np.prod(shape))
    idx = indices
    if indices.size < n:  # 4-bit packed
        idx = unpack_4bit(indices, n)
    w = jnp.take(lut, idx.astype(jnp.int32)).reshape(shape)
    y = x @ w.astype(x.dtype)
    if bias is not None:
        y = y + bias
    return y
