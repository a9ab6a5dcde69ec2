"""Reproducible random sources for initial latents.

The reference supports three bit-exact RNG streams so that a given seed
reproduces outputs from other ecosystems (reference
swift/StableDiffusion/pipeline/{NumPyRandomSource,TorchRandomSource,
NvRandomSource}.swift and StableDiffusionPipeline.swift:21-28):

- ``numpy``:  NumPy legacy ``RandomState`` (MT19937 + cached-polar gauss)
- ``torch``:  torch CPU generator (MT19937 + vectorized Box-Muller)
- ``nvidia``: CUDA curand Philox4x32-10 + Box-Muller

On TPU, initial latents are tiny (B,4,H/8,W/8) so generating them host-side
and feeding them into the jitted program costs nothing; the default ``jax``
mode instead threads a `jax.random` key through the compiled program (fastest
and natively parallel).  All host sources return float32 numpy arrays shaped
like torch's default NCHW latents; layout conversion happens at the pipeline
boundary.
"""

from __future__ import annotations

from typing import Protocol, Sequence

import numpy as np


class RandomSource(Protocol):
    """A stream of standard-normal samples (matches the reference's
    RandomSource.swift protocol: nextNormal / normalShapedArray)."""

    def normal(self, shape: Sequence[int]) -> np.ndarray: ...


class JaxRandomSource:
    """Native mode: draws via `jax.random` with a fold_in call counter.

    Not bit-compatible with any other ecosystem; it is the fast default and
    the only mode usable *inside* a jitted program.
    """

    def __init__(self, seed: int):
        import jax

        self._key = jax.random.key(seed)
        self._counter = 0

    def next_key(self):
        import jax

        self._counter += 1
        return jax.random.fold_in(self._key, self._counter)

    def normal(self, shape: Sequence[int]) -> np.ndarray:
        import jax

        return np.asarray(jax.random.normal(self.next_key(), tuple(shape), dtype=np.float32))


class NumpyRandomSource:
    """Bit-exact NumPy legacy RandomState stream.

    The reference reimplements MT19937 + the cached polar Box-Muller in Swift
    (NumPyRandomSource.swift:40-102); here the genuine article is available.
    """

    def __init__(self, seed: int):
        self._state = np.random.RandomState(seed)

    def normal(self, shape: Sequence[int]) -> np.ndarray:
        return self._state.standard_normal(tuple(shape)).astype(np.float32)


class TorchRandomSource:
    """Bit-exact torch CPU generator stream (reference TorchRandomSource.swift).

    torch is an optional dependency; only imported when this mode is chosen.
    """

    def __init__(self, seed: int):
        import torch

        self._torch = torch
        self._gen = torch.Generator(device="cpu").manual_seed(seed)

    def normal(self, shape: Sequence[int]) -> np.ndarray:
        return self._torch.randn(tuple(shape), generator=self._gen, dtype=self._torch.float32).numpy()


# --- Philox4x32-10 (curand-compatible counter-based generator) ---------------

_PHILOX_M0 = np.uint64(0xD2511F53)
_PHILOX_M1 = np.uint64(0xCD9E8D57)
_PHILOX_W0 = np.uint32(0x9E3779B9)
_PHILOX_W1 = np.uint32(0xBB67AE85)


def _philox4x32_10(counter: np.ndarray, key: np.ndarray) -> np.ndarray:
    """Vectorized Philox4x32-10. counter: (n,4) uint32, key: (2,) uint32.

    Returns (n,4) uint32 random blocks.  Algorithm per the Philox paper
    (Salmon et al., SC'11), matching the reference's NvRandomSource.swift:24-53.
    """
    c0 = counter[:, 0].astype(np.uint64)
    c1 = counter[:, 1].astype(np.uint64)
    c2 = counter[:, 2].astype(np.uint64)
    c3 = counter[:, 3].astype(np.uint64)
    k0 = int(key[0])
    k1 = int(key[1])
    mask32 = 0xFFFFFFFF
    for _ in range(10):
        p0 = _PHILOX_M0 * c0
        p1 = _PHILOX_M1 * c2
        hi0 = (p0 >> np.uint64(32)).astype(np.uint32)
        lo0 = p0.astype(np.uint32)
        hi1 = (p1 >> np.uint64(32)).astype(np.uint32)
        lo1 = p1.astype(np.uint32)
        n0 = hi1 ^ c1.astype(np.uint32) ^ np.uint32(k0)
        n1 = lo1
        n2 = hi0 ^ c3.astype(np.uint32) ^ np.uint32(k1)
        n3 = lo0
        c0, c1, c2, c3 = (n0.astype(np.uint64), n1.astype(np.uint64),
                          n2.astype(np.uint64), n3.astype(np.uint64))
        k0 = (k0 + int(_PHILOX_W0)) & mask32
        k1 = (k1 + int(_PHILOX_W1)) & mask32
    return np.stack([c0, c1, c2, c3], axis=1).astype(np.uint32)


class PhiloxRandomSource:
    """curand-style Philox4x32-10 + Box-Muller normal stream.

    Mirrors the reference's NvRandomSource.swift: key = (seed lo32, seed hi32),
    the counter's high word carries a per-call offset (:65-79), and each
    4-lane block yields 4 normals via two Box-Muller pairs (:55-63).
    """

    def __init__(self, seed: int):
        seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self._key = np.array([seed & 0xFFFFFFFF, seed >> 32], dtype=np.uint32)
        self._offset = 0

    @staticmethod
    def _box_muller(u: np.ndarray) -> np.ndarray:
        """(n,4) uint32 -> (n,4) float32 normals, curand pairing."""
        # curand maps uint32 -> (0,1] via (x+1) * 2^-32
        f = (u.astype(np.float64) + 1.0) * (2.0 ** -32)
        r01 = np.sqrt(-2.0 * np.log(f[:, 0]))
        r23 = np.sqrt(-2.0 * np.log(f[:, 2]))
        t01 = 2.0 * np.pi * f[:, 1]
        t23 = 2.0 * np.pi * f[:, 3]
        out = np.empty_like(f)
        out[:, 0] = r01 * np.sin(t01)
        out[:, 1] = r01 * np.cos(t01)
        out[:, 2] = r23 * np.sin(t23)
        out[:, 3] = r23 * np.cos(t23)
        return out.astype(np.float32)

    def normal(self, shape: Sequence[int]) -> np.ndarray:
        n = int(np.prod(shape)) if len(shape) else 1
        nblocks = -(-n // 4)
        counter = np.zeros((nblocks, 4), dtype=np.uint32)
        idx = np.arange(nblocks, dtype=np.uint64)
        counter[:, 0] = (idx & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        counter[:, 1] = (idx >> np.uint64(32)).astype(np.uint32)
        counter[:, 2] = np.uint32(self._offset & 0xFFFFFFFF)
        counter[:, 3] = np.uint32(self._offset >> 32)
        self._offset += 1
        blocks = _philox4x32_10(counter, self._key)
        return self._box_muller(blocks).reshape(-1)[:n].reshape(tuple(shape))


_SOURCES = {
    "jax": JaxRandomSource,
    "numpy": NumpyRandomSource,
    "torch": TorchRandomSource,
    "nvidia": PhiloxRandomSource,
}


def make_random_source(kind: str, seed: int) -> RandomSource:
    """Factory matching the reference's --rng {numpy,torch,nvidia} flag
    (main.swift:48), plus the native 'jax' mode."""
    try:
        return _SOURCES[kind](seed)
    except KeyError:
        raise ValueError(f"unknown rng kind {kind!r}; expected one of {sorted(_SOURCES)}")
