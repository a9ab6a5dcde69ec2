"""Palettized (LUT-compressed) weight serving.

The ANE decompresses palettized weights on the fly (reference README.md:165).
TPU implementations here, in measured-preference order:

- ``palettized_dense_fused``: Pallas kernel — uint8 indices + LUT stay in
  HBM, each weight TILE is expanded in VMEM by a select-sum over the (small)
  LUT fused into the matmul's K-loop.  MEASURED (v5e, 8192x1280x1280 @6-bit,
  amortized): 34.0 TFLOP/s vs 58.4 dense bf16 — the VPU select-sum
  (2^nbits passes per weight element, ~0.95 T op/s) costs ~330 us/matmul
  while the weight-traffic it saves is ~4 us; at serving batch sizes the
  matmul is compute-bound, so fused dequant cannot pay on this chip.
  Kept with interpret-mode tests as the reference implementation for future
  hardware with faster vector gathers.
- ``palettized_dense``: XLA gather + matmul.  Per-element ``jnp.take``
  dequant of a full UNet measured ~50x too slow on TPU (BENCH r2: 1.11 vs
  53.4 iter/s).

CONCLUSION (measured, r2): compressed-in-HBM palettized serving loses in
every form on v5e; install-time dequant (pipelines install_palettized) is
the production design — disk artifacts stay (16/nbits)x smaller, HBM holds
dense bf16 at full speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _dequant_matmul_kernel(x_ref, idx_ref, lut_ref, o_ref, acc_ref, *,
                           n_lut):
    """One (k) step of y = x @ lut[idx]: expand the (bk, bn) index tile via
    VPU select-sum over the LUT (n_lut passes — ~1% of the tile's MXU work;
    per-element gather is ~50x slower on TPU), then accumulate the matmul."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    idx = idx_ref[:].astype(jnp.int32)  # (bk, bn)

    def body(c, w):
        return w + jnp.where(idx == c, lut_ref[c], 0.0)

    w = jax.lax.fori_loop(0, n_lut, body,
                          jnp.zeros(idx.shape, jnp.float32))
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w.astype(x_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _finalize():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_lut", "block_k", "block_n",
                                    "interpret"))
def _dequant_matmul(x, idx, lut, n_lut: int, block_k: int = 512,
                    block_n: int = 256, interpret: bool = False):
    """x (M, K) @ lut[idx (K, N)] -> (M, N).  idx uint8 (unpacked), lut
    padded to n_lut.  The M axis stays whole per block (the weight tile is
    dequantized once per (n, k) grid cell — an m-axis grid would redo it)."""
    M, K = x.shape
    K2, N = idx.shape
    assert K == K2, (x.shape, idx.shape)
    bk = min(block_k, K)
    while K % bk:
        bk //= 2
    bn = min(block_n, N)
    while N % bn:
        bn //= 2
    grid = (N // bn, K // bk)

    return pl.pallas_call(
        functools.partial(_dequant_matmul_kernel, n_lut=n_lut),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, bk), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # whole-M x/acc/out blocks exceed the 16MB default scoped budget
            # (M=8192: 8+8+4MB); v5e VMEM is 128MB
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, idx, lut)


def palettized_dense_fused(x, indices, lut, shape, bias=None,
                           interpret: bool = False):
    """Fused dequant-matmul: x (..., K) @ lut[indices].reshape(K, N).

    ``indices`` uint8 flat (unpacked); weights stay compressed in HBM and
    are expanded tile-by-tile in VMEM inside the kernel.
    """
    K, N = shape
    lead = x.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    n_lut = int(lut.shape[0])
    idx2d = indices.reshape(K, N)
    y = _dequant_matmul(x.reshape(M, K), idx2d, lut.astype(jnp.float32),
                        n_lut, interpret=interpret)
    y = y.reshape(*lead, N)
    if bias is not None:
        y = y + bias
    return y


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
