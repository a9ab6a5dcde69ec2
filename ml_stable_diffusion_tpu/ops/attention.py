"""Attention dispatch.

The reference ships three interchangeable attention implementations tuned for
the ANE's memory constraints (attention.py:24-168: ORIGINAL batched einsums,
SPLIT_EINSUM per-head, SPLIT_EINSUM_V2 with 512-wide query chunking).  On TPU
those constraints do not exist; all three collapse into one of:

- ``XLA``:   einsum + fp32 softmax — XLA fuses this well for moderate seqs.
- ``FLASH``: blockwise Pallas flash-attention kernel (ops/flash_attention.py)
  for the large self-attention seqs (4096+ at 512x512 latents).
- ``AUTO``:  picks FLASH on TPU when shapes qualify, else XLA.

All paths take (B, S, H, D) tensors and return the same, bit-compatible to
each other within dtype tolerance (the reference's PSNR-equivalence contract
between its three variants).
"""

from __future__ import annotations

import enum
import functools
import os

import jax
import jax.numpy as jnp

#: flash dispatch threshold on KV length (ablation knob; see _flash_qualifies)
_FLASH_MIN_SK = int(os.environ.get("SDTPU_FLASH_MIN_SK", 256))


class AttentionImpl(str, enum.Enum):
    AUTO = "auto"
    XLA = "xla"
    FLASH = "flash"


#: process-wide default used by AUTO callers — the TPU analog of the
#: reference's module-level ATTENTION_IMPLEMENTATION_IN_EFFECT switch
#: (unet.py:42, set by torch2coreml.py:1527 / --attention-implementation).
ATTENTION_IMPLEMENTATION_IN_EFFECT = AttentionImpl.AUTO


def set_attention_implementation(impl: AttentionImpl | str):
    global ATTENTION_IMPLEMENTATION_IN_EFFECT
    ATTENTION_IMPLEMENTATION_IN_EFFECT = AttentionImpl(impl)


def _xla_attention(q, k, v, bias=None, causal=False):
    B, Sq, H, D = q.shape
    scale = D ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        Sk = k.shape[1]
        mask = jnp.tril(jnp.ones((Sq, Sk), dtype=bool), k=Sk - Sq)
        # -1e4 (not -inf) for fp16-family parity with the reference's patched
        # causal mask (torch2coreml.py:363-377)
        logits = jnp.where(mask, logits, jnp.float32(-1e4))
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _flash_qualifies(q, k) -> bool:
    if jax.default_backend() != "tpu":
        return False
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    # Short-KV cross attention (77 text tokens) measures FASTER on the XLA
    # path: the flash kernel's per-tile overhead + BSHD->BHSD layout copies
    # outweigh the saved logits traffic at Sk<=128 (bench.py ablations: 45.4
    # vs 47.5 r1, re-measured 51.9 vs 54.3 r2 with the matmul-normalizer
    # kernel — SDTPU_FLASH_MIN_SK=77).  Ragged Sq is fine — the wrapper
    # pads the query axis (MMDiT joint attention, 4096+154 rows).  D up to
    # 512 covers the VAE's single-head spatial attention (the wrapper picks
    # VMEM-safe tiles per head width).
    return Sq >= 256 and D <= 512 and Sk >= _FLASH_MIN_SK


def dot_product_attention(q, k, v, bias=None, causal=False,
                          impl: AttentionImpl | str = AttentionImpl.AUTO):
    """Multi-head attention over (B, S, H, D) tensors.

    ``bias`` is an additive (B or 1, H or 1, Sq, Sk) mask/bias.
    """
    impl = AttentionImpl(impl)
    if impl == AttentionImpl.AUTO:
        impl = ATTENTION_IMPLEMENTATION_IN_EFFECT
    if impl == AttentionImpl.AUTO:
        impl = AttentionImpl.FLASH if _flash_qualifies(q, k) else AttentionImpl.XLA
    if impl == AttentionImpl.FLASH:
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, bias=bias, causal=causal)
    return _xla_attention(q, k, v, bias=bias, causal=causal)


def joint_dot_product_attention(q_streams, k, v,
                                impl: AttentionImpl | str = AttentionImpl.AUTO):
    """Joint attention: several query streams over ONE shared (B, Sk, H, D)
    KV (MMDiT latent+context joint attention).  Returns one output per
    stream — semantically identical to concatenating the streams along the
    sequence axis, attending, and splitting, but the flash path packs KV
    once and keeps each stream's tile padding exact
    (ops/flash_attention.flash_attention_multi_q)."""
    impl = AttentionImpl(impl)
    if impl == AttentionImpl.AUTO:
        impl = ATTENTION_IMPLEMENTATION_IN_EFFECT
    if impl == AttentionImpl.AUTO:
        impl = (AttentionImpl.FLASH
                if _flash_qualifies(q_streams[0], k) else AttentionImpl.XLA)
    if impl == AttentionImpl.FLASH:
        from .flash_attention import flash_attention_multi_q

        return flash_attention_multi_q(q_streams, k, v)
    q = jnp.concatenate(q_streams, axis=1)
    out = _xla_attention(q, k, v)
    sizes = [s.shape[1] for s in q_streams]
    splits = []
    off = 0
    for s in sizes:
        splits.append(out[:, off:off + s])
        off += s
    return splits
