"""Blockwise flash attention as a Pallas TPU kernel.

This one kernel subsumes the reference's three ANE attention variants
(attention.py:24-168) — in particular SPLIT_EINSUM_V2's 512-wide query
chunking (attention.py:75-144) becomes blockwise online-softmax iteration
over KV tiles, which bounds intermediates to VMEM instead of ANE SRAM.

Two shapes matter in diffusion:
- self-attention: Sq == Sk in {256..4096}, iterated KV tiles;
- cross-attention: Sk == 77 text tokens — KV pads to one 128-wide tile with
  in-kernel masking, so the softmax never touches HBM (the XLA path
  materializes (B, H, Sq, Sk) fp32 logits, which at 4096x77x20 heads is the
  single largest HBM-traffic term in the SD UNet step).

Standard flash algorithm: for each query tile, iterate over KV tiles
accumulating (m, l, acc) running max / normalizer / weighted values; logits
and accumulation in fp32 (MXU `preferred_element_type`), the p@v matmul in
the input dtype.  Diffusion self/cross attention is unmasked (beyond KV
padding), so no causal path is needed here — causal text encoding (77
tokens) stays on the XLA path, far below flash break-even.

Measured ablations (r2, don't redo):
- jax.experimental.pallas.ops.tpu.flash_attention at SD shapes is 4-9x
  SLOWER than this kernel ((2,4096,5,64): 4887 us vs 1137; (2,1024,10,64):
  1099 vs ~250 wrapper-inclusive) — its causal-capable segment machinery
  isn't free at D=64 diffusion shapes.
- A "packed" head-indexed dispatch (BlockSpec (1, bq, D) blocks at lane
  offset h*D over (B, S, H*D), eliminating the ~0.3 ms/step of BSHD->BHSD
  repack copies) is REJECTED by Mosaic: last-dim blocks must be 128-divisible
  or span the full dim, and D=64 on a 320-wide array is neither.  The
  in-kernel head-loop alternative (full-lane blocks + per-head lane slices)
  would trade those copies for per-access relayouts; not attempted.
- The custom call itself runs at ~80 TFLOP/s (r2 trace: 43 GFLOP in 539 us
  at (2,4096,5,64)) against a ~98 TFLOP/s ceiling set by D=64 half-filling
  the MXU K/N dims — tile sweeps are within noise of that ceiling.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

#: ablation knob: compute the exponent pass on bf16 vregs (2 lanes/slot —
#: the (Bq, Bk) transcendental pass at twice the VPU rate).  Measured
#: NEUTRAL on the headline bench (54.39 vs 54.32-54.55 iter/s, SD-2.1 512²):
#: the UNet step is conv-emitter-bound, not attention-VPU-bound.  Off by
#: default; exp2 stays in f32 which is also numerically safer near m_new.
_EXP_BF16 = os.environ.get("SDTPU_FLASH_EXP_BF16", "0") == "1"


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref, *,
                  scale, d_out):
    """Online-softmax tile, three VPU-economies vs the textbook form:

    - base-2 softmax: the logit scale folds log2(e) in, so the exponent is
      a raw ``exp2`` and the per-element multiply by 1/ln2 disappears from
      the (Bq, Bk) tile (the reference uses the same exp2 trick for its
      quantization-friendly softmax, attention.py:9-21);
    - the softmax normalizer rides the PV matmul as an extra ones-column of
      V (D 64 -> 65 stays inside one 128-wide MXU pass), replacing a
      full-tile VPU row-sum with a free MXU column — and making the
      normalizer numerically consistent with the numerator (both sum the
      SAME bf16-rounded probabilities);
    - the ones-column IS the KV-padding mask: the wrapper zeroes it (and V)
      on padded rows, so padded columns contribute exactly 0 to numerator
      AND normalizer — no in-kernel iota/compare/select.  The old explicit
      mask ran 3 extra VPU passes over EVERY (Bq, Bk) tile (~3 us/tile at
      1024x1024 — comparable to the tile's matmul time at D=64, measured
      r3).  Padded K rows are zero, so their logit is 0; the running max
      therefore never drops below 0, which only tightens the exp2 shift —
      the shift cancels exactly in the final acc/normalizer ratio, so the
      result is bit-comparable (f32 max-shift invariance) to the masked
      form for any real logit above exp2 underflow (~-126).
    """
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]  # (Bk, D+1): last column is ones / 0 on padded rows

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (Bq, Bk), base-2 logits

    m_prev = m_ref[:, 0:1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    if _EXP_BF16 and v.dtype == jnp.bfloat16:
        # exponent on bf16 vregs (2 lanes/slot): the (Bq, Bk) transcendental
        # pass at twice the rate; p is rounded to bf16 for the MXU anyway
        p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
    else:
        p = jnp.exp2(s - m_new).astype(v.dtype)
    correction = jnp.exp2(m_prev - m_new)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    pv = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Bq, D+1): [:, D] = sum(p)
    acc_ref[:] = correction * acc_ref[:] + pv

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:, :d_out]
                    / acc_ref[:, d_out:d_out + 1]).astype(o_ref.dtype)


def _choose_tile(s: int, cap: int):
    """Fewest-tiles 128-multiple block under ``cap`` -> (block, padded_len).

    The padded length is the 128 lane quantum rounded up to the tile count —
    NOT to a power-of-two tile — so ragged sequences pad by at most one
    128-row quantum per tile.  Tiles are any multiple of 128 (Mosaic only
    needs sublane×lane alignment), which is what makes this exact: the
    MMDiT joint-attention KV axis (4096 latent + 154 context = 4250 rows,
    padded128 = 4352 = 34×128) tiles as 2×2176 with the SAME +2.4% pad a
    256-tile layout pays, where power-of-two tiles must choose between
    256×17 (tiny tiles) and 1024×5 (+20% FLOPs).  Measured on-chip at that
    shape (B2 H24 D64, r3, production multi-q dispatch, ~75 ms host-sync
    floor shared by every row): bk 2176/pad 4352 78.2-78.9 ms, 1024/5120
    79.7, 512/4608 80.6, XLA 97.7 — and the earlier power-of-two sweep
    (256x256 46.4 / 512x512 44.8 / 1024x1024 42.8 / 1024x2048 43.8 ms on a
    ~40 ms floor) showing tile size dominating pad waste up to ~1/4.
    Exact-multiple shapes are unchanged: 4096 under cap 2304 -> 2×2048,
    under cap 1024 -> 4×1024; 77 -> 1×128.  Caps come from
    ``_default_tiles`` (VMEM: the f32 logits tile is bq×bk×4 bytes)."""
    padded128 = -(-s // 128) * 128
    n = 1
    while True:
        b = -(-padded128 // (128 * n)) * 128
        if b <= cap:
            return b, n * b
        n += 1


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret"))
def _flash_bhsd(q, k, v, block_q: int, block_k: int,
                interpret: bool = False):
    """q (BH, Sq, D), k (BH, Sk_padded, D), v (BH, Sk_padded, D+1) with a
    trailing ones-column that is ZERO on padded KV rows (the mask — see
    ``_flash_kernel``) -> (BH, Sq, D).

    ``interpret=True`` runs the kernel through the Pallas interpreter
    (CPU-testable: the online-softmax logic is executed line by
    line without a TPU)."""
    BH, Sq, D = q.shape
    Sk = k.shape[1]
    Dv = v.shape[2]  # D + 1 (ones column)
    scale = D ** -0.5 * 1.4426950408889634  # fold log2(e): base-2 softmax
    grid = (BH, Sq // block_q, Sk // block_k)

    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, d_out=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Dv), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Sq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max (base 2)
            pltpu.VMEM((block_q, Dv), jnp.float32),   # output + normalizer
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)


#: tile sizes, env-tunable for sweeps.  r2 sweep on the matmul-normalizer
#: kernel (SD-2.1 512^2 iter/s): 1024/2048 = 54.55, 2048/1024 = 54.51,
#: 1024/1024 = 54.22, 512/4096 = 53.72 (r1: 1024x1024 beat 512x512 by 12%)
_DEFAULT_BQ = int(os.environ.get("SDTPU_FLASH_BQ", 1024))
_DEFAULT_BK = int(os.environ.get("SDTPU_FLASH_BK", 2304))


def _default_tiles(D: int):
    """Tile CAPS (fed to ``_choose_tile``) scale down with head width to
    stay inside the ~16 MB VMEM budget: transformer heads (D=64) allow up
    to 1024×2304 (f32 logits tile 9.4 MB; 4096-row self-attention lands on
    the tuned 1024×2048, the ragged 4250-row joint-attention KV on 2×2176
    — both measured, see ``_choose_tile``); the VAE's single-head D=512
    spatial attention (16384 tokens at 1024x1024 decode — the XLA path
    would materialize a 1 GiB fp32 logits tensor) caps at 256x1024."""
    if D > 256:
        return 256, 1024
    if D > 64:
        return 512, 1024
    return _DEFAULT_BQ, _DEFAULT_BK


def _tile(s, explicit, default):
    """Default tiles go through _choose_tile (bounded pad waste); EXPLICIT
    tiles are honored exactly (sweep/ablation callers), padding up to their
    multiple."""
    if explicit is None:
        return _choose_tile(s, default)
    b = min(explicit, -(-s // 128) * 128)
    return b, -(-s // b) * b


def _pack_kv(k, v, block_k, dk):
    """(B, Sk, H, D) k/v -> BHSD-packed (B*H, Sk_padded, D) k and
    (B*H, Sk_padded, D+1) v whose trailing ones-column is ZERO on padded
    rows — the normalizer column doubles as the KV mask (see
    ``_flash_kernel``).  Padded K rows are zero (logit exactly 0)."""
    B, Sk, H, D = k.shape
    bk, sk_padded = _tile(Sk, block_k, dk)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, Sk, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, Sk, D)
    # ones column rides the PV matmul as the softmax normalizer; appended
    # BEFORE row padding so padded rows carry 0 there (the mask)
    vf = jnp.pad(vf, ((0, 0), (0, 0), (0, 1)), constant_values=1.0)
    pad = sk_padded - Sk
    if pad:
        kf = jnp.pad(kf, ((0, 0), (0, pad), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad), (0, 0)))
    return kf, vf, bk


def _run_one_q(q, kf, vf, bk, block_q, dq, interpret=False):
    """(B, Sq, H, D) queries against packed KV -> (B, Sq, H, D).

    Queries pad up to a multiple of the query tile (see _choose_tile —
    ragged MMDiT joint attention keeps big tiles this way).  Padded rows
    attend over real KV and produce finite garbage that is sliced off —
    no masking needed on the Q axis."""
    B, Sq, H, D = q.shape
    q_len = Sq
    bq, sq_padded = _tile(Sq, block_q, dq)
    qpad = sq_padded - Sq
    if qpad:
        q = jnp.pad(q, ((0, 0), (0, qpad), (0, 0), (0, 0)))
        Sq = sq_padded
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, Sq, D)
    out = _flash_bhsd(qf, kf, vf, bq, bk, interpret=interpret)
    out = out.reshape(B, H, Sq, D).transpose(0, 2, 1, 3)
    return out[:, :q_len] if qpad else out


def flash_attention(q, k, v, bias=None, causal=False,
                    block_q: int | None = None, block_k: int | None = None,
                    interpret: bool = False):
    """Multi-head flash attention over (B, S, H, D) tensors.

    Falls back to the XLA path for shapes/features the kernel does not
    handle (bias, causal, tiny query sequences).  ``interpret=True`` runs
    the kernel through the Pallas interpreter (CPU-testable — the suite
    exercises the REAL wrapper + kernel, not a mirror)."""
    B, Sq, H, D = q.shape
    if bias is not None or causal or Sq < 128:
        from .attention import _xla_attention

        return _xla_attention(q, k, v, bias=bias, causal=causal)
    dq, dk = _default_tiles(D)
    kf, vf, bk = _pack_kv(k, v, block_k, dk)
    return _run_one_q(q, kf, vf, bk, block_q, dq, interpret=interpret)


def flash_attention_multi_q(qs, k, v,
                            block_q: int | None = None,
                            block_k: int | None = None,
                            interpret: bool = False):
    """Several query streams attending over ONE shared KV: the MMDiT joint
    attention (4096 latent + 154 context queries).  KV is packed once;
    each query stream gets its own kernel call with its own (exact) tile
    padding — the 4096-row latent stream pads by ZERO instead of the 20%
    a concatenated 4250-row query axis costs, and the q-concat /
    output-slice copies disappear entirely (measured 12 ms/step of pure
    concat + 4 ms of pad at SD3-medium 1024², r3 trace)."""
    D = qs[0].shape[-1]
    dq, dk = _default_tiles(D)
    kf, vf, bk = _pack_kv(k, v, block_k, dk)
    return [_run_one_q(q, kf, vf, bk, block_q, dq, interpret=interpret)
            for q in qs]
