"""Pallas kernel parity off-TPU via the Pallas interpreter.

The CPU suite otherwise never executes the kernels (_flash_qualifies /
_qualifies gate them to TPU); interpret=True runs every kernel line —
KV-padding masks, online-softmax finalize, group-stat matmuls — against the
XLA reference implementations (VERDICT r1 weak #2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_stable_diffusion_tpu.ops.attention import _xla_attention
from ml_stable_diffusion_tpu.ops.flash_attention import (
    _choose_tile,
    flash_attention,
    flash_attention_multi_q,
)
from ml_stable_diffusion_tpu.ops.groupnorm import (
    _gn_silu_pallas,
    group_norm_silu,
)


def _flash_interpret(q, k, v, block_q=256, block_k=128):
    """The REAL production wrapper (padding, ones-column KV mask, tile
    choice) with the kernel under the Pallas interpreter."""
    return flash_attention(q, k, v, block_q=block_q, block_k=block_k,
                           interpret=True)


@pytest.mark.parametrize("sq,sk,dtype", [
    (256, 77, jnp.float32),     # cross-attention: 77 -> 128 padded+masked
    (256, 77, jnp.bfloat16),
    (256, 256, jnp.float32),    # self-attention, single KV tile
    (1024, 1024, jnp.bfloat16),  # multi-tile online softmax
    (512, 200, jnp.float32),    # padded multi-of-8 KV (200 -> 256)
    (330, 330, jnp.float32),    # ragged Sq AND Sk (MMDiT joint attention)
])
def test_flash_kernel_matches_xla(sq, sk, dtype):
    B, H, D = 2, 3, 64
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (B, sq, H, D), jnp.float32).astype(dtype)
    k = jax.random.normal(kk, (B, sk, H, D), jnp.float32).astype(dtype)
    v = jax.random.normal(kv, (B, sk, H, D), jnp.float32).astype(dtype)

    got = np.asarray(_flash_interpret(q, k, v), np.float32)
    ref = np.asarray(_xla_attention(q, k, v), np.float32)
    atol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(got, ref, atol=atol)


def test_flash_kernel_wide_head():
    """VAE spatial attention: single head of width 512 (models/vae.py routes
    it through the dispatch so TPU decode never materializes (HW, HW)
    logits; the ones-column normalizer rides at D_out=513)."""
    B, H, D = 1, 1, 512
    kq, kk, kv = jax.random.split(jax.random.key(7), 3)
    q = jax.random.normal(kq, (B, 256, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, 256, H, D), jnp.float32)
    v = jax.random.normal(kv, (B, 256, H, D), jnp.float32)
    got = np.asarray(_flash_interpret(q, k, v, block_q=128, block_k=128))
    ref = np.asarray(_xla_attention(q, k, v))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_flash_kernel_block_sweep():
    """Block-size selection must not change the result (online softmax is
    exact regardless of tiling)."""
    B, H, D, S = 1, 2, 64, 512
    kq, kk, kv = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, S, H, D), jnp.float32)
    v = jax.random.normal(kv, (B, S, H, D), jnp.float32)
    ref = np.asarray(_flash_interpret(q, k, v, block_q=512, block_k=512))
    for bq, bk in [(128, 128), (256, 128), (512, 256)]:
        got = np.asarray(_flash_interpret(q, k, v, block_q=bq, block_k=bk))
        np.testing.assert_allclose(got, ref, atol=1e-5, err_msg=f"{bq}x{bk}")


def test_flash_multi_q_matches_concat():
    """flash_attention_multi_q([q_x, q_c], k, v) == attend(concat) split —
    the MMDiT joint-attention dispatch (shared packed KV, per-stream exact
    tile padding, including a sub-128-row context stream)."""
    B, H, D = 2, 3, 64
    Nx, Nc = 384, 77  # latent + context rows (both ragged vs 128 tiles)
    kq, kk, kv, kq2 = jax.random.split(jax.random.key(11), 4)
    q_x = jax.random.normal(kq, (B, Nx, H, D), jnp.float32)
    q_c = jax.random.normal(kq2, (B, Nc, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, Nx + Nc, H, D), jnp.float32)
    v = jax.random.normal(kv, (B, Nx + Nc, H, D), jnp.float32)

    got_x, got_c = flash_attention_multi_q([q_x, q_c], k, v, interpret=True)
    ref = _xla_attention(jnp.concatenate([q_x, q_c], axis=1), k, v)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(ref[:, :Nx]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref[:, Nx:]),
                               atol=2e-5)


def test_choose_tile():
    # exact multiples: fewest tiles under the cap, no padding
    assert _choose_tile(4096, 1024) == (1024, 4096)
    assert _choose_tile(4096, 2304) == (2048, 4096)
    # the MMDiT joint-attention regression: the 4250-row KV axis
    # (padded128 = 4352 = 34*128) must tile as 2x2176 (+2.4% pad), not a
    # power-of-two choice between 256x17 (tiny tiles) or 1024x5 (+20%
    # FLOPs) — on-chip sweep in the _choose_tile docstring
    assert _choose_tile(4250, 2304) == (2176, 4352)
    # under a 1024 cap the same axis takes 5 ragged 896-row tiles (+5.4%)
    assert _choose_tile(4250, 1024) == (896, 4480)
    # cross-attention: 77 -> one 128 tile
    assert _choose_tile(77, 2304) == (128, 128)
    # one tile when it fits the cap outright
    assert _choose_tile(640, 1024) == (640, 640)
    assert _choose_tile(640, 512) == (384, 768)


@pytest.mark.parametrize("nbits,dtype", [
    (4, jnp.float32), (6, jnp.bfloat16), (8, jnp.float32)])
def test_fused_dequant_matmul_matches_dense(nbits, dtype):
    """Pallas fused dequant-matmul == x @ dequantized(W) (select-sum LUT
    expansion, multi-tile K accumulation)."""
    from ml_stable_diffusion_tpu.compress.palettize import palettize_array
    from ml_stable_diffusion_tpu.ops.palettized import palettized_dense_fused

    rng = np.random.RandomState(0)
    M, K, N = 64, 256, 384
    x = jnp.asarray(rng.randn(M, K), jnp.float32).astype(dtype)
    w = rng.randn(K, N).astype(np.float32) * 0.1
    pt = palettize_array(w, nbits)
    bias = jnp.asarray(rng.randn(N), jnp.float32)

    got = palettized_dense_fused(x, jnp.asarray(pt.indices),
                                 jnp.asarray(pt.lut), pt.shape, bias=bias,
                                 interpret=True)
    ref = x @ jnp.asarray(pt.dequantize()).astype(dtype) + bias
    atol = 5e-2 if dtype == jnp.bfloat16 else 1e-4
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=atol)


def test_fused_dequant_matmul_batched_input():
    from ml_stable_diffusion_tpu.compress.palettize import palettize_array
    from ml_stable_diffusion_tpu.ops.palettized import palettized_dense_fused

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 32, 128), jnp.float32)
    w = rng.randn(128, 256).astype(np.float32)
    pt = palettize_array(w, 6)
    got = palettized_dense_fused(x, jnp.asarray(pt.indices),
                                 jnp.asarray(pt.lut), pt.shape,
                                 interpret=True)
    ref = x @ pt.dequantize()
    assert got.shape == (2, 32, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("apply_silu", [True, False])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gn_silu_kernel_matches_fallback(apply_silu, dtype):
    B, H, W, C, G = 2, 8, 8, 32, 8
    x = jax.random.normal(jax.random.key(2), (B, H, W, C),
                          jnp.float32).astype(dtype)
    gamma = jax.random.normal(jax.random.key(3), (C,), jnp.float32)
    beta = jax.random.normal(jax.random.key(4), (C,), jnp.float32)

    got = np.asarray(_gn_silu_pallas(x, gamma, beta, G, 1e-5, apply_silu,
                                     interpret=True), np.float32)
    # the XLA fallback decomposition inside group_norm_silu (off-TPU path)
    ref = np.asarray(group_norm_silu(x, gamma, beta, groups=G,
                                     apply_silu=apply_silu), np.float32)
    atol = 5e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(got, ref, atol=atol)
