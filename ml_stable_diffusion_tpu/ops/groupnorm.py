"""Fused GroupNorm(+SiLU) as a Pallas TPU kernel.

Keeps the natural (H*W, C) layout resident in VMEM and computes group
statistics with two MXU matmuls against a {0,1} channel->group selector —
one HBM read + one write per tensor, no relayouts.

MEASURED RESULT (SD-2.1 512^2 bench ablation): 40.1 iter/s vs 53.2 with
XLA's own GroupNorm — the pallas_call is an XLA fusion barrier, so the
neighboring elementwise ops that XLA would have fused into the surrounding
convs get their own HBM round trips.  Kept as an off-by-default option
(UNetConfig.fused_groupnorm) and as the starting point for a future kernel
that fuses GN+SiLU *into* the following conv; XLA's fusion wins for the
standalone op.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: per-image VMEM budget for the fused kernel (input + fp32 compute copies)
_VMEM_BYTES_LIMIT = 4 * 1024 * 1024


def _gn_silu_kernel(x_ref, gamma_ref, beta_ref, o_ref, *, groups, eps,
                    apply_silu):
    shape = x_ref.shape  # (1, H, W, C)
    C = shape[-1]
    hw = shape[1] * shape[2]
    x = x_ref[0].reshape(hw, C).astype(jnp.float32)

    # channel -> group selector (C, G), built from iota (constant-folded)
    ch = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    sel = (ch // (C // groups) == grp).astype(jnp.float32)

    s1 = jnp.sum(x, axis=0, keepdims=True)          # (1, C)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)      # (1, C)
    n = hw * (C // groups)
    g1 = jax.lax.dot_general(s1, sel, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / n
    g2 = jax.lax.dot_general(s2, sel, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / n
    var_g = g2 - g1 * g1
    # broadcast group stats back to channels: (1, G) @ (G, C)
    mean_c = jax.lax.dot_general(g1, sel.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    var_c = jax.lax.dot_general(var_g, sel.T, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    inv = jax.lax.rsqrt(var_c + eps)
    y = (x - mean_c) * inv
    y = y * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.reshape(shape[1], shape[2], C).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "apply_silu",
                                             "interpret"))
def _gn_silu_pallas(x, gamma, beta, groups: int, eps: float, apply_silu: bool,
                    interpret: bool = False):
    B, H, W, C = x.shape
    return pl.pallas_call(
        functools.partial(_gn_silu_kernel, groups=groups, eps=eps,
                          apply_silu=apply_silu),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            # fp32 compute temporaries of a whole image exceed the default
            # 16MB scoped budget; v5e VMEM is far larger
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, gamma.reshape(1, C), beta.reshape(1, C))


def _qualifies(x, groups: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    B, H, W, C = x.shape
    if C % groups or (H * W) % 8:
        return False
    return H * W * C * x.dtype.itemsize <= _VMEM_BYTES_LIMIT


def group_norm_silu(x, gamma, beta, groups: int = 32, eps: float = 1e-5,
                    apply_silu: bool = True):
    """Fused GroupNorm(+SiLU) over NHWC; XLA fallback off-TPU / odd shapes."""
    if _qualifies(x, groups):
        return _gn_silu_pallas(x, gamma, beta, groups, eps, apply_silu)
    mean = None  # fallback: plain decomposition
    B, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, H * W, groups, C // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(B, H, W, C)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if apply_silu:
        y = nn.silu(y)
    return y.astype(x.dtype)
