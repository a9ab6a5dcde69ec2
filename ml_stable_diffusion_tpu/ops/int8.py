"""Int8 serving ops (W8A8).

The MXU runs int8 x int8 -> int32 at ~2x bf16 throughput on v5e; these ops
consume the scales produced by compress/w8a8.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def quantize_weight_int8(w):
    """-> (w_q int8, scale f32 per output channel)."""
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


def int8_conv(x, w_q, w_scale, x_amax: float, bias=None, strides=(1, 1),
              padding="SAME", feature_group_count: int = 1):
    """W8A8 NHWC conv: symmetric per-tensor activation + per-out-channel
    weight.  int8 weights halve the conv weight HBM traffic vs bf16 — the
    UNet's convs are ~half its weight bytes and it is bandwidth-bound.

    x (B, H, W, Cin) float; w_q (kh, kw, Cin/g, Cout) int8; w_scale
    broadcastable to (1, 1, 1, Cout).
    """
    x_scale = max(float(x_amax), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    acc = lax.conv_general_dilated(
        xq, w_q, window_strides=tuple(strides), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (x_scale * w_scale.reshape(1, 1, 1, -1))
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def int8_dense(x, w_q, w_scale, x_amax: float, bias=None):
    """W8A8 dense: symmetric per-tensor activation + per-channel weight.

    x (..., K) float; w_q (K, N) int8; w_scale (1, N); x_amax static float.
    """
    x_scale = max(float(x_amax), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    acc = lax.dot_general(xq, w_q, (((x.ndim - 1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (x_scale * w_scale.reshape(1, -1))
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)
