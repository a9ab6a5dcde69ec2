"""GELU formulations tuned for the TPU VPU.

``jax.nn.gelu(approximate=False)`` lowers through ``erfc`` with large-|x|
branch handling (abs/compare/select + two polynomial branches) — measured
+160 us per (2,4096,1280) GEGLU tensor on v5e.  The plain ``erf``
formulation below is the same mathematical function (the erfc tail only
matters below bf16 resolution: gelu(-10) ~ 1e-23 rounds to 0 either way)
at half the VPU cost (+79 us), and the tanh approximation rewritten as a
sigmoid (tanh(z) = 2*sigmoid(2z) - 1, exp is a cheap EUP op) is identical
math to ``approximate=True`` at a fraction of its polynomial-tanh cost.

These feed matmul fusions in the UNet/MMDiT feed-forward blocks (reference
GEGLU, unet.py:609-628), where the elementwise producer serializes with the
MXU — the profiled GEGLU fusion ran at 65 TFLOP/s vs ~150 for neighbouring
matmuls before this change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_INV_SQRT2 = 0.7071067811865476
_SQRT_2_OVER_PI = 0.7978845608028654


def gelu_erf(x):
    """Exact GELU via f32 ``erf`` (same function as
    ``jax.nn.gelu(approximate=False)``, ~2x cheaper lowering)."""
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + lax.erf(xf * _INV_SQRT2))).astype(x.dtype)


def gelu_tanh(x):
    """Tanh-approximate GELU (identical math to
    ``jax.nn.gelu(approximate=True)``) via the sigmoid identity
    ``x/2*(1+tanh(z)) == x*sigmoid(2z)`` — exp is cheaper than the
    polynomial tanh on the VPU."""
    xf = x.astype(jnp.float32)
    z = _SQRT_2_OVER_PI * (xf + 0.044715 * (xf * xf * xf))
    return (xf * jax.nn.sigmoid(2.0 * z)).astype(x.dtype)


def quick_gelu(x):
    """CLIP's quick_gelu: ``x * sigmoid(1.702 x)``."""
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)
