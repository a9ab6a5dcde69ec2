"""W8A8 post-training activation quantization.

TPU-native port of the reference's activation_quantization.py:
- calibration capture: record per-layer input-activation absmax over
  calibration prompts (reference generate_calibration_data :258 records UNet
  inputs via forward-pre-hooks; here a flax method interceptor records the
  inputs of every Dense module — no model changes needed)
- per-layer sensitivity + cumulative quantization with skip lists
  (quantize_module_config :121 / quantize_cumulative_config :141; the
  reference's recipe overrides for speed/quality :217-243 map to
  ``skip_patterns``)
- simulation: symmetric per-tensor int8 activations + per-channel int8
  weights, fake-quantized in place for PSNR measurement
- serving: ops/int8.py provides the real int8 MXU matmul taking the scales
  computed here.
"""

from __future__ import annotations

import logging
from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..convert.report import compute_psnr

logger = logging.getLogger(__name__)

#: modules whose inputs the reference never quantizes (quality recipe,
#: activation_quantization.py:231-243: never quantize to_out after concat)
DEFAULT_SKIP_PATTERNS = ("to_out_0",)


class ConstantScales(dict):
    """Uniform activation absmax for every module — quick-start serving
    without a calibration pass (calibrate with capture_activation_scales
    for production quality)."""

    def __init__(self, value: float = 8.0):
        super().__init__()
        self.value = float(value)

    def __contains__(self, k):
        return True

    def __getitem__(self, k):
        return self.value


def _path_str(module: nn.Module) -> str:
    return "/".join(module.path)


def capture_activation_scales(apply_fn: Callable, calibration_inputs,
                              module_types=(nn.Dense,)) -> dict[str, float]:
    """Run calibration batches, recording per-module input absmax.

    ``apply_fn(inputs)`` must execute the model's apply under this context;
    returns {module_path: absmax}.
    """
    scales: dict[str, float] = {}

    def interceptor(next_fun, args, kwargs, context):
        if (isinstance(context.module, module_types)
                and context.method_name == "__call__" and args):
            x = args[0]
            if hasattr(x, "astype"):
                key = _path_str(context.module)
                amax = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
                scales[key] = max(scales.get(key, 0.0), amax)
        return next_fun(*args, **kwargs)

    for inputs in calibration_inputs:
        with nn.intercept_methods(interceptor):
            apply_fn(inputs)
    return scales


def fake_quantize_int8(x, amax: float):
    """Symmetric per-tensor int8 fake quantization."""
    scale = max(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127)
    return q * scale


def fake_quantize_weight_int8(w):
    """Per-output-channel symmetric int8 (last axis = output features)."""
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    return jnp.clip(jnp.round(w / scale), -127, 127) * scale


def w8a8_interceptor(act_scales: dict[str, float],
                     quantize_paths: set[str] | None = None,
                     skip_patterns: Sequence[str] = DEFAULT_SKIP_PATTERNS):
    """A flax interceptor that simulates W8A8 on selected Dense modules."""

    def interceptor(next_fun, args, kwargs, context):
        if (isinstance(context.module, nn.Dense)
                and context.method_name == "__call__" and args):
            key = _path_str(context.module)
            selected = quantize_paths is None or key in quantize_paths
            skipped = any(p in key for p in skip_patterns)
            if selected and not skipped and key in act_scales:
                x = fake_quantize_int8(args[0], act_scales[key])
                kernel = context.module.variables["params"]["kernel"]
                qkernel = fake_quantize_weight_int8(kernel)
                y = x @ qkernel.astype(x.dtype)
                if context.module.use_bias:
                    y = y + context.module.variables["params"]["bias"].astype(x.dtype)
                return y
        return next_fun(*args, **kwargs)

    return interceptor


def quantizable_dense_paths(act_scales: dict[str, float],
                            skip_patterns=DEFAULT_SKIP_PATTERNS) -> list[str]:
    return [k for k in sorted(act_scales)
            if not any(p in k for p in skip_patterns)]


def benchmark_w8a8(run_fn: Callable, act_scales: dict[str, float],
                   paths: list[str] | None = None,
                   cumulative: bool = True) -> dict[str, float]:
    """PSNR impact of quantizing layers singly or cumulatively.

    ``run_fn(interceptor | None) -> latent ndarray`` executes the pipeline
    under the given interceptor (None = reference fp output).
    """
    if paths is None:
        paths = quantizable_dense_paths(act_scales)
    ref = np.asarray(run_fn(None))
    results = {}
    active: set[str] = set()
    for key in paths:
        probe = set(active) | {key} if cumulative else {key}
        out = np.asarray(run_fn(w8a8_interceptor(act_scales, probe)))
        psnr = compute_psnr(out, ref)
        results[key] = round(psnr, 2)
        if cumulative:
            active.add(key)
        logger.info("w8a8 %s: %.1f dB", key, psnr)
    return results


def build_w8a8_recipe(single_psnr: dict[str, float],
                      act_scales: dict[str, float],
                      conv_psnr: float = 40.0,
                      attn_psnr: float = 30.0) -> dict:
    """Threshold rule of the reference's tool (activation_quantization.py
    :491-500, defaults --conv-psnr 40 / --attn-psnr 30): a layer stays
    quantized only while its single-layer PSNR holds the class threshold
    (attention projections 30 dB, everything else 40 dB); the rest go on
    the skip list.  The returned recipe is what ``cli/generate.py
    --w8a8-scales`` consumes."""
    skip = []
    for key, psnr in single_psnr.items():
        thr = attn_psnr if "attn" in key else conv_psnr
        if psnr < thr:
            skip.append(key)
    return {"act_scales": dict(act_scales), "skip": sorted(skip),
            "thresholds": {"conv_psnr": conv_psnr, "attn_psnr": attn_psnr}}


def quantize_dense_weights_int8(variables_fn: Callable, paths: list[str]):
    """Pre-quantize selected Dense kernels to int8 for serving.

    ``variables_fn(path) -> {"kernel": ..., "bias": ...}``; returns
    {path: (w_q int8, w_scale)} consumed by ``w8a8_serving_interceptor``.
    """
    from ..ops.int8 import quantize_weight_int8

    out = {}
    for path in paths:
        v = variables_fn(path)
        out[path] = quantize_weight_int8(jnp.asarray(v["kernel"]))
    return out


def _conv_geometry(module: nn.Conv):
    """Normalize an nn.Conv's strides/padding for lax.conv_general_dilated."""
    ndim = len(module.kernel_size)
    s = module.strides or 1
    strides = (s,) * ndim if isinstance(s, int) else tuple(s)
    p = module.padding
    if isinstance(p, int):
        p = [(p, p)] * ndim
    elif isinstance(p, (list, tuple)) and p and isinstance(p[0], int):
        p = [(int(x), int(x)) for x in p]
    return strides, p, module.feature_group_count


def w8a8_serving_interceptor(act_scales: dict[str, float],
                             int8_weights: dict,
                             skip_patterns: Sequence[str] = DEFAULT_SKIP_PATTERNS):
    """Serving-path interceptor: selected Dense AND Conv layers execute as
    real int8 MXU ops (ops/int8) — the deployment counterpart of the
    fake-quant simulation used for sensitivity analysis.  Conv coverage
    halves the conv weight HBM traffic (the bandwidth-bound UNet's largest
    remaining term after the dense W8A8 pass)."""
    from ..models.unet import _Conv1x1
    from ..ops.int8 import int8_conv, int8_dense

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if (isinstance(m, (nn.Dense, nn.Conv, _Conv1x1))
                and context.method_name == "__call__" and args):
            key = _path_str(m)
            if (key in int8_weights and key in act_scales
                    and not any(p in key for p in skip_patterns)):
                wq, wscale = int8_weights[key]
                x = args[0]
                if isinstance(m, nn.Dense):
                    expected = (x.shape[-1], m.features)
                elif isinstance(m, _Conv1x1):
                    expected = (1, 1, x.shape[-1], m.features)
                else:
                    expected = tuple(m.kernel_size) + (
                        x.shape[-1] // m.feature_group_count, m.features)
                if tuple(wq.shape) != expected:
                    # path collision with a different model's module (VAE and
                    # UNet both have up_blocks_0/... paths) — not ours
                    return next_fun(*args, **kwargs)
                if isinstance(m, _Conv1x1):
                    # the dot-form 1x1 shortcut conv (unet.py _Conv1x1) IS
                    # a dense matmul — serve it on the int8 dense path
                    # ((1,1,K,N) kernel, per-out-channel scale)
                    return int8_dense(x, wq[0, 0], wscale,
                                      act_scales[key],
                                      bias=m.variables["params"].get("bias"))
                bias = (m.variables["params"].get("bias")
                        if m.use_bias else None)
                if isinstance(m, nn.Dense):
                    return int8_dense(x, wq, wscale, act_scales[key],
                                      bias=bias)
                strides, padding, fgc = _conv_geometry(m)
                return int8_conv(x, wq, wscale, act_scales[key],
                                 bias=bias, strides=strides, padding=padding,
                                 feature_group_count=fgc)
        return next_fun(*args, **kwargs)

    return interceptor


def quantize_tree_dense_int8(params, min_size: int = 1 << 14,
                             skip_patterns: Sequence[str] = (),
                             include_convs: bool = False) -> dict:
    """Walk a param pytree and pre-quantize every Dense (2-D) — and with
    ``include_convs`` every Conv (4-D) — kernel above ``min_size`` to int8
    -> {module_path: (w_q, w_scale)} for ``w8a8_serving_interceptor``."""
    import jax

    from ..ops.int8 import quantize_weight_int8

    ndims = (2, 4) if include_convs else (2,)
    out = {}
    for p, leaf in jax.tree_util.tree_leaves_with_path(params):
        names = tuple(x.key for x in p if hasattr(x, "key"))
        if names[-1] != "kernel" or leaf.ndim not in ndims:
            continue
        if leaf.size < min_size:
            continue
        key = "/".join(names[:-1])
        if any(s in key for s in skip_patterns):
            continue
        out[key] = quantize_weight_int8(jnp.asarray(leaf))
    return out
