#!/usr/bin/env python
"""W8A8 serving benchmark: SD-2.1 512x512 with all large Dense layers running
as int8 MXU matmuls (compress/w8a8.py serving interceptor).

Speed-only (random weights, fixed activation scales); quality recipes come
from the calibration + sensitivity machinery in compress/w8a8.py.
"""

import json
import os
import time

import flax.linen as nn
import jax

from ml_stable_diffusion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from ml_stable_diffusion_tpu.utils.compile import sdtpu_jit
from ml_stable_diffusion_tpu.compress.w8a8 import (
    quantize_tree_dense_int8,
    w8a8_serving_interceptor,
)
from ml_stable_diffusion_tpu.models.unet import UNetConfig, UNet2DConditionModel
from ml_stable_diffusion_tpu.schedulers import DPMSolverMultistepScheduler

STEPS = 20
GUIDANCE = 7.5


class _ConstScales(dict):
    def __contains__(self, k):
        return True

    def __getitem__(self, k):
        return 8.0


def run(include_convs: bool = False) -> float:
    """-> iter/s with int8 serving (dense only, or dense+conv weights)."""
    cfg = UNetConfig.sd21()
    model = UNet2DConditionModel(cfg, dtype=jnp.bfloat16)
    h = w = 64
    sample = jnp.zeros((2, h, w, 4), jnp.float32)
    t0 = jnp.zeros((2,), jnp.float32)
    ctx = jnp.zeros((2, 77, cfg.cross_attention_dim), jnp.float32)
    shapes = jax.eval_shape(lambda k: model.init(k, sample, t0, ctx),
                            jax.random.key(0))["params"]
    leaves, treedef = jax.tree.flatten(shapes)
    keys = jax.random.split(jax.random.key(0), len(leaves))
    params = jax.tree.unflatten(treedef, [
        jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02
        for k, s in zip(keys, leaves)])

    import sys

    # skip the fused upsampler kernels: FusedUpsampleConv (the default
    # upsampler) is not an nn.Conv, so the serving interceptor can't
    # execute it as int8 — quantizing it would ship unused int8 copies as
    # program arguments and overstate the counted conv coverage
    int8_w = quantize_tree_dense_int8(params, include_convs=include_convs,
                                      skip_patterns=("upsamplers_0",))
    n_conv = sum(1 for wq, _ in int8_w.values() if wq.ndim == 4)
    # stderr: bench.py's stdout must stay ONE JSON line for the driver
    print(f"# int8 layers: {len(int8_w)} ({n_conv} convs)", file=sys.stderr)

    sched = DPMSolverMultistepScheduler()
    plan = sched.set_timesteps(STEPS)

    @sdtpu_jit
    def denoise(params, int8_w, latents, context):
        # the interceptor must close over TRACED int8 weights; closing over
        # concrete arrays would inline them as HLO constants (the remote
        # compiler rejects the resulting payload with HTTP 413)
        interceptor = w8a8_serving_interceptor(_ConstScales(), int8_w,
                                               skip_patterns=())
        with nn.intercept_methods(interceptor):
            state = sched.initial_state(plan, latents.shape)

            def step(carry, i):
                lat, st = carry
                lat2 = jnp.concatenate([lat, lat], axis=0)
                eps = model.apply({"params": params}, lat2, plan.timesteps[i],
                                  context)
                neg, pos = jnp.split(eps, 2, axis=0)
                guided = neg + GUIDANCE * (pos - neg)
                st, lat = sched.step(plan, st, guided, i, lat)
                return (lat, st), None

            (lat, _), _ = jax.lax.scan(step, (latents, state),
                                       jnp.arange(plan.num_steps))
            return lat

    context = jax.random.normal(jax.random.key(2), (2, 77, 1024), jnp.float32)

    def fresh(i):
        return jax.random.normal(jax.random.key(100 + i), (1, h, w, 4),
                                 jnp.float32)

    np.asarray(denoise(params, int8_w, fresh(0), context))
    times = []
    for i in range(3):
        lat = fresh(i + 1)
        np.asarray(lat)
        t = time.perf_counter()
        np.asarray(denoise(params, int8_w, lat, context))
        times.append(time.perf_counter() - t)
    return STEPS / min(times)


def main():
    import os

    include_convs = os.environ.get("SDTPU_W8A8_CONVS", "1") != "0"
    iters = run(include_convs=include_convs)
    kind = "dense+conv" if include_convs else "dense"
    print(json.dumps({
        "metric": f"SD-2.1-base 512x512 diffusion speed, W8A8 {kind} serving",
        "value": round(iters, 3),
        "unit": "iter/s",
        "vs_baseline": round(iters / 3.07, 2),
    }))


if __name__ == "__main__":
    main()
