"""Scratch ablation: SDXL 1024^2 VAE decode, repeat+conv vs parity-upsample.

Run on the real TPU chip (no JAX_PLATFORMS override), quiet window.
Delete after recording the result.
"""
import os
import time

import jax

from ml_stable_diffusion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp

from ml_stable_diffusion_tpu.models.vae import VAEConfig, VAEDecoder
from ml_stable_diffusion_tpu.utils.compile import sdtpu_jit

H = W = 128  # 1024 / 8


def measure(parity: bool) -> float:
    cfg = VAEConfig.sd()
    dec = VAEDecoder(cfg, dtype=jnp.bfloat16, parity_upsample=parity)
    shapes = jax.eval_shape(
        lambda k: dec.init(k, jnp.zeros((1, H, W, 4))), jax.random.key(0)
    )["params"]
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)

    @sdtpu_jit
    def run(params, z):
        img = dec.apply({"params": params}, z)
        img = jnp.clip(img.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
        return jnp.round(img * 255.0).astype(jnp.uint8)

    def fresh(i):
        return jax.random.normal(jax.random.key(1000 + i), (1, H, W, 4),
                                 jnp.float32)

    run(params, fresh(0)).block_until_ready()
    times = []
    for i in range(5):
        z = fresh(i + 1)
        z.block_until_ready()
        t0 = time.perf_counter()
        run(params, z).block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def measure_unet_scan(parity: bool) -> float:
    """SD-2.1 20-step denoise scan (bench.py raw-scan shape) -> iter/s."""
    import dataclasses

    import bench

    os.environ["SDTPU_PARITY_UPSAMPLE"] = "1" if parity else "0"
    cfg, params, make_scan, context, fresh = bench._sd21_parts()
    assert cfg.parity_upsample == parity, cfg
    denoise = sdtpu_jit(make_scan(lambda p: p))
    denoise(params, fresh(0), context).block_until_ready()
    times = []
    for i in range(5):
        lat = fresh(50 + (40 if parity else 0) + i)
        lat.block_until_ready()
        t0 = time.perf_counter()
        denoise(params, lat, context).block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    return bench.STEPS / times[len(times) // 2]


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "vae"
    if which == "vae":
        base = measure(False)
        fast = measure(True)
        print(f"repeat+conv3x3: {base*1e3:.1f} ms")
        print(f"parity 2x2x4:  {fast*1e3:.1f} ms  ({base/fast:.3f}x)")
    else:
        base = measure_unet_scan(False)
        fast = measure_unet_scan(True)
        print(f"unet scan repeat: {base:.2f} iter/s")
        print(f"unet scan parity: {fast:.2f} iter/s ({fast/base:.3f}x)")
