"""Device mesh construction.

The reference has no multi-device story at all (SURVEY.md section 2.4): its
"compute units" knob picks which fused accelerator the closed Core ML runtime
uses.  The TPU-native scale-out axis is a `jax.sharding.Mesh` over ICI with
GSPMD partitioning: data parallel over batch ("dp") and tensor parallel over
hidden/head dims ("tp").  Diffusion inference is small-batch latency-bound,
so tp is the default axis for >1 chip; dp serves batch/throughput serving.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              tp: int | None = None, devices=None) -> Mesh:
    """Build a (dp, tp) mesh.  Defaults: all devices, dp=1 (pure tensor
    parallel — the latency-optimal layout for single-image generation)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if dp is None and tp is None:
        dp, tp = 1, n_devices
    elif dp is None:
        dp = n_devices // tp
    elif tp is None:
        tp = n_devices // dp
    if dp * tp != n_devices:
        raise ValueError(f"dp({dp}) * tp({tp}) != n_devices({n_devices})")
    if len(devices) < n_devices:
        raise ValueError(
            f"make_mesh needs {n_devices} devices but only {len(devices)} "
            f"are visible on backend '{jax.default_backend()}'. For CPU "
            "testing set XLA_FLAGS=--xla_force_host_platform_device_count=N "
            "and jax.config.update('jax_platforms', 'cpu') before any "
            "backend use (see tests/conftest.py).")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
