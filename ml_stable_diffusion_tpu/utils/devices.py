"""Device discovery.

TPU analog of the reference's compute-unit selection surface
(coreml_model.py get_available_compute_units :224, MLComputeUnits mapping
main.swift:335-345): the heterogeneous {CPU, GPU, ANE} knob becomes JAX
platform/device selection and, for >1 chip, a mesh shape (parallel/mesh.py).
"""

from __future__ import annotations

import jax


def get_available_compute_units() -> list[str]:
    """Platform names usable as jax device targets on this host."""
    platforms = []
    for name in ("tpu", "gpu", "cpu"):
        try:
            if jax.devices(name):
                platforms.append(name)
        except RuntimeError:
            continue
    return platforms


def get_devices(compute_unit: str | None = None):
    """Devices for a platform (None = default platform)."""
    return jax.devices(compute_unit) if compute_unit else jax.devices()


def describe_devices() -> list[dict]:
    return [{"id": d.id, "platform": d.platform, "kind": d.device_kind}
            for d in jax.devices()]
