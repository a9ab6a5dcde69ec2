"""Test configuration: run JAX on a virtual 8-device CPU platform.

Multi-chip TPU hardware is not available in CI; sharding/pjit paths are
validated on a virtual CPU mesh (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).

NOTE: this machine's TPU tunnel (axon) force-registers itself via
sitecustomize and overrides JAX_PLATFORMS, so plain env vars are not enough —
we must update jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
