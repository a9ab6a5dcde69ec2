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

# Persistent compile cache for the test suite (separate from the TPU cache
# at .jax_cache): the default profile is compile-dominated on this 1-core
# host, and re-runs hit the cache.  Like the TPU path, the env var
# JAX_COMPILATION_CACHE_DIR is swallowed by sitecustomize on this image —
# jax.config is the only reliable switch (CLAUDE.md).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402

# -- fast default profile ----------------------------------------------------
#
# The full suite exceeds 45 min on this 1-core host; tests marked `slow`
# (heavy E2E variants, compression sweeps, mirror gates) are skipped by
# default so `pytest -q` stays a <15 min iteration loop.  Run EVERYTHING
# with `pytest --runslow` (or SDTPU_FULL_SUITE=1) — required before round
# close; the full suite must stay green.


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (full profile)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy test, skipped unless --runslow")


def pytest_collection_modifyitems(config, items):
    if (config.getoption("--runslow")
            or os.environ.get("SDTPU_FULL_SUITE") == "1"
            or os.environ.get("SDTPU_REGEN_GOLDENS") == "1"):
        return
    skip = pytest.mark.skip(reason="slow: run with --runslow / SDTPU_FULL_SUITE=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
