"""Profiling / tracing helpers.

The reference's only instrumentation is SampleTimer + per-compute-unit
latency medians (SURVEY.md section 5.1).  The TPU build adds first-class
`jax.profiler` traces and XLA cost introspection.
"""

from __future__ import annotations

import contextlib
import logging
from pathlib import Path

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/sdtpu_trace"):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("profile trace written to %s", log_dir)


def cost_summary(jitted_fn, *args) -> dict:
    """Static XLA cost analysis of a jitted function: flops, HBM bytes, and
    roofline estimates for the current device."""
    compiled = jitted_fn.lower(*args).compile()
    ca = compiled.cost_analysis() or {}
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    out = {"flops": flops, "bytes_accessed": byts}
    mem = compiled.memory_analysis()
    if mem is not None:
        out["argument_bytes"] = mem.argument_size_in_bytes
        out["temp_bytes"] = mem.temp_size_in_bytes
    # v5e-class roofline constants (bf16 MXU / HBM)
    peak_flops = 197e12
    peak_bw = 819e9
    if flops:
        out["compute_bound_ms"] = flops / peak_flops * 1e3
    if byts:
        out["bandwidth_bound_ms"] = byts / peak_bw * 1e3
    return out
