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


def trace_summary(log_dir: str | Path = "/tmp/sdtpu_trace",
                  steps: int = 1, top: int = 20) -> dict:
    """Aggregate a captured ``trace()`` by HLO category and model source line.

    Reads the trace-event JSON the TPU profiler writes alongside the xplane
    (no tensorflow/protobuf dependency).  ``steps`` divides totals into
    per-step numbers (e.g. 2 traced calls x 20 scan steps -> 40).  Each
    entry carries summed duration and achieved TFLOP/s — this is how the r2
    GEGLU/shortcut-conv inefficiencies were found (65/58 TFLOP/s vs ~150
    for healthy matmul fusions).
    """
    import glob
    import gzip
    import json
    import re
    from collections import defaultdict

    paths = sorted(glob.glob(
        str(Path(log_dir) / "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    device_pids = {
        e["pid"] for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "device:" in (e.get("args") or {}).get("name", "")}
    cat = defaultdict(lambda: [0.0, 0.0])
    src = defaultdict(lambda: [0.0, 0.0])
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        a = e.get("args") or {}
        c = a.get("hlo_category")
        if c is None or e["name"].startswith("while"):
            continue
        d = e["dur"]
        fl = float(a.get("model_flops", 0) or 0)
        cat[c][0] += d
        cat[c][1] += fl
        stack = a.get("source_stack", "")
        # prefer the framework's own model/op lines over flax internals
        m = (re.search(r"ml_stable_diffusion_tpu/[\w/]+/([\w]+\.py):(\d+)",
                       stack)
             or re.search(r"([\w-]+\.py):(\d+)", stack))
        if m:
            key = f"{m.group(1)}:{m.group(2)}"
            src[key][0] += d
            src[key][1] += fl

    def rows(table):
        out = []
        for k, (d, f) in sorted(table.items(), key=lambda kv: -kv[1][0])[:top]:
            out.append({"name": k, "us_per_step": round(d / steps, 1),
                        "tflops": round(f / (d * 1e6), 1) if d else 0.0})
        return out

    total = sum(v[0] for v in cat.values())
    return {"total_ms_per_step": round(total / steps / 1e3, 3),
            "by_category": rows(cat), "by_source": rows(src)}


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
