"""Tests: attention-implementation switch, clip score, device discovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_stable_diffusion_tpu.models.safety import SafetyChecker, SafetyCheckerConfig
from ml_stable_diffusion_tpu.ops import attention as attn
from ml_stable_diffusion_tpu.utils.clip_score import clip_score
from ml_stable_diffusion_tpu.utils.devices import (
    describe_devices,
    get_available_compute_units,
)

from helpers import tiny_text_encoder, tiny_tokenizer


def test_attention_implementation_switch():
    q = jnp.asarray(np.random.RandomState(0).randn(1, 8, 2, 4), jnp.float32)
    ref = attn.dot_product_attention(q, q, q, impl="xla")
    try:
        attn.set_attention_implementation("xla")
        out = attn.dot_product_attention(q, q, q)  # AUTO -> forced xla
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        with pytest.raises(ValueError):
            attn.set_attention_implementation("bogus")
    finally:
        attn.set_attention_implementation("auto")


def test_devices():
    units = get_available_compute_units()
    assert "cpu" in units
    desc = describe_devices()
    assert len(desc) >= 1 and "platform" in desc[0]


def test_clip_score_shape_and_range(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    tok = tiny_tokenizer(tmp_path)
    te, te_params = tiny_text_encoder(use_projection=True)
    vcfg = SafetyCheckerConfig(image_size=32, patch_size=8, hidden_size=32,
                               intermediate_size=64, num_hidden_layers=2,
                               num_attention_heads=2, projection_dim=32,
                               num_concepts=2, num_special_care=2)
    vm = SafetyChecker(vcfg)
    vp = jax.jit(vm.init)(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]

    img = Image.new("RGB", (64, 64), (120, 30, 200))
    s = clip_score(te, te_params, vm, vp, tok, "a purple square", img)
    assert -1.0 <= s <= 1.0


def test_sdtpu_jit_cpu_passthrough():
    """Off-TPU the helper must be plain jax.jit (TPU-only option names
    would fail the CPU compiler)."""
    import jax.numpy as jnp

    from ml_stable_diffusion_tpu.utils.compile import (
        sdtpu_jit,
        tpu_compiler_options,
    )

    assert tpu_compiler_options() is None  # tests force the CPU backend

    @sdtpu_jit
    def f(x):
        return x * 2

    assert float(f(jnp.float32(3.0))) == 6.0
    g = sdtpu_jit(lambda x: x + 1, static_argnums=())
    assert float(g(jnp.float32(1.0))) == 2.0


def test_trace_summary_synthetic(tmp_path):
    """trace_summary aggregates a profiler trace-event JSON by HLO category
    and model source line (the r2 perf work's attribution tool)."""
    import gzip
    import json

    from ml_stable_diffusion_tpu.utils.profiling import trace_summary

    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "X", "pid": 3, "tid": 1, "ts": 0, "dur": 100.0,
         "name": "fusion.1", "args": {
             "hlo_category": "convolution fusion",
             "model_flops": "2000000000",
             "source_stack": ".../ml_stable_diffusion_tpu/models/unet.py:188:1"}},
        {"ph": "X", "pid": 3, "tid": 1, "ts": 100, "dur": 50.0,
         "name": "copy.2", "args": {
             "hlo_category": "data formatting",
             "source_stack": "/opt/venv/flax/linen/linear.py:700:1"}},
        {"ph": "X", "pid": 3, "tid": 1, "ts": 150, "dur": 999.0,
         "name": "while.3", "args": {"hlo_category": "loop"}},  # excluded
        {"ph": "X", "pid": 7, "tid": 1, "ts": 0, "dur": 888.0,
         "name": "host.1", "args": {"hlo_category": "copy"}},  # non-device
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    s = trace_summary(tmp_path, steps=2)
    assert s["total_ms_per_step"] == pytest.approx(0.075)
    cats = {r["name"]: r for r in s["by_category"]}
    assert cats["convolution fusion"]["us_per_step"] == 50.0
    assert cats["convolution fusion"]["tflops"] == pytest.approx(20.0)
    assert cats["data formatting"]["us_per_step"] == 25.0
    srcs = {r["name"] for r in s["by_source"]}
    assert "unet.py:188" in srcs and "linear.py:700" in srcs
