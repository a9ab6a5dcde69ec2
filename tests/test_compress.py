"""Compression suite tests: palettization quality, MBP recipes, W8A8,
serving ops."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from ml_stable_diffusion_tpu.compress import (
    NBITS,
    apply_recipe,
    benchmark_signal_integrity,
    build_recipe,
    dequantize_tree,
    palettize_tree,
    palettize_weights,
)
from ml_stable_diffusion_tpu.compress.mixed_bit import (
    descending_psnr_order,
    palettizable_paths,
    recipe_average_bits,
)
from ml_stable_diffusion_tpu.compress.palettize import (
    PalettizedTensor,
    palettize_array,
)
from ml_stable_diffusion_tpu.compress.w8a8 import (
    benchmark_w8a8,
    capture_activation_scales,
    w8a8_interceptor,
)
from ml_stable_diffusion_tpu.convert.report import compute_psnr
from ml_stable_diffusion_tpu.ops.int8 import int8_dense, quantize_weight_int8
from ml_stable_diffusion_tpu.ops.palettized import (
    pack_4bit,
    palettized_dense,
    unpack_4bit,
)


#: heavy E2E/sweep file — excluded from the fast default profile
pytestmark = pytest.mark.slow

def test_palettize_array_quality_ladder():
    rng = np.random.RandomState(0)
    w = rng.randn(256, 512).astype(np.float32)
    psnrs = []
    for nbits in (2, 4, 6, 8):
        pt = palettize_array(w, nbits)
        assert pt.lut.shape == (2 ** nbits,)
        assert pt.indices.max() < 2 ** nbits
        psnrs.append(compute_psnr(pt.dequantize(), w))
    # more bits -> strictly better reconstruction
    assert psnrs == sorted(psnrs)
    assert psnrs[-1] > 40  # 8-bit of a gaussian is high fidelity
    assert psnrs[1] > 20   # 4-bit decent


def test_palettize_tree_selects_large_kernels():
    params = {
        "big": {"kernel": np.random.RandomState(0).randn(400, 300).astype(np.float32)},
        "small": {"kernel": np.zeros((4, 4), np.float32)},
        "tok": {"embedding": np.random.RandomState(1).randn(500, 300).astype(np.float32)},
        "norm": {"scale": np.ones(300, np.float32)},
    }
    tree, stats = palettize_tree(params, nbits=4, min_size=1000)
    assert isinstance(tree["big"]["kernel"], PalettizedTensor)
    assert not isinstance(tree["small"]["kernel"], PalettizedTensor)
    assert not isinstance(tree["tok"]["embedding"], PalettizedTensor)  # gather skip
    assert stats["palettized"] == 1
    assert stats["new_bytes"] < stats["orig_bytes"]
    dense = dequantize_tree(tree)
    assert dense["big"]["kernel"].shape == (400, 300)


def test_palettize_weights_compression_ratio():
    params = {"w": {"kernel": np.random.RandomState(0).randn(512, 512).astype(np.float32)}}
    _, stats = palettize_weights(params, nbits=4, min_size=1000)
    # 16 bit -> ~4 bit: ~4x on the palettized tensor
    assert stats["new_bytes"] * 3 < stats["orig_bytes"]


class _ToyModel(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(64, name="lay1")(x)
        x = nn.relu(x)
        x = nn.Dense(64, name="lay2")(x)
        x = nn.relu(x)
        return nn.Dense(8, name="to_out_0")(x)


@pytest.fixture(scope="module")
def toy():
    model = _ToyModel()
    x = jnp.asarray(np.random.RandomState(0).randn(16, 32), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    # make kernels big enough to be palettizable at a low threshold
    return model, params, x


def test_mbp_sweep_and_recipe(toy, tmp_path):
    model, params, x = toy

    def run_fn(p):
        return model.apply({"params": p}, x)

    paths = palettizable_paths(params, min_size=1000)
    assert ("lay1", "kernel") in paths and ("lay2", "kernel") in paths

    out_json = tmp_path / "mbp.json"
    res = benchmark_signal_integrity(run_fn, params, nbits_list=(2, 8),
                                     paths=paths, out_json=out_json)
    assert out_json.exists()
    loaded = json.loads(out_json.read_text())
    assert loaded["single_layer"] == res["single_layer"]
    for key, by_bits in res["single_layer"].items():
        assert by_bits["8"] >= by_bits["2"]

    recipe = build_recipe(res["single_layer"], psnr_threshold=40.0)
    assert set(recipe) == {"/".join(p) for p in paths}
    avg = recipe_average_bits(recipe, params)
    assert 1 <= avg <= 16

    compressed = apply_recipe(params, recipe)
    psnr = compute_psnr(np.asarray(run_fn(compressed)), np.asarray(run_fn(params)))
    assert psnr >= 30  # threshold 40 per layer -> combined still high

    order = descending_psnr_order(res["single_layer"], nbits=2)
    assert len(order) == len(paths)

    cum = benchmark_signal_integrity(run_fn, params, nbits_list=(8,),
                                     paths=paths, cumulative=True)
    vals = list(cum["cumulative"]["8"].values())
    assert len(vals) == len(paths)


def test_w8a8_capture_and_simulation(toy):
    model, params, x = toy

    def apply_fn(inputs):
        return model.apply({"params": params}, inputs)

    scales = capture_activation_scales(apply_fn, [x, x * 2.0])
    assert set(scales) == {"lay1", "lay2", "to_out_0"}
    assert scales["lay1"] == pytest.approx(float(jnp.abs(x * 2).max()), rel=1e-5)

    ref = model.apply({"params": params}, x)
    with nn.intercept_methods(w8a8_interceptor(scales)):
        out = model.apply({"params": params}, x)
    psnr = compute_psnr(np.asarray(out), np.asarray(ref))
    assert psnr > 25  # int8 sim close to fp
    assert np.abs(np.asarray(out - ref)).max() > 0  # actually quantized

    def run_fn(interceptor):
        if interceptor is None:
            return model.apply({"params": params}, x)
        with nn.intercept_methods(interceptor):
            return model.apply({"params": params}, x)

    res = benchmark_w8a8(run_fn, scales, cumulative=True)
    assert set(res) == {"lay1", "lay2"}  # to_out_0 skipped by default


def test_int8_dense_op():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 32), jnp.float32)
    w = jnp.asarray(rng.randn(32, 16), jnp.float32)
    wq, ws = quantize_weight_int8(w)
    assert wq.dtype == jnp.int8
    y = int8_dense(x, wq, ws, x_amax=float(jnp.abs(x).max()))
    ref = x @ w
    assert compute_psnr(np.asarray(y), np.asarray(ref)) > 25


def test_palettized_dense_op():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 64), jnp.float32)
    w = rng.randn(64, 32).astype(np.float32)
    pt = palettize_array(w, 4)
    # full uint8 path
    y = palettized_dense(x, jnp.asarray(pt.indices), jnp.asarray(pt.lut),
                         pt.shape)
    ref = x @ pt.dequantize()
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
    # packed 4-bit path
    packed = pack_4bit(pt.indices)
    assert packed.size == pt.indices.size // 2
    y2 = palettized_dense(x, jnp.asarray(packed), jnp.asarray(pt.lut), pt.shape)
    np.testing.assert_allclose(np.asarray(y2), ref, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(unpack_4bit(jnp.asarray(packed), pt.indices.size)),
        pt.indices)


def test_int8_conv_op():
    from ml_stable_diffusion_tpu.ops.int8 import int8_conv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 16, 32) * 0.1, jnp.float32)
    wq, ws = quantize_weight_int8(w)
    bias = jnp.asarray(rng.randn(32), jnp.float32)
    y = int8_conv(x, wq, ws, x_amax=float(jnp.abs(x).max()), bias=bias,
                  strides=(1, 1), padding=[(1, 1), (1, 1)])
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    assert compute_psnr(np.asarray(y), np.asarray(ref)) > 25
    # strided (downsampler geometry)
    y2 = int8_conv(x, wq, ws, x_amax=float(jnp.abs(x).max()),
                   strides=(2, 2), padding=[(1, 1), (1, 1)])
    assert y2.shape == (2, 4, 4, 32)


def test_w8a8_conv_serving_on_unet():
    """Full-UNet forward with Dense AND Conv int8 serving stays within
    tolerance of the fp32 forward (the conv-weight-traffic lever,
    VERDICT r1 next #10)."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).parent))
    from helpers import tiny_unet

    from ml_stable_diffusion_tpu.compress.w8a8 import (
        quantize_tree_dense_int8,
        w8a8_serving_interceptor,
    )

    model, params = tiny_unet()
    int8_w = quantize_tree_dense_int8(params, min_size=1, include_convs=True,
                                      skip_patterns=())
    assert any(np.ndim(wq) == 4 for wq, _ in int8_w.values())  # convs present

    class _Scales(dict):
        def __contains__(self, k):
            return True

        def __getitem__(self, k):
            return 8.0

    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4), jnp.float32)
    t = jnp.zeros((1,))
    ctx = jnp.asarray(np.random.RandomState(1).randn(1, 77, 48) * 0.2,
                      jnp.float32)
    ref = model.apply({"params": params}, x, t, ctx)
    with nn.intercept_methods(
            w8a8_serving_interceptor(_Scales(), int8_w, skip_patterns=())):
        served = model.apply({"params": params}, x, t, ctx)
    assert np.isfinite(np.asarray(served)).all()
    assert compute_psnr(np.asarray(served), np.asarray(ref)) > 20


def test_pipeline_enable_w8a8_end_to_end(tmp_path):
    """enable_w8a8: int8 weights ride in the params bundle (traced args, not
    HLO constants), dense copies are dropped, generation stays close to fp."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).parent))
    from helpers import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae

    from ml_stable_diffusion_tpu.pipelines import (
        PipelineConfiguration,
        StableDiffusionPipeline,
    )

    tok = tiny_tokenizer(tmp_path)
    te = tiny_text_encoder()
    unet_model, unet_params = tiny_unet()
    dec, enc = tiny_vae()

    cfg = PipelineConfiguration(prompt="cat", step_count=2, seed=0,
                                scheduler="DDIM", disable_safety=True)
    ref_pipe = StableDiffusionPipeline(
        tokenizer=tok, text_encoder=te, unet=(unet_model, unet_params),
        vae_decoder=dec, vae_encoder=enc)
    ref = ref_pipe.generate_images(cfg, image_hw=(64, 64)).latents

    import copy

    pipe = StableDiffusionPipeline(
        tokenizer=tok, text_encoder=te,
        unet=(unet_model, copy.deepcopy(unet_params)),
        vae_decoder=dec, vae_encoder=enc)
    pipe.enable_w8a8(min_size=1, skip_patterns=())
    assert pipe.int8_weights  # something quantized
    # dense copies of quantized kernels are gone from the bundle
    some_path = next(iter(pipe.int8_weights)).split("/")
    node = pipe.unet_params
    for part in some_path:
        node = node[part]
    assert "kernel" not in node

    out = pipe.generate_images(cfg, image_hw=(64, 64)).latents
    assert np.isfinite(out).all()
    assert compute_psnr(out, ref) > 15  # int8 on tiny layers is coarse
    # and it actually changed something (int8 path really ran)
    assert np.abs(out - ref).max() > 1e-6


def test_enable_w8a8_include_convs_skips_fused_upsamplers(tmp_path):
    """include_convs=True with the fused_upsample default: the upsampler
    kernels must stay dense (FusedUpsampleConv is not an nn.Conv, so the
    serving interceptor can't execute it as int8 — quantizing and deleting
    its kernel crashed the next program build, review r5)."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).parent))
    from helpers import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae

    from ml_stable_diffusion_tpu.pipelines import (
        PipelineConfiguration,
        StableDiffusionPipeline,
    )

    unet_model, unet_params = tiny_unet()
    assert unet_model.config.fused_upsample  # the default under test
    dec, enc = tiny_vae()
    pipe = StableDiffusionPipeline(
        tokenizer=tiny_tokenizer(tmp_path), text_encoder=tiny_text_encoder(),
        unet=(unet_model, unet_params), vae_decoder=dec, vae_encoder=enc)
    pipe.enable_w8a8(min_size=1, skip_patterns=(), include_convs=True)
    assert pipe.int8_weights
    assert not any("upsamplers_0" in p for p in pipe.int8_weights)
    # the dot-form 1x1 shortcut convs (_Conv1x1) ARE served, as int8 dense
    assert any("conv_shortcut" in p for p in pipe.int8_weights)
    cfg = PipelineConfiguration(prompt="cat", step_count=2, seed=0,
                                scheduler="DDIM", disable_safety=True)
    out = pipe.generate_images(cfg, image_hw=(64, 64)).latents
    assert np.isfinite(out).all()


def test_w8a8_serving_interceptor_matches_simulation(toy):
    from ml_stable_diffusion_tpu.compress.w8a8 import (
        quantizable_dense_paths,
        quantize_dense_weights_int8,
        w8a8_serving_interceptor,
    )

    model, params, x = toy

    def apply_fn(inputs):
        return model.apply({"params": params}, inputs)

    scales = capture_activation_scales(apply_fn, [x])
    paths = quantizable_dense_paths(scales)
    int8_w = quantize_dense_weights_int8(lambda p: params[p], paths)

    with nn.intercept_methods(w8a8_interceptor(scales, set(paths))):
        sim = model.apply({"params": params}, x)
    with nn.intercept_methods(w8a8_serving_interceptor(scales, int8_w)):
        served = model.apply({"params": params}, x)
    # real int8 path must match the fake-quant simulation closely
    np.testing.assert_allclose(np.asarray(served), np.asarray(sim),
                               rtol=1e-2, atol=1e-2)
    ref = model.apply({"params": params}, x)
    assert compute_psnr(np.asarray(served), np.asarray(ref)) > 25


def test_pipeline_with_w8a8_interceptor(tmp_path):
    """W8A8 serving interceptor traced into the compiled pipeline program."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).parent))
    from helpers import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae

    from ml_stable_diffusion_tpu.compress.w8a8 import w8a8_interceptor
    from ml_stable_diffusion_tpu.pipelines import (
        PipelineConfiguration,
        StableDiffusionPipeline,
    )

    tok = tiny_tokenizer(tmp_path)
    dec, _ = tiny_vae()
    unet = tiny_unet()
    te = tiny_text_encoder()
    cfg = PipelineConfiguration(prompt="a cat", step_count=2, seed=5,
                                scheduler="DDIM", disable_safety=True)
    ref_pipe = StableDiffusionPipeline(tokenizer=tok, text_encoder=te,
                                       unet=unet, vae_decoder=dec)
    ref = ref_pipe.generate_images(cfg, image_hw=(64, 64))

    scales = {"": 10.0}  # per-tensor scale applied to ALL Dense inputs

    class _AllScales(dict):
        def __contains__(self, k):
            return True

        def __getitem__(self, k):
            return 10.0

    q_pipe = StableDiffusionPipeline(
        tokenizer=tok, text_encoder=te, unet=unet, vae_decoder=dec,
        method_interceptor=w8a8_interceptor(_AllScales()))
    out = q_pipe.generate_images(cfg, image_hw=(64, 64))
    # quantization changes the result but stays in the same ballpark
    assert np.abs(out.latents - ref.latents).max() > 1e-6
    assert compute_psnr(out.latents, ref.latents) > 10
