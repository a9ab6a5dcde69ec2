"""CLI tests over a synthetic checkpoint (flag surfaces mirror the reference
CLIs: pipeline.py:785-857, main.swift:22-105, torch2coreml.py:1603-1780)."""

import json

import numpy as np
import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")

from ml_stable_diffusion_tpu.cli import benchmark as cli_benchmark
from ml_stable_diffusion_tpu.cli import compress as cli_compress
from ml_stable_diffusion_tpu.cli import convert as cli_convert
from ml_stable_diffusion_tpu.cli import generate as cli_generate

from test_convert_load import (  # noqa: F401  (fixture)
    _write_safety_checker,
    _write_tokenizer,
    _write_text_encoder,
    _write_unet,
    _write_vae,
    sd_checkpoint,
)


def test_generate_cli(sd_checkpoint, tmp_path):
    args = cli_generate.parser_spec().parse_args([
        "a cat", "-i", str(sd_checkpoint), "-o", str(tmp_path),
        "--step-count", "2", "--size", "64x64", "--scheduler", "DDIM",
        "--disable-safety", "--seed", "7",
    ])
    paths = cli_generate.run(args)
    assert len(paths) == 1
    assert paths[0].exists()
    assert paths[0].name == "a_cat.7.0.png"


def test_generate_cli_save_every(sd_checkpoint, tmp_path):
    args = cli_generate.parser_spec().parse_args([
        "--prompt", "dog", "-i", str(sd_checkpoint), "-o", str(tmp_path),
        "--step-count", "2", "--size", "64x64", "--scheduler", "DDIM",
        "--disable-safety", "--save-every", "1",
    ])
    cli_generate.run(args)
    files = sorted(p.name for p in tmp_path.glob("*.png"))
    assert "dog.93.0.png" in files
    assert any("step1" in f for f in files)


def test_benchmark_cli(sd_checkpoint, tmp_path):
    out = tmp_path / "benchmark.json"
    args = cli_benchmark.parser_spec().parse_args([
        "-i", str(sd_checkpoint), "--step-count", "2", "--size", "64x64",
        "--scheduler", "DDIM", "--repeats", "2", "-o", str(out),
    ])
    report = cli_benchmark.run(args)
    assert out.exists()
    assert report["diffusion_iters_per_s"] > 0
    assert json.loads(out.read_text())["step_count"] == 2


def test_benchmark_cli_clip_score(sd_checkpoint, tmp_path):
    """Opt-in CLIP quality gate (reference test_image_to_prompt_clip_score,
    threshold 0.3): scores ride benchmark.json and the gate trips below
    --min-clip-score.  The score requires a FULL CLIP bundle whose text
    encoder carries a text_projection into the vision joint space
    (--clip-checkpoint); the SD1.x-style bundled encoder (no projection)
    is rejected by the joint-space guard even though its pooled dim
    coincidentally matches (advisor finding r4)."""
    clip_dir = tmp_path / "clip"
    _write_tokenizer(clip_dir / "tokenizer")
    _write_text_encoder(clip_dir / "text_encoder", with_projection=True,
                        projection_dim=32)
    _write_safety_checker(clip_dir / "safety_checker")

    out = tmp_path / "benchmark.json"
    base = ["-i", str(sd_checkpoint), "--step-count", "2", "--size", "64x64",
            "--scheduler", "DDIM", "--repeats", "1", "-o", str(out),
            "--clip-score", "--clip-checkpoint", str(clip_dir)]
    args = cli_benchmark.parser_spec().parse_args(
        base + ["--min-clip-score", "-1.0"])
    report = cli_benchmark.run(args)
    assert -1.0 <= report["clip_score"] <= 1.0
    assert json.loads(out.read_text())["clip_score"] == report["clip_score"]

    args = cli_benchmark.parser_spec().parse_args(
        base + ["--min-clip-score", "1.1"])
    with pytest.raises(SystemExit, match="quality gate"):
        cli_benchmark.run(args)

    # SD1.x-style encoder (no text_projection): guarded, not silently scored
    args = cli_benchmark.parser_spec().parse_args(
        ["-i", str(sd_checkpoint), "--step-count", "2", "--size", "64x64",
         "--scheduler", "DDIM", "--repeats", "1", "-o", str(out),
         "--clip-score", "--min-clip-score", "-1.0"])
    with pytest.raises(ValueError, match="text_projection"):
        cli_benchmark.run(args)


def test_convert_cli(sd_checkpoint, tmp_path):
    args = cli_convert.parser_spec().parse_args([
        "-i", str(sd_checkpoint), "-o", str(tmp_path), "--convert-all",
        "--bundle-resources-for-generation",
    ])
    cli_convert.run(args)
    for name in ("TextEncoder", "Unet", "VAEDecoder", "VAEEncoder"):
        assert (tmp_path / f"{name}.safetensors").exists(), name
        assert (tmp_path / f"{name}.json").exists(), name
    assert (tmp_path / "vocab.json").exists()


@pytest.mark.slow
def test_convert_quantize_whole_bundle(sd_checkpoint, tmp_path):
    """--quantize-nbits palettizes the WHOLE bundle like the reference
    (torch2coreml.py:185-204: text encoders + denoiser; VAE stays dense),
    and the palettized bundle loads and generates."""
    args = cli_convert.parser_spec().parse_args([
        "-i", str(sd_checkpoint), "-o", str(tmp_path), "--convert-all",
        "--quantize-nbits", "6", "--palettize-min-size", "64",
        "--bundle-resources-for-generation",
    ])
    cli_convert.run(args)
    for name in ("TextEncoder", "Unet"):
        manifest = json.loads((tmp_path / f"{name}.json").read_text())
        assert manifest.get("palettized"), name
    vae_manifest = json.loads((tmp_path / "VAEDecoder.json").read_text())
    assert not vae_manifest.get("palettized")

    from ml_stable_diffusion_tpu.convert.load import (
        load_pipeline_from_artifacts,
    )
    from ml_stable_diffusion_tpu.pipelines import PipelineConfiguration

    pipe = load_pipeline_from_artifacts(tmp_path)
    res = pipe.generate_images(
        PipelineConfiguration(prompt="a cat", step_count=2, scheduler="DDIM",
                              disable_safety=True, seed=5),
        image_hw=(64, 64))
    assert np.isfinite(res.latents).all()


@pytest.mark.slow
def test_compress_cli_mbp_flow(sd_checkpoint, tmp_path):
    analysis = tmp_path / "analysis.json"
    args = cli_compress.parser_spec().parse_args([
        "mbp-analyze", "-i", str(sd_checkpoint), "-o", str(analysis),
        "--nbits", "4", "8", "--size", "64x64",
    ])
    cli_compress.run(args)
    data = json.loads(analysis.read_text())
    # tiny unet: kernels below the default min size -> may be empty, but the
    # file and structure must exist
    assert "single_layer" in data
    # baseline variants ride in the analysis (pre_analysis.py:376-434)
    assert set(data["baselines"]) == {"serving_bf16", "linear_8bit"}
    assert data["baselines"]["serving_bf16"] > 20.0

    report_md = tmp_path / "report.md"
    report_json = tmp_path / "report.json"
    args = cli_compress.parser_spec().parse_args([
        "mbp-report", "-i", str(analysis), "--checkpoint",
        str(sd_checkpoint), "-o", str(report_md),
        "--output-json", str(report_json),
    ])
    cli_compress.run(args)
    assert "Mixed-bit palettization report" in report_md.read_text()
    # machine-readable tradeoff series (the reference plot's raw data,
    # pre_analysis.py:376-434): one row per recipe with the curve columns
    series = json.loads(report_json.read_text())
    assert len(series["rows"]) == 3  # default thresholds 35/40/45 dB
    for row in series["rows"]:
        assert {"recipe", "avg_bits", "size_mb",
                "estimated_psnr_db"} <= set(row)
    assert series["baselines"]["serving_bf16"] > 20.0

    recipe_json = tmp_path / "recipe.json"
    args = cli_compress.parser_spec().parse_args([
        "mbp-build-recipe", "-i", str(analysis), "-o", str(recipe_json),
        "--psnr-threshold", "40",
    ])
    cli_compress.run(args)
    assert recipe_json.exists()

    out_dir = tmp_path / "compressed"
    args = cli_compress.parser_spec().parse_args([
        "mbp-apply", "-i", str(sd_checkpoint), "--recipe", str(recipe_json),
        "-o", str(out_dir),
    ])
    cli_compress.run(args)
    assert (out_dir / "Unet.safetensors").exists()


@pytest.mark.slow
def test_w8a8_calibrate_analyze_generate_roundtrip(sd_checkpoint, tmp_path):
    """The reference's calibrate -> sweep-with-gates -> serve flow
    (activation_quantization.py:342-448): w8a8-calibrate writes real
    per-module scales, w8a8-analyze gates layers at the 40/30 dB class
    thresholds and emits a recipe, and generate --w8a8 --w8a8-scales
    consumes it end-to-end."""
    scales_json = tmp_path / "scales.json"
    args = cli_compress.parser_spec().parse_args([
        "w8a8-calibrate", "-i", str(sd_checkpoint), "-o", str(scales_json),
        "--size", "64x64", "--probe-prompts", "2",
    ])
    cli_compress.run(args)
    scales = json.loads(scales_json.read_text())
    assert scales and all(v > 0 for v in scales.values())
    assert any("attn" in k for k in scales)

    recipe_json = tmp_path / "w8a8_recipe.json"
    args = cli_compress.parser_spec().parse_args([
        "w8a8-analyze", "-i", str(sd_checkpoint), "--scales",
        str(scales_json), "-o", str(recipe_json), "--size", "64x64",
        "--probe-prompts", "2",
    ])
    cli_compress.run(args)
    recipe = json.loads(recipe_json.read_text())
    assert set(recipe) >= {"act_scales", "skip", "single_layer",
                           "cumulative", "thresholds"}
    # every kept cumulative entry honors its class threshold shape-wise
    assert all(isinstance(v, float) for v in recipe["single_layer"].values())

    out = tmp_path / "img"
    args = cli_generate.parser_spec().parse_args([
        "a cat", "-i", str(sd_checkpoint), "-o", str(out),
        "--step-count", "2", "--size", "64x64", "--scheduler", "DDIM",
        "--disable-safety", "--w8a8", "--w8a8-scales", str(recipe_json),
    ])
    paths = cli_generate.run(args)
    assert paths and paths[0].exists()


def test_w8a8_calibrated_beats_constant_scales():
    """Calibrated activation scales must reconstruct the fp output at least
    as well as the uniform ConstantScales(8.0) default on a tiny UNet
    (VERDICT r2 weak #7: the default-quality claim was untested)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from ml_stable_diffusion_tpu.compress.w8a8 import (
        ConstantScales,
        capture_activation_scales,
        quantizable_dense_paths,
        w8a8_interceptor,
    )
    from ml_stable_diffusion_tpu.convert.report import compute_psnr
    from helpers import tiny_unet

    model, params = tiny_unet()
    rng = np.random.RandomState(0)
    lat = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
    t = jnp.full((2,), 500.0)
    ctx = jnp.asarray(rng.randn(2, 77, 48) * 3.0, jnp.float32)

    def fwd(interceptor=None):
        if interceptor is None:
            return model.apply({"params": params}, lat, t, ctx)
        with nn.intercept_methods(interceptor):
            return model.apply({"params": params}, lat, t, ctx)

    ref = np.asarray(fwd())
    calibrated = capture_activation_scales(
        lambda inp: model.apply({"params": params}, *inp), [(lat, t, ctx)])
    assert calibrated
    paths = set(quantizable_dense_paths(calibrated))
    cal_out = np.asarray(fwd(w8a8_interceptor(calibrated, paths)))
    const_out = np.asarray(fwd(w8a8_interceptor(ConstantScales(8.0), paths)))
    cal_psnr = compute_psnr(cal_out, ref)
    const_psnr = compute_psnr(const_out, ref)
    assert cal_psnr >= const_psnr - 0.5, (cal_psnr, const_psnr)
    assert cal_psnr > 25.0, cal_psnr


def test_convert_multilingual_projection(tmp_path):
    import torch

    lin = torch.nn.Linear(512, 64)
    ckpt = tmp_path / "proj.pt"
    torch.save(lin.state_dict(), ckpt)
    out = tmp_path / "out"
    args = cli_convert.parser_spec().parse_args([
        "-i", str(tmp_path), "-o", str(out),
        "--convert-multilingual-projection", str(ckpt)])
    cli_convert.run(args)
    assert (out / "MultilingualTextEncoderProjection.safetensors").exists()


def test_generate_cli_fuse_qkv(sd_checkpoint, tmp_path):
    args = cli_generate.parser_spec().parse_args([
        "a cat", "-i", str(sd_checkpoint), "-o", str(tmp_path),
        "--step-count", "2", "--size", "64x64", "--scheduler", "DDIM",
        "--disable-safety", "--fuse-qkv",
    ])
    paths = cli_generate.run(args)
    assert paths[0].exists()


def test_generate_cli_lora_ti_inpaint(sd_checkpoint, tmp_path):
    """--lora / --textual-inversion / --image+--mask flag wiring: the CLI
    merges the adapter, registers the placeholder, and runs the masked
    generation end-to-end, changing the output vs the plain run."""
    from PIL import Image

    from ml_stable_diffusion_tpu.convert import load_pipeline
    from ml_stable_diffusion_tpu.convert.native_io import save_file

    # introspect the tiny checkpoint's dims to author adapter files
    probe = load_pipeline(sd_checkpoint)
    te_kern = np.asarray(
        probe.text_encoder_params["layers_0"]["q_proj"]["kernel"])
    cin, cout = te_kern.shape
    hidden = te_kern.shape[0]
    rng = np.random.default_rng(0)
    lora_path = tmp_path / "adapter.safetensors"
    save_file({
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj"
        ".lora_down.weight": rng.normal(size=(2, cin)).astype(np.float32),
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj"
        ".lora_up.weight": rng.normal(size=(cout, 2)).astype(np.float32),
    }, lora_path)
    ti_path = tmp_path / "thing.safetensors"
    save_file({"emb_params":
               rng.normal(size=(2, hidden)).astype(np.float32) * 0.02},
              ti_path)
    img_path = tmp_path / "init.png"
    Image.fromarray(
        rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)).save(img_path)
    mask_path = tmp_path / "mask.png"
    mask = np.zeros((64, 64), np.uint8)
    mask[:, 32:] = 255
    Image.fromarray(mask).save(mask_path)

    base_args = ["a <thing> cat", "-i", str(sd_checkpoint),
                 "--step-count", "2", "--size", "64x64", "--scheduler",
                 "DDIM", "--disable-safety", "--seed", "7",
                 "--image", str(img_path), "--mask", str(mask_path),
                 "--textual-inversion", f"{ti_path}:<thing>"]
    out_a = tmp_path / "a"
    args = cli_generate.parser_spec().parse_args(
        base_args + ["-o", str(out_a)])
    paths = cli_generate.run(args)
    assert len(paths) == 1 and paths[0].exists()

    out_b = tmp_path / "b"
    args = cli_generate.parser_spec().parse_args(
        base_args + ["-o", str(out_b), "--lora", f"{lora_path}:0.7"])
    paths_b = cli_generate.run(args)
    a = np.asarray(Image.open(paths[0]), np.int32)
    b = np.asarray(Image.open(paths_b[0]), np.int32)
    assert np.abs(a - b).max() > 0  # the LoRA changed the generation
