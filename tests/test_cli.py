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
