"""Artifact bundles for SDXL and SD3: save -> load_pipeline_from_artifacts ->
generate must match the directly-constructed pipeline (the analog of the
reference's cross-runtime parity test, test_stable_diffusion.py:170-216,
over the full Resources/ module set, XL+Resources.swift:82-98 /
SD3+Resources.swift)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from ml_stable_diffusion_tpu.convert import load_pipeline_from_artifacts
from ml_stable_diffusion_tpu.convert.artifacts import save_module
from ml_stable_diffusion_tpu.pipelines import PipelineConfiguration
from ml_stable_diffusion_tpu.tokenizer import CLIPTokenizer

from helpers import tiny_text_encoder, tiny_vae

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from test_pipeline_sdxl import XL_CTX, _xl_unet  # noqa: E402
from test_pipeline_sd3 import POOLED, _tiny_mmdit, _tiny_vae16  # noqa: E402


def _write_tok(d):
    chars = "abcdefghijklmnopqrstuvwxyz"
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    vocab["!"] = len(vocab)
    vocab["<|startoftext|>"] = 98
    vocab["<|endoftext|>"] = 99
    d.mkdir(parents=True, exist_ok=True)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")


def _cfg(**kw):
    kw.setdefault("prompt", "a cat")
    kw.setdefault("step_count", 2)
    kw.setdefault("seed", 5)
    kw.setdefault("disable_safety", True)
    return PipelineConfiguration(**kw)


def test_sdxl_artifact_bundle_parity(tmp_path):
    from ml_stable_diffusion_tpu.pipelines.sdxl import StableDiffusionXLPipeline

    te1 = tiny_text_encoder()
    te2 = tiny_text_encoder(use_projection=True)
    unet = _xl_unet(XL_CTX, 6)
    refiner = _xl_unet(48, 5)  # refiner attends to te2 context only
    dec, enc = tiny_vae()

    out = tmp_path / "bundle"
    _write_tok(out)
    _write_tok(out / "tokenizer_2")
    save_module(out, te1[1], config=te1[0].config, name="TextEncoder")
    save_module(out, te2[1], config=te2[0].config, name="TextEncoder2")
    save_module(out, unet[1], config=unet[0].config, name="Unet")
    save_module(out, refiner[1], config=refiner[0].config, name="RefinerUnet")
    save_module(out, dec[1], config=dec[0].config, name="VAEDecoder")
    save_module(out, enc[1], config=enc[0].config, name="VAEEncoder")
    (out / "bundle.json").write_text(json.dumps({
        "family": "StableDiffusionXLPipeline", "scheduler": None,
        "force_zeros_for_empty_prompt": True, "controlnets": []}))

    tok = CLIPTokenizer.from_pretrained_dir(out)
    tok2 = CLIPTokenizer.from_pretrained_dir(out / "tokenizer_2",
                                             pad_token="!")
    ref_pipe = StableDiffusionXLPipeline(
        tokenizer=tok, tokenizer2=tok2, text_encoder=te1, text_encoder2=te2,
        unet=unet, refiner_unet=refiner, vae_decoder=dec, vae_encoder=enc)
    ref = ref_pipe.generate_images(_cfg(), image_hw=(64, 64)).latents

    pipe = load_pipeline_from_artifacts(out, compute_dtype=jnp.float32)
    assert pipe.refiner_unet is not None
    got = pipe.generate_images(_cfg(), image_hw=(64, 64)).latents
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_sd3_artifact_bundle_parity(tmp_path):
    from ml_stable_diffusion_tpu.pipelines.sd3 import StableDiffusion3Pipeline

    te1 = tiny_text_encoder(use_projection=True)
    te2 = tiny_text_encoder(use_projection=True)
    mmdit = _tiny_mmdit()
    dec, enc = _tiny_vae16()

    out = tmp_path / "bundle"
    _write_tok(out)
    _write_tok(out / "tokenizer_2")
    save_module(out, te1[1], config=te1[0].config, name="TextEncoder")
    save_module(out, te2[1], config=te2[0].config, name="TextEncoder2")
    save_module(out, mmdit[1], config=mmdit[0].config, name="MMDiT")
    save_module(out, dec[1], config=dec[0].config, name="VAEDecoder")
    (out / "bundle.json").write_text(json.dumps({
        "family": "StableDiffusion3Pipeline", "scheduler": None}))

    tok = CLIPTokenizer.from_pretrained_dir(out)
    tok2 = CLIPTokenizer.from_pretrained_dir(out / "tokenizer_2",
                                             pad_token="!")
    ref_pipe = StableDiffusion3Pipeline(
        tokenizer=tok, tokenizer2=tok2, text_encoder=te1, text_encoder2=te2,
        mmdit=mmdit, vae_decoder=dec)
    ref = ref_pipe.generate_images(_cfg(), image_hw=(64, 64)).latents

    pipe = load_pipeline_from_artifacts(out, compute_dtype=jnp.float32)
    got = pipe.generate_images(_cfg(), image_hw=(64, 64)).latents
    assert got.shape == (1, 8, 8, 16)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_sd3_controlnet_artifact_roundtrip(tmp_path):
    """SD3 ControlNet modules ride artifact bundles: class-aware
    reconstruction (manifest config_class) + generate parity vs the
    directly-constructed pipeline with a control input."""
    import jax
    from ml_stable_diffusion_tpu.models.controlnet_sd3 import (
        SD3ControlNetConfig,
        SD3ControlNetModel,
    )
    from ml_stable_diffusion_tpu.pipelines.sd3 import StableDiffusion3Pipeline

    te1 = tiny_text_encoder(use_projection=True)
    te2 = tiny_text_encoder(use_projection=True)
    mmdit = _tiny_mmdit()
    dec, enc = _tiny_vae16()

    cn_cfg = SD3ControlNetConfig(mmdit=mmdit[0].config, num_layers=1)
    cn = SD3ControlNetModel(cn_cfg)
    cn_p = jax.jit(cn.init)(
        jax.random.key(1), jnp.zeros((1, 8, 8, 16)), jnp.zeros((1,)),
        jnp.zeros((1, 10, mmdit[0].config.context_dim)),
        jnp.zeros((1, 2 * POOLED)), jnp.zeros((1, 8, 8, 16)))["params"]
    cn_p["controlnet_blocks_0"]["kernel"] = jax.random.normal(
        jax.random.key(2), cn_p["controlnet_blocks_0"]["kernel"].shape) * 0.05
    cn_p["patch_proj_input"]["kernel"] = jax.random.normal(
        jax.random.key(3), cn_p["patch_proj_input"]["kernel"].shape) * 0.05

    out = tmp_path / "bundle"
    _write_tok(out)
    _write_tok(out / "tokenizer_2")
    save_module(out, te1[1], config=te1[0].config, name="TextEncoder")
    save_module(out, te2[1], config=te2[0].config, name="TextEncoder2")
    save_module(out, mmdit[1], config=mmdit[0].config, name="MMDiT")
    save_module(out, dec[1], config=dec[0].config, name="VAEDecoder")
    save_module(out, enc[1], config=enc[0].config, name="VAEEncoder")
    save_module(out, cn_p, config=cn_cfg, name="ControlNet-canny")
    (out / "bundle.json").write_text(json.dumps({
        "family": "StableDiffusion3Pipeline", "scheduler": None,
        "controlnets": ["ControlNet-canny"]}))

    control = np.zeros((64, 64, 3), np.uint8)
    control[:, 32:] = 255
    cfg = _cfg(controlnet_inputs=[control])

    tok = CLIPTokenizer.from_pretrained_dir(out)
    tok2 = CLIPTokenizer.from_pretrained_dir(out / "tokenizer_2",
                                             pad_token="!")
    ref_pipe = StableDiffusion3Pipeline(
        tokenizer=tok, tokenizer2=tok2, text_encoder=te1, text_encoder2=te2,
        mmdit=mmdit, vae_decoder=dec, vae_encoder=enc,
        controlnets=[(cn, cn_p)])
    ref = ref_pipe.generate_images(cfg, image_hw=(64, 64)).latents

    pipe = load_pipeline_from_artifacts(out, compute_dtype=jnp.float32)
    assert len(pipe.controlnets) == 1
    got = pipe.generate_images(_cfg(controlnet_inputs=[control]),
                               image_hw=(64, 64)).latents
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # and the control input matters through the loaded pipeline
    other = pipe.generate_images(
        _cfg(controlnet_inputs=[255 - control]), image_hw=(64, 64)).latents
    assert float(np.abs(other - got).max()) > 1e-6
