"""Checkpoint loading tests: synthetic diffusers-layout directory -> pipeline
(the TPU analog of the reference's conversion E2E,
tests/test_stable_diffusion.py test_torch_to_coreml_conversion)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp
from safetensors.numpy import save_file

from ml_stable_diffusion_tpu.convert import (
    load_module,
    load_pipeline,
    load_safetensors_state_dict,
    save_module,
)
from ml_stable_diffusion_tpu.models.unet import UNetConfig, UNet2DConditionModel
from ml_stable_diffusion_tpu.models.vae import VAEConfig, VAEDecoder, VAEEncoder
from ml_stable_diffusion_tpu.pipelines import PipelineConfiguration

from helpers import flax_params_to_diffusers_sd

def _write_tokenizer(d):
    chars = "abcdefghijklmnopqrstuvwxyz"
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    vocab["!"] = len(vocab)
    vocab["<|startoftext|>"] = 98
    vocab["<|endoftext|>"] = 99
    d.mkdir(parents=True)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")


def _write_text_encoder(d, with_projection=False, projection_dim=16):
    cfg = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="gelu",
        eos_token_id=99, bos_token_id=98, projection_dim=projection_dim)
    torch.manual_seed(0)
    cls = (transformers.CLIPTextModelWithProjection if with_projection
           else transformers.CLIPTextModel)
    tm = cls(cfg).eval()
    d.mkdir(parents=True)
    (d / "config.json").write_text(json.dumps({
        "architectures": [cls.__name__], "vocab_size": 100,
        "hidden_size": 32, "intermediate_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 2, "max_position_embeddings": 77,
        "hidden_act": "gelu", "eos_token_id": 99,
        "projection_dim": projection_dim}))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    save_file(sd, str(d / "model.safetensors"))


UNET_CFG = UNetConfig(
    block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    transformer_layers_per_block=(1, 1),
    num_attention_heads=(2, 2),
    cross_attention_dim=32,
    norm_num_groups=8,
)


def _write_unet(d, sharded=False):
    model = UNet2DConditionModel(UNET_CFG)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 32)))["params"]
    sd = flax_params_to_diffusers_sd(params, "unet")
    d.mkdir(parents=True)
    (d / "config.json").write_text(json.dumps({
        "in_channels": 4, "out_channels": 4,
        "block_out_channels": [16, 32],
        "down_block_types": list(UNET_CFG.down_block_types),
        "up_block_types": list(UNET_CFG.up_block_types),
        "layers_per_block": 1,
        "transformer_layers_per_block": [1, 1],
        "attention_head_dim": [2, 2],
        "cross_attention_dim": 32, "norm_num_groups": 8}))
    if sharded:
        keys = sorted(sd)
        half = len(keys) // 2
        save_file({k: sd[k] for k in keys[:half]},
                  str(d / "model-00001-of-00002.safetensors"))
        save_file({k: sd[k] for k in keys[half:]},
                  str(d / "model-00002-of-00002.safetensors"))
        (d / "model.safetensors.index.json").write_text(json.dumps({
            "weight_map": {k: ("model-00001-of-00002.safetensors" if i < half
                               else "model-00002-of-00002.safetensors")
                           for i, k in enumerate(keys)}}))
    else:
        save_file(sd, str(d / "model.safetensors"))
    return params


VAE_CFG = VAEConfig(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                    norm_num_groups=4)


def _write_vae(d):
    enc = VAEEncoder(VAE_CFG)
    dec = VAEDecoder(VAE_CFG)
    ep = jax.jit(enc.init)(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))["params"]
    dp = jax.jit(dec.init)(jax.random.key(2), jnp.zeros((1, 8, 8, 4)))["params"]
    sd = flax_params_to_diffusers_sd(ep, "vae_encoder")
    sd.update(flax_params_to_diffusers_sd(dp, "vae_decoder"))
    d.mkdir(parents=True)
    (d / "config.json").write_text(json.dumps({
        "latent_channels": 4, "block_out_channels": [8, 8, 8, 8],
        "layers_per_block": 1, "norm_num_groups": 4}))
    save_file(sd, str(d / "diffusion_pytorch_model.safetensors"))


@pytest.fixture(scope="module")
def sd_checkpoint(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt")
    (root / "model_index.json").write_text(json.dumps({
        "_class_name": "StableDiffusionPipeline"}))
    _write_tokenizer(root / "tokenizer")
    _write_text_encoder(root / "text_encoder")
    _write_unet(root / "unet", sharded=True)
    _write_vae(root / "vae")
    return root


def test_load_pipeline_end_to_end(sd_checkpoint):
    pipe = load_pipeline(sd_checkpoint, compute_dtype=jnp.float32)
    res = pipe.generate_images(
        PipelineConfiguration(prompt="cat", step_count=2, seed=0,
                              disable_safety=True, scheduler="DDIM"),
        image_hw=(64, 64))
    assert res.latents.shape == (1, 8, 8, 4)
    assert np.isfinite(res.latents).all()


def test_sharded_safetensors_loading(sd_checkpoint):
    sd = load_safetensors_state_dict(sd_checkpoint / "unet")
    assert "conv_in.weight" in sd
    assert sd["conv_in.weight"].shape == (16, 4, 3, 3)


def test_unet_load_matches_original(sd_checkpoint, tmp_path):
    """Porting the synthetic checkpoint must reproduce the original params."""
    from ml_stable_diffusion_tpu.convert import load_unet

    d = tmp_path / "unet2"
    orig = _write_unet(d)
    model, params = load_unet(d, dtype=jnp.float32)
    for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(orig),
            jax.tree_util.tree_leaves_with_path(params)):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=jax.tree_util.keystr(pa))


def test_artifact_store_roundtrip(tmp_path):
    model = UNet2DConditionModel(UNET_CFG)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 32)))["params"]
    save_module(tmp_path, params, config=UNET_CFG, name="unet")
    loaded, manifest = load_module(tmp_path, name="unet")
    assert manifest["config"]["cross_attention_dim"] == 32
    for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(loaded)):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
