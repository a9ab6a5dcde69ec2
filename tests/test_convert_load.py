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


def _write_safety_checker(d, always_flag=False):
    """Synthetic HF-layout safety_checker/ dir.  ``always_flag`` sets the
    concept thresholds so any image trips the NSFW rule (for wiring tests)."""
    # projection_dim matches the text encoder's hidden size (32) like real
    # SD1.x bundles (ViT-L joint space 768 == text hidden 768) so the CLIP
    # score path (utils/clip_score.py) has compatible embedding spaces.
    vision_cfg = transformers.CLIPVisionConfig(
        projection_dim=32, image_size=32, patch_size=8, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=2)
    torch.manual_seed(0)
    vm = transformers.CLIPVisionModel(vision_cfg).eval()
    sd = {f"vision_model.{k}": v.numpy() for k, v in vm.state_dict().items()}
    g = np.random.RandomState(1)
    sd["visual_projection.weight"] = g.randn(32, 32).astype(np.float32)
    sd["concept_embeds"] = g.randn(3, 32).astype(np.float32)
    thresh = -10.0 if always_flag else 10.0
    sd["concept_embeds_weights"] = np.full(3, thresh, np.float32)
    sd["special_care_embeds"] = g.randn(2, 32).astype(np.float32)
    sd["special_care_embeds_weights"] = np.full(2, 10.0, np.float32)
    d.mkdir(parents=True)
    (d / "config.json").write_text(json.dumps({
        "vision_config": {"image_size": 32, "patch_size": 8,
                          "hidden_size": 32, "intermediate_size": 64,
                          "num_hidden_layers": 2, "num_attention_heads": 2},
        "projection_dim": 32}))
    save_file(sd, str(d / "model.safetensors"))


def _write_scheduler(d, **overrides):
    d.mkdir(parents=True, exist_ok=True)
    cfg = {"_class_name": "PNDMScheduler", "num_train_timesteps": 1000,
           "beta_start": 0.00085, "beta_end": 0.012,
           "beta_schedule": "scaled_linear", "prediction_type": "epsilon",
           "steps_offset": 1, "timestep_spacing": "leading"}
    cfg.update(overrides)
    (d / "scheduler_config.json").write_text(json.dumps(cfg))


@pytest.fixture(scope="module")
def sd_checkpoint(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt")
    (root / "model_index.json").write_text(json.dumps({
        "_class_name": "StableDiffusionPipeline"}))
    _write_tokenizer(root / "tokenizer")
    _write_text_encoder(root / "text_encoder")
    _write_unet(root / "unet", sharded=True)
    _write_vae(root / "vae")
    _write_scheduler(root / "scheduler")
    _write_safety_checker(root / "safety_checker", always_flag=True)
    return root


def test_load_pipeline_end_to_end(sd_checkpoint):
    pipe = load_pipeline(sd_checkpoint, compute_dtype=jnp.float32)
    res = pipe.generate_images(
        PipelineConfiguration(prompt="cat", step_count=2, seed=0,
                              disable_safety=True, scheduler="DDIM"),
        image_hw=(64, 64))
    assert res.latents.shape == (1, 8, 8, 4)
    assert np.isfinite(res.latents).all()


def test_safety_checker_engages_through_generate(sd_checkpoint):
    """A checkpoint with a safety_checker/ dir must load it and run it per
    generation (reference pipeline.py:286-311): with always-flag thresholds
    the image comes back blacked out through generate_images."""
    pipe = load_pipeline(sd_checkpoint, compute_dtype=jnp.float32)
    assert pipe.safety_checker is not None
    res = pipe.generate_images(
        PipelineConfiguration(prompt="cat", step_count=2, seed=0,
                              scheduler="DDIM"),
        image_hw=(64, 64))
    assert res.nsfw_flags == [True]
    assert np.asarray(res.images[0]).max() == 0  # blacked out
    # --disable-safety bypasses the checker (reference main.swift:66)
    res2 = pipe.generate_images(
        PipelineConfiguration(prompt="cat", step_count=2, seed=0,
                              scheduler="DDIM", disable_safety=True),
        image_hw=(64, 64))
    assert res2.nsfw_flags == [False]


def test_scheduler_config_read_from_checkpoint(sd_checkpoint, tmp_path):
    """A v_prediction checkpoint must denoise as v-prediction without user
    flags (reference takes the scheduler from the diffusers pipe,
    pipeline.py:57-80)."""
    import shutil

    from ml_stable_diffusion_tpu.schedulers.base import PredictionType

    vpred = tmp_path / "ckpt_vpred"
    shutil.copytree(sd_checkpoint, vpred)
    _write_scheduler(vpred / "scheduler", prediction_type="v_prediction",
                     beta_end=0.02)

    pipe_eps = load_pipeline(sd_checkpoint, compute_dtype=jnp.float32)
    pipe_v = load_pipeline(vpred, compute_dtype=jnp.float32)
    assert pipe_eps.scheduler_config.prediction_type == PredictionType.EPSILON
    assert pipe_v.scheduler_config.prediction_type == PredictionType.V_PREDICTION
    assert pipe_v.scheduler_config.beta_end == 0.02

    cfg = dict(prompt="cat", step_count=2, seed=0, scheduler="DDIM",
               disable_safety=True)
    lat_eps = pipe_eps.generate_images(PipelineConfiguration(**cfg),
                                       image_hw=(64, 64)).latents
    lat_v = pipe_v.generate_images(PipelineConfiguration(**cfg),
                                   image_hw=(64, 64)).latents
    # same weights + seed, different prediction_type => different trajectory
    assert not np.allclose(lat_eps, lat_v)


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


def test_convert_time_torch_parity_gate(sd_checkpoint):
    """The converter's --check-output-correctness asserts >=35 dB vs the
    torch model (reference torch2coreml.py:80-97) — and actually trips on a
    corrupted port."""
    from ml_stable_diffusion_tpu.convert import load as _load
    from ml_stable_diffusion_tpu.convert import verify

    model, params = _load.load_text_encoder(sd_checkpoint / "text_encoder")
    psnr = verify.torch_parity_text_encoder(sd_checkpoint / "text_encoder",
                                            model, params)
    assert psnr >= 35.0

    import copy

    bad = copy.deepcopy(params)
    # swap two layers' attention weights: a classic cross-wiring port bug
    l0 = bad["layers_0"]["q_proj"]["kernel"]
    bad["layers_0"]["q_proj"]["kernel"] = bad["layers_1"]["q_proj"]["kernel"]
    bad["layers_1"]["q_proj"]["kernel"] = l0
    with pytest.raises(AssertionError):
        verify.torch_parity_text_encoder(sd_checkpoint / "text_encoder",
                                         model, bad)

    # structural gate: dropped tensors are caught
    sd = _load.load_safetensors_state_dict(sd_checkpoint / "unet")
    _, uparams = _load.load_unet(sd_checkpoint / "unet", dtype=jnp.float32)
    verify.element_count_matches(sd, uparams, "unet")
    del uparams["conv_in"]["bias"]
    with pytest.raises(AssertionError):
        verify.element_count_matches(sd, uparams, "unet")


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
