"""Inpainting tests (beyond the reference): legacy latent-blend masking on
any SD model, and 9-channel inpainting-UNet checkpoints.

Key oracle: with an all-zeros mask (keep everything) the final latents must
equal the ENCODED INIT LATENTS exactly — the last blend substitutes the
clean z0 — reproducible host-side under the numpy RNG parity mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_stable_diffusion_tpu.models.unet import UNetConfig, UNet2DConditionModel
from ml_stable_diffusion_tpu.models.vae import sample_diagonal_gaussian
from ml_stable_diffusion_tpu.pipelines import (
    PipelineConfiguration,
    StableDiffusionPipeline,
)
from ml_stable_diffusion_tpu.schedulers import SCHEDULER_MAP
from ml_stable_diffusion_tpu.utils.image import nchw_to_nhwc
from ml_stable_diffusion_tpu.utils.rng import make_random_source

from helpers import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae

HW = (64, 64)


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    tok = tiny_tokenizer(tmp_path_factory.mktemp("tok"))
    dec, enc = tiny_vae()
    return StableDiffusionPipeline(
        tokenizer=tok, text_encoder=tiny_text_encoder(), unet=tiny_unet(),
        vae_decoder=dec, vae_encoder=enc)


def _init_image():
    rng = np.random.default_rng(3)
    return rng.uniform(-0.6, 0.6, size=(1, 64, 64, 3)).astype(np.float32)


def _cfg(**kw):
    kw.setdefault("prompt", "a cat")
    kw.setdefault("step_count", 3)
    kw.setdefault("seed", 11)
    kw.setdefault("disable_safety", True)
    kw.setdefault("scheduler", "DDIM")
    return PipelineConfiguration(**kw)


def test_mask_requires_starting_image(pipe):
    with pytest.raises(ValueError, match="starting_image"):
        pipe.generate_images(_cfg(mask_image=np.ones((64, 64), np.float32)),
                             image_hw=HW)


def test_all_ones_mask_equals_plain_img2img(pipe):
    """mask == 1 everywhere -> the blend is the identity; the result must
    match plain img2img with the same seed."""
    img = _init_image()
    a = pipe.generate_images(
        _cfg(starting_image=img, strength=0.8), image_hw=HW).latents
    b = pipe.generate_images(
        _cfg(starting_image=img, strength=0.8,
             mask_image=np.ones((64, 64), np.float32)), image_hw=HW).latents
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("name", ["DDIM", "Euler", "EulerAncestral", "LMS",
                                  "DPMSolverMultistep", "PNDM"])
def test_zero_mask_returns_encoded_init_every_scheduler(pipe, name):
    """mask == 0 (keep all): the final latents are exactly the clean
    encoded init latents, for every scheduler family (DDPM-space,
    sigma-space, multistep) — the blend's re-noising trajectory ends at
    z0.  numpy RNG parity mode makes z0 reproducible host-side."""
    img = _init_image()
    res = pipe.generate_images(
        _cfg(starting_image=img, rng="numpy", scheduler=name,
             mask_image=np.zeros((64, 64), np.float32)), image_hw=HW)
    # reconstruct z0 with the same host noise stream
    src = make_random_source("numpy", 11)
    noise = nchw_to_nhwc(src.normal((1, 4, 8, 8))).astype(np.float32)
    moments = pipe.vae_encoder.apply(
        {"params": pipe.vae_encoder_params}, jnp.asarray(img))
    z0 = np.asarray(sample_diagonal_gaussian(moments, jnp.asarray(noise))
                    ) * pipe.default_latent_scale
    np.testing.assert_allclose(res.latents, z0, atol=2e-5, rtol=2e-5)


def test_half_mask_keeps_known_region_prompt_invariant(pipe):
    """The kept half must not depend on the prompt; the repainted half
    must."""
    img = _init_image()
    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0  # repaint left half
    a = pipe.generate_images(
        _cfg(prompt="a cat", starting_image=img, mask_image=mask),
        image_hw=HW).latents
    b = pipe.generate_images(
        _cfg(prompt="a dog on mars", starting_image=img, mask_image=mask),
        image_hw=HW).latents
    # latent left half (cols 0:4) repainted, right half (4:8) kept
    np.testing.assert_array_equal(a[:, :, 4:, :], b[:, :, 4:, :])
    assert np.abs(a[:, :, :4, :] - b[:, :, :4, :]).max() > 1e-6


@pytest.mark.slow
def test_progress_callback_path_blends_identically(pipe):
    """The per-step (callback) program path must produce the same inpainted
    latents as the fused scan path."""
    img = _init_image()
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    a = pipe.generate_images(
        _cfg(starting_image=img, mask_image=mask), image_hw=HW).latents
    b = pipe.generate_images(
        _cfg(starting_image=img, mask_image=mask), image_hw=HW,
        progress_handler=lambda p: True).latents
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def _tiny_unet9():
    cfg = UNetConfig(
        in_channels=9,
        block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, transformer_layers_per_block=(1, 1),
        num_attention_heads=(2, 2), cross_attention_dim=48,
        norm_num_groups=8)
    model = UNet2DConditionModel(cfg)
    params = jax.jit(model.init)(
        jax.random.key(4), jnp.zeros((1, 8, 8, 9)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 48)))["params"]
    return model, params


@pytest.fixture(scope="module")
def pipe9(tmp_path_factory):
    tok = tiny_tokenizer(tmp_path_factory.mktemp("tok9"))
    dec, enc = tiny_vae()
    return StableDiffusionPipeline(
        tokenizer=tok, text_encoder=tiny_text_encoder(), unet=_tiny_unet9(),
        vae_decoder=dec, vae_encoder=enc)


def test_unet9_requires_mask(pipe9):
    with pytest.raises(ValueError, match="9-channel"):
        pipe9.generate_images(_cfg(), image_hw=HW)


@pytest.mark.slow
def test_unet9_inpaint_runs_and_mask_matters(pipe9):
    img = _init_image()
    m0 = np.zeros((64, 64), np.float32)
    m1 = np.ones((64, 64), np.float32)
    a = pipe9.generate_images(
        _cfg(starting_image=img, mask_image=m0), image_hw=HW)
    b = pipe9.generate_images(
        _cfg(starting_image=img, mask_image=m1), image_hw=HW)
    assert np.isfinite(a.latents).all() and np.isfinite(b.latents).all()
    # the mask + masked-image channels condition the model: outputs differ
    assert np.abs(a.latents - b.latents).max() > 1e-6
    assert len(a.images) == 1


def test_add_noise_index_consistency():
    """add_noise(i) must agree with the scheduler's own trajectory tables
    at every step, not just step 0 (the inpainting re-noise path)."""
    for name in ("DDIM", "Euler", "DPMSolverMultistep", "PNDM"):
        sched = SCHEDULER_MAP[name]()
        plan = sched.set_timesteps(6)
        z0 = jnp.ones((1, 4, 4, 4)) * 0.5
        n = jnp.ones((1, 4, 4, 4))
        first = sched.add_noise(plan, z0, n)
        first_i = sched.add_noise(plan, z0, n, 0)
        np.testing.assert_allclose(np.asarray(first), np.asarray(first_i))
        # later steps are strictly less noisy for monotone schedules
        late = sched.add_noise(plan, z0, n, plan.num_steps - 1)
        assert np.abs(np.asarray(late) - 0.5).max() < np.abs(
            np.asarray(first) - 0.5).max()
