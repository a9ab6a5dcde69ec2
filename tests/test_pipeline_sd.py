"""End-to-end SD pipeline tests on tiny random models.

Covers the reference pipelines' behavioral surface (pipeline.py:403-589,
StableDiffusionPipeline.swift:208-359): determinism per seed, CFG enable
rule, schedulers, img2img, progress callbacks with early stop, serial-CFG
parity mode, RNG parity modes.
"""

import jax
import numpy as np
import pytest

from ml_stable_diffusion_tpu.pipelines import (
    PipelineConfiguration,
    StableDiffusionPipeline,
)

from helpers import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae

HW = (64, 64)


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    tok = tiny_tokenizer(tmp_path_factory.mktemp("tok"))
    dec, enc = tiny_vae()
    return StableDiffusionPipeline(
        tokenizer=tok,
        text_encoder=tiny_text_encoder(),
        unet=tiny_unet(),
        vae_decoder=dec,
        vae_encoder=enc,
    )


def _cfg(**kw):
    kw.setdefault("prompt", "a cat")
    kw.setdefault("step_count", 4)
    kw.setdefault("disable_safety", True)
    return PipelineConfiguration(**kw)


def test_txt2img_basic(pipe):
    res = pipe.generate_images(_cfg(seed=93), image_hw=HW)
    assert len(res.images) == 1
    assert res.images[0].size == (64, 64)
    assert res.latents.shape == (1, 8, 8, 4)
    assert np.isfinite(res.latents).all()


def test_determinism_and_seed_sensitivity(pipe):
    a = pipe.generate_images(_cfg(seed=93), image_hw=HW)
    b = pipe.generate_images(_cfg(seed=93), image_hw=HW)
    c = pipe.generate_images(_cfg(seed=94), image_hw=HW)
    np.testing.assert_array_equal(a.latents, b.latents)
    assert np.abs(a.latents - c.latents).max() > 1e-6


def test_negative_prompt_changes_output(pipe):
    a = pipe.generate_images(_cfg(seed=1), image_hw=HW)
    b = pipe.generate_images(_cfg(seed=1, negative_prompt="dog"), image_hw=HW)
    assert np.abs(a.latents - b.latents).max() > 1e-6


def test_guidance_disabled_below_one(pipe):
    """CFG iff guidance > 1 (reference pipeline.py:443). With guidance off,
    the negative prompt must be ignored."""
    a = pipe.generate_images(_cfg(seed=1, guidance_scale=1.0), image_hw=HW)
    b = pipe.generate_images(_cfg(seed=1, guidance_scale=1.0,
                                  negative_prompt="dog"), image_hw=HW)
    np.testing.assert_array_equal(a.latents, b.latents)


def test_unet_batch_one_matches_batched(pipe):
    """Serial CFG must be numerically equivalent to batched CFG
    (reference pipeline.py:540-557)."""
    a = pipe.generate_images(_cfg(seed=5), image_hw=HW)
    b = pipe.generate_images(_cfg(seed=5, unet_batch_one=True), image_hw=HW)
    np.testing.assert_allclose(a.latents, b.latents, atol=2e-4)


@pytest.mark.parametrize("scheduler", ["PNDM", "DPMSolverMultistep", "DDIM",
                                       "Euler", "EulerAncestral", "LMS"])
def test_schedulers_run(pipe, scheduler):
    res = pipe.generate_images(_cfg(seed=2, scheduler=scheduler), image_hw=HW)
    assert np.isfinite(res.latents).all()


@pytest.mark.parametrize("rng", ["numpy", "torch", "nvidia"])
def test_rng_parity_modes(pipe, rng):
    a = pipe.generate_images(_cfg(seed=7, rng=rng), image_hw=HW)
    b = pipe.generate_images(_cfg(seed=7, rng=rng), image_hw=HW)
    np.testing.assert_array_equal(a.latents, b.latents)
    c = pipe.generate_images(_cfg(seed=7, rng="jax"), image_hw=HW)
    assert np.abs(a.latents - c.latents).max() > 1e-6


def test_img2img(pipe):
    img = np.zeros((1, 64, 64, 3), np.float32)
    res = pipe.generate_images(_cfg(seed=3, starting_image=img, strength=0.5),
                               image_hw=HW)
    assert np.isfinite(res.latents).all()
    # strength slices the trajectory: different from full txt2img
    full = pipe.generate_images(_cfg(seed=3), image_hw=HW)
    assert np.abs(res.latents - full.latents).max() > 1e-6


def test_image_count(pipe):
    res = pipe.generate_images(_cfg(seed=4, image_count=2), image_hw=HW)
    assert len(res.images) == 2
    assert res.latents.shape[0] == 2


def test_progress_callback_and_early_stop(pipe):
    seen = []

    def handler(p):
        seen.append(p.step)
        return p.step < 2  # stop after 2 steps

    pipe.generate_images(_cfg(seed=6), progress_handler=handler, image_hw=HW)
    assert seen == [1, 2]


def test_callback_path_matches_scan_path(pipe):
    a = pipe.generate_images(_cfg(seed=8), image_hw=HW)
    b = pipe.generate_images(_cfg(seed=8), progress_handler=lambda p: True,
                             image_hw=HW)
    np.testing.assert_allclose(a.latents, b.latents, atol=1e-5)


def test_validation_errors(pipe):
    with pytest.raises(ValueError):
        pipe.generate_images(_cfg(step_count=0), image_hw=HW)
    with pytest.raises(ValueError):
        pipe.generate_images(_cfg(strength=0.0), image_hw=HW)


def test_reduce_memory_matches_default(pipe):
    """reduceMemory analog (StableDiffusionPipeline.swift:94,169-200): the
    staged per-stage-bundle path must reproduce the one-program path, with
    host-offloaded weights transferred per call."""
    a = pipe.generate_images(_cfg(seed=7), image_hw=HW)
    pipe.offload_params_to_host()
    assert isinstance(
        next(iter(jax.tree_util.tree_leaves(pipe.unet_params))), np.ndarray)
    b = pipe.generate_images(_cfg(seed=7, reduce_memory=True), image_hw=HW)
    np.testing.assert_allclose(a.latents, b.latents, atol=1e-5)
    # callback path under reduce_memory
    c = pipe.generate_images(_cfg(seed=7, reduce_memory=True),
                             progress_handler=lambda p: True, image_hw=HW)
    np.testing.assert_allclose(a.latents, c.latents, atol=1e-5)


def test_reduce_memory_stage_bundles_are_minimal(pipe):
    enc = pipe._stage_bundle("encode")
    assert "unet" not in enc and "text_encoder" in enc
    assert "vae_encoder" not in enc  # txt2img: no encoder weights
    den = pipe._stage_bundle("unet")
    assert "text_encoder" not in den and "unet" in den
    assert "vae_encoder" in pipe._stage_bundle("encode", img2img=True)


def test_non_square_size(pipe):
    """Arbitrary HxW output (reference: static shapes are baked per
    conversion, pipeline.py:110-117; here any /8-divisible size compiles)."""
    res = pipe.generate_images(_cfg(seed=11), image_hw=(64, 96))
    assert res.images[0].size == (96, 64)  # PIL (W, H)
    assert np.isfinite(res.latents).all()


def test_lcm_guidance_embedded_checkpoint(tmp_path):
    """Fully-distilled LCM checkpoint (time_cond_proj_dim): the guidance
    scale is a conditioning INPUT (diffusers LCM pipeline feeds
    w = guidance_scale - 1) and CFG never runs — the negative prompt is
    ignored even at guidance > 1, while the scale still changes the
    output through the embedding."""
    tok = tiny_tokenizer(tmp_path)
    dec, enc = tiny_vae()
    lcm_pipe = StableDiffusionPipeline(
        tokenizer=tok,
        text_encoder=tiny_text_encoder(),
        unet=tiny_unet(time_cond_proj_dim=16),
        vae_decoder=dec,
        vae_encoder=enc,
    )
    base = _cfg(seed=7, scheduler="LCM", step_count=4, guidance_scale=8.0)
    a = lcm_pipe.generate_images(base, image_hw=HW)
    assert np.isfinite(a.latents).all()
    # no CFG: negative prompt must be ignored despite guidance 8
    b = lcm_pipe.generate_images(
        _cfg(seed=7, scheduler="LCM", step_count=4, guidance_scale=8.0,
             negative_prompt="dog"), image_hw=HW)
    np.testing.assert_array_equal(a.latents, b.latents)
    # ...but the embedded w still conditions the model
    c = lcm_pipe.generate_images(
        _cfg(seed=7, scheduler="LCM", step_count=4, guidance_scale=2.0),
        image_hw=HW)
    assert np.abs(a.latents - c.latents).max() > 1e-6


def test_deepcache(pipe):
    """DeepCache compiled-in feature reuse: (a) a 1-step run is EXACT (the
    first step of every phase is full); (b) interval 2 runs and differs
    from exact (the approximation engages); (c) deterministic per seed;
    (d) incompatible modes raise."""
    exact1 = pipe.generate_images(_cfg(seed=5, step_count=1), image_hw=HW)
    dc1 = pipe.generate_images(
        _cfg(seed=5, step_count=1, deepcache_interval=2), image_hw=HW)
    np.testing.assert_allclose(dc1.latents, exact1.latents,
                               rtol=2e-5, atol=2e-5)

    exact = pipe.generate_images(_cfg(seed=5), image_hw=HW)
    a = pipe.generate_images(_cfg(seed=5, deepcache_interval=2),
                             image_hw=HW)
    b = pipe.generate_images(_cfg(seed=5, deepcache_interval=2),
                             image_hw=HW)
    np.testing.assert_array_equal(a.latents, b.latents)
    assert np.abs(a.latents - exact.latents).max() > 1e-6
    assert np.isfinite(a.latents).all()

    with pytest.raises(ValueError, match="unet_batch_one"):
        pipe.generate_images(
            _cfg(deepcache_interval=2, unet_batch_one=True), image_hw=HW)
    with pytest.raises(ValueError, match="progress_handler"):
        pipe.generate_images(_cfg(deepcache_interval=2),
                             progress_handler=lambda p: True, image_hw=HW)
    with pytest.raises(ValueError, match="deepcache_interval"):
        pipe.generate_images(_cfg(deepcache_interval=0), image_hw=HW)
    # interval >= step_count degenerates to one full pass + all-shallow
    # steps on a stale deep feature — rejected, not silently degraded
    with pytest.raises(ValueError, match="must be < step_count"):
        pipe.generate_images(_cfg(step_count=3, deepcache_interval=3),
                             image_hw=HW)
    with pytest.raises(ValueError, match="must be < step_count"):
        pipe.generate_images(_cfg(step_count=2, deepcache_interval=5),
                             image_hw=HW)
    # img2img: strength truncates the EXECUTED plan (strength 0.2 of 10
    # requested steps executes ~2) — the guard must gate on the executed
    # length, not the requested step_count (review r5)
    img = np.zeros((64, 64, 3), np.float32)
    with pytest.raises(ValueError, match="longest denoise phase"):
        pipe.generate_images(
            _cfg(step_count=10, deepcache_interval=5,
                 starting_image=img, strength=0.2), image_hw=HW)


def test_deepcache_reduce_memory_matches_full_program(pipe):
    """The staged (reduce_memory) path builds the same deepcache scan per
    phase — latents must match the one-program path bit-for-bit."""
    full = pipe.generate_images(_cfg(seed=7, deepcache_interval=2),
                                image_hw=HW)
    pipe.offload_params_to_host()
    staged = pipe.generate_images(
        _cfg(seed=7, deepcache_interval=2, reduce_memory=True),
        image_hw=HW)
    np.testing.assert_allclose(staged.latents, full.latents, atol=1e-5)
