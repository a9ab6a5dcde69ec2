"""SDXL pipeline tests: dual encoders, micro-conditioning, refiner handoff,
force_zeros_for_empty_prompt (reference StableDiffusionXLPipeline.swift)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_stable_diffusion_tpu.models.unet import UNetConfig, UNet2DConditionModel
from ml_stable_diffusion_tpu.pipelines import PipelineConfiguration
from ml_stable_diffusion_tpu.pipelines.sdxl import StableDiffusionXLPipeline

from helpers import CTX_DIM, tiny_text_encoder, tiny_tokenizer, tiny_vae

#: heavy E2E/sweep file — excluded from the fast default profile
pytestmark = pytest.mark.slow

POOLED_DIM = 32
XL_CTX = CTX_DIM * 2  # te1 penultimate + te2 penultimate


def _xl_unet(cross_dim, n_time_ids):
    cfg = UNetConfig(
        block_out_channels=(16, 32),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1,
        transformer_layers_per_block=(1, 1),
        num_attention_heads=(2, 2),
        cross_attention_dim=cross_dim,
        norm_num_groups=8,
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=POOLED_DIM + n_time_ids * 8,
    )
    model = UNet2DConditionModel(cfg)
    added = {"text_embeds": jnp.zeros((1, POOLED_DIM)),
             "time_ids": jnp.zeros((1, n_time_ids))}
    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, cross_dim)), added_cond=added))(jax.random.key(1))["params"]
    return model, params


@pytest.fixture(scope="module")
def xl_pipe(tmp_path_factory):
    tok = tiny_tokenizer(tmp_path_factory.mktemp("tok1"))
    tok2 = tiny_tokenizer(tmp_path_factory.mktemp("tok2"))
    dec, enc = tiny_vae()
    return StableDiffusionXLPipeline(
        tokenizer=tok, tokenizer2=tok2,
        text_encoder=tiny_text_encoder(),
        text_encoder2=tiny_text_encoder(use_projection=True),
        unet=_xl_unet(XL_CTX, 6),
        refiner_unet=_xl_unet(CTX_DIM, 5),
        vae_decoder=dec, vae_encoder=enc,
    )


def _cfg(**kw):
    kw.setdefault("prompt", "a cat")
    kw.setdefault("step_count", 5)
    kw.setdefault("disable_safety", True)
    kw.setdefault("scheduler", "DDIM")
    return PipelineConfiguration(**kw)


def test_xl_txt2img_with_refiner(xl_pipe):
    res = xl_pipe.generate_images(_cfg(seed=1, refiner_start=0.6), image_hw=(64, 64))
    assert res.latents.shape == (1, 8, 8, 4)
    assert np.isfinite(res.latents).all()


def test_refiner_start_changes_output(xl_pipe):
    a = xl_pipe.generate_images(_cfg(seed=1, refiner_start=0.4), image_hw=(64, 64))
    b = xl_pipe.generate_images(_cfg(seed=1, refiner_start=1.0), image_hw=(64, 64))
    assert np.abs(a.latents - b.latents).max() > 1e-6


def test_force_zeros_for_empty_negative(xl_pipe):
    """Empty negative prompt -> zeroed embeddings, NOT the encoding of ''
    (reference pipeline.py:183-187)."""
    tokens = xl_pipe._tokenize(_cfg(negative_prompt=""))
    assert tokens["zero_negative"]
    text = xl_pipe._encode_text(_cfg(), {k: jnp.asarray(v) for k, v in tokens.items()}, xl_pipe._params_bundle())
    np.testing.assert_allclose(np.asarray(text["context"][0]), 0.0)
    np.testing.assert_allclose(np.asarray(text["pooled"][0]), 0.0)
    assert np.abs(np.asarray(text["context"][1])).max() > 0


def test_context_dims(xl_pipe):
    tokens = xl_pipe._tokenize(_cfg(negative_prompt="dog"))
    text = xl_pipe._encode_text(_cfg(), {k: jnp.asarray(v) for k, v in tokens.items()}, xl_pipe._params_bundle())
    assert text["context"].shape == (2, 77, XL_CTX)
    assert text["context2"].shape == (2, 77, CTX_DIM)
    assert text["pooled"].shape == (2, POOLED_DIM)


def test_time_ids_shapes(xl_pipe):
    cfg = _cfg(original_size=(512, 512), target_size=(768, 768),
               aesthetic_score=6.5)
    tokens = xl_pipe._tokenize(cfg)
    text = xl_pipe._encode_text(cfg, {k: jnp.asarray(v) for k, v in tokens.items()}, xl_pipe._params_bundle())
    # base phase: 6 time ids (size+crop+target)
    _, _, aneg, apos = xl_pipe._phase_conditioning(cfg, text, 1,
                                                   xl_pipe._call_unet)
    assert apos["time_ids"].shape == (1, 6)
    np.testing.assert_allclose(np.asarray(apos["time_ids"][0]),
                               [512, 512, 0, 0, 768, 768])
    # refiner phase: 5 ids ending in aesthetic score (XLPipeline:326-344)
    _, _, aneg, apos = xl_pipe._phase_conditioning(cfg, text, 1,
                                                   xl_pipe._call_refiner)
    assert apos["time_ids"].shape == (1, 5)
    assert float(apos["time_ids"][0, -1]) == 6.5
    assert float(aneg["time_ids"][0, -1]) == 2.5


def test_xl_img2img(xl_pipe):
    img = np.zeros((1, 64, 64, 3), np.float32)
    res = xl_pipe.generate_images(
        _cfg(seed=3, starting_image=img, strength=0.6, refiner_start=1.0),
        image_hw=(64, 64))
    assert np.isfinite(res.latents).all()


def test_xl_callback_spans_phases(xl_pipe):
    seen = []
    xl_pipe.generate_images(_cfg(seed=2, refiner_start=0.5),
                            progress_handler=lambda p: seen.append(p.step) or True,
                            image_hw=(64, 64))
    assert seen == [1, 2, 3, 4, 5]


def test_small_refiner_start_rounds_to_refiner_only(xl_pipe):
    """refiner_start small enough that int(rs*steps)==0 must produce a
    refiner-only trajectory with refiner conditioning (regression: the phase
    kind was previously inferred from a mismatched synthetic phase list)."""
    res = xl_pipe.generate_images(_cfg(seed=9, refiner_start=0.1, step_count=4),
                                  image_hw=(64, 64))
    assert np.isfinite(res.latents).all()
    phases = xl_pipe._denoise_phases(_cfg(refiner_start=0.1), 4)
    assert len(phases) == 1
    assert phases[0][2] == xl_pipe._call_refiner


def test_xl_reduce_memory_stage_bundles(xl_pipe):
    """Stage bundles never carry the other phase's denoiser — the point of
    reduceMemory for SDXL base+refiner (XL+Resources.swift reduceMemory)."""
    enc = xl_pipe._stage_bundle("encode")
    assert "unet" not in enc and "refiner" not in enc
    assert "text_encoder" in enc and "text_encoder2" in enc
    base = xl_pipe._stage_bundle("unet")
    assert "refiner" not in base and "text_encoder" not in base
    ref = xl_pipe._stage_bundle("refiner")
    assert "unet" not in ref and "refiner" in ref


def test_xl_reduce_memory_matches_default(xl_pipe):
    a = xl_pipe.generate_images(_cfg(seed=3, refiner_start=0.6),
                                image_hw=(64, 64))
    xl_pipe.offload_params_to_host()
    b = xl_pipe.generate_images(_cfg(seed=3, refiner_start=0.6,
                                     reduce_memory=True), image_hw=(64, 64))
    np.testing.assert_allclose(a.latents, b.latents, atol=2e-4)


def test_xl_deepcache_with_refiner(xl_pipe):
    """DeepCache across the base->refiner handoff: each phase restarts with
    a full step and its own cache shape (base and refiner UNets differ), so
    the program runs and stays deterministic; a 1-step base + 1-step
    refiner split is exact (every step is a phase-initial full step)."""
    exact = xl_pipe.generate_images(
        _cfg(seed=9, step_count=2, refiner_start=0.5), image_hw=(64, 64))
    dc = xl_pipe.generate_images(
        _cfg(seed=9, step_count=2, refiner_start=0.5, deepcache_interval=3),
        image_hw=(64, 64))
    # tight tolerance, not bit-equality: the lax.cond program compiles
    # with different fusions than the straight-line one
    np.testing.assert_allclose(dc.latents, exact.latents,
                               rtol=2e-5, atol=2e-5)

    a = xl_pipe.generate_images(
        _cfg(seed=9, refiner_start=0.6, deepcache_interval=2),
        image_hw=(64, 64))
    b = xl_pipe.generate_images(
        _cfg(seed=9, refiner_start=0.6, deepcache_interval=2),
        image_hw=(64, 64))
    np.testing.assert_array_equal(a.latents, b.latents)
    assert np.isfinite(a.latents).all()
    full = xl_pipe.generate_images(_cfg(seed=9, refiner_start=0.6),
                                   image_hw=(64, 64))
    assert np.abs(a.latents - full.latents).max() > 1e-6


def test_xl_deepcache_interval_gates_on_longest_phase(xl_pipe):
    """The degeneracy guard bounds the interval by the LONGEST PHASE (the
    cache resets at the base->refiner boundary), not the global step
    count: a 2+2 split rejects interval 2 (each phase would run one full
    step then all-shallow) exactly like a single-phase 2-step run does.
    Raises before program build, so this costs no compile."""
    with pytest.raises(ValueError, match="longest denoise phase"):
        xl_pipe.generate_images(
            _cfg(step_count=4, refiner_start=0.5, deepcache_interval=2),
            image_hw=(64, 64))
    with pytest.raises(ValueError, match="longest denoise phase"):
        xl_pipe.generate_images(
            _cfg(step_count=4, refiner_start=0.5, deepcache_interval=9),
            image_hw=(64, 64))
