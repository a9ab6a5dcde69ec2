"""SD3 pipeline tests: triple-encoder context assembly, flow scheduler
enforcement, 16-ch latents, optional T5, latent preview."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_stable_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
from ml_stable_diffusion_tpu.models.t5 import T5Config, T5Encoder
from ml_stable_diffusion_tpu.models.vae import VAEConfig, VAEDecoder, VAEEncoder
from ml_stable_diffusion_tpu.pipelines import PipelineConfiguration
from ml_stable_diffusion_tpu.pipelines.sd3 import StableDiffusion3Pipeline
from ml_stable_diffusion_tpu.utils.latent_preview import latent_to_rgb_preview

from helpers import CTX_DIM, tiny_text_encoder, tiny_tokenizer

#: heavy E2E/sweep file — excluded from the fast default profile
pytestmark = pytest.mark.slow

POOLED = 32  # per encoder projection dim
MM_CTX = 128  # context width: 2*CTX_DIM zero-padded + matches T5 d_model
T5_DM = 128


class _ArrayT5Tokenizer:
    """test stand-in: maps text to deterministic ids."""

    def tokenize(self, text, max_length=16):
        ids = [(ord(c) % 200) + 2 for c in text][: max_length - 1] + [1]
        mask = [1] * len(ids) + [0] * (max_length - len(ids))
        ids = ids + [0] * (max_length - len(ids))
        return np.asarray(ids, np.int32), np.asarray(mask, np.int32)


def _tiny_mmdit():
    cfg = MMDiTConfig(patch_size=2, in_channels=16, out_channels=16, depth=2,
                      hidden_size=32, num_heads=4, context_dim=MM_CTX,
                      pooled_dim=2 * POOLED, pos_embed_max_size=16)
    model = MMDiT(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 8, 8, 16)), jnp.zeros((1,)),
        jnp.zeros((1, 10, MM_CTX)), jnp.zeros((1, 2 * POOLED)))["params"]
    return model, params


def _tiny_t5():
    cfg = T5Config(vocab_size=256, d_model=T5_DM, d_kv=8, d_ff=64,
                   num_layers=2, num_heads=4)
    model = T5Encoder(cfg)
    params = jax.jit(model.init)(jax.random.key(1),
                                 jnp.zeros((1, 16), jnp.int32),
                                 jnp.ones((1, 16), jnp.int32))["params"]
    return model, params


def _tiny_vae16():
    cfg = VAEConfig(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                    norm_num_groups=4, latent_channels=16, use_quant_conv=False)
    dec = VAEDecoder(cfg)
    dp = jax.jit(dec.init)(jax.random.key(2), jnp.zeros((1, 8, 8, 16)))["params"]
    enc = VAEEncoder(cfg)
    ep = jax.jit(enc.init)(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))["params"]
    return (dec, dp), (enc, ep)


@pytest.fixture(scope="module")
def sd3_pipe(tmp_path_factory):
    dec, enc = _tiny_vae16()
    return StableDiffusion3Pipeline(
        tokenizer=tiny_tokenizer(tmp_path_factory.mktemp("t1")),
        tokenizer2=tiny_tokenizer(tmp_path_factory.mktemp("t2")),
        t5_tokenizer=_ArrayT5Tokenizer(),
        text_encoder=tiny_text_encoder(use_projection=True),
        text_encoder2=tiny_text_encoder(use_projection=True),
        t5_encoder=_tiny_t5(),
        mmdit=_tiny_mmdit(),
        vae_decoder=dec, vae_encoder=enc,
        t5_sequence_length=16,
    )


def _cfg(**kw):
    kw.setdefault("prompt", "a cat")
    kw.setdefault("step_count", 4)
    kw.setdefault("disable_safety", True)
    return PipelineConfiguration(**kw)


def test_sd3_txt2img(sd3_pipe):
    res = sd3_pipe.generate_images(_cfg(seed=1), image_hw=(64, 64))
    assert res.latents.shape == (1, 8, 8, 16)
    assert np.isfinite(res.latents).all()
    assert res.images[0].size == (64, 64)


def test_sd3_context_assembly(sd3_pipe):
    tokens = {k: jnp.asarray(v) for k, v in sd3_pipe._tokenize(_cfg()).items()}
    text = sd3_pipe._encode_text(_cfg(), tokens, sd3_pipe._params_bundle())
    # 77 CLIP positions + 16 T5 positions, zero-padded CLIP channels
    assert text["context"].shape == (2, 77 + 16, MM_CTX)
    assert text["pooled"].shape == (2, 2 * POOLED)
    clip_part = np.asarray(text["context"][:, :77])
    np.testing.assert_allclose(clip_part[..., 2 * CTX_DIM:], 0.0)  # zero pad
    assert np.abs(clip_part[..., :2 * CTX_DIM]).max() > 0


def test_sd3_scheduler_enforcement(sd3_pipe):
    # default silently maps to DiscreteFlow
    res = sd3_pipe.generate_images(_cfg(seed=2, scheduler="PNDM"), image_hw=(64, 64))
    assert np.isfinite(res.latents).all()
    with pytest.raises(ValueError):
        sd3_pipe.generate_images(_cfg(scheduler="DDIM"), image_hw=(64, 64))


def test_sd3_timestep_shift_changes_output(sd3_pipe):
    a = sd3_pipe.generate_images(_cfg(seed=3, timestep_shift=3.0), image_hw=(64, 64))
    b = sd3_pipe.generate_images(_cfg(seed=3, timestep_shift=1.0), image_hw=(64, 64))
    assert np.abs(a.latents - b.latents).max() > 1e-6


def test_sd3_without_t5(tmp_path_factory):
    dec, enc = _tiny_vae16()
    pipe = StableDiffusion3Pipeline(
        tokenizer=tiny_tokenizer(tmp_path_factory.mktemp("t3")),
        tokenizer2=tiny_tokenizer(tmp_path_factory.mktemp("t4")),
        text_encoder=tiny_text_encoder(use_projection=True),
        text_encoder2=tiny_text_encoder(use_projection=True),
        mmdit=_tiny_mmdit(),
        vae_decoder=dec,
        t5_sequence_length=16,
    )
    res = pipe.generate_images(_cfg(seed=4), image_hw=(64, 64))
    assert np.isfinite(res.latents).all()

    # reference substitutes a ZERO T5 block, keeping the full 77+L context
    # (StableDiffusion3Pipeline.swift:219, truncatedT5Embeds :402)
    tokens = {k: jnp.asarray(v) for k, v in pipe._tokenize(_cfg()).items()}
    text = pipe._encode_text(_cfg(), tokens, pipe._params_bundle())
    assert text["context"].shape == (2, 77 + 16, MM_CTX)
    np.testing.assert_allclose(np.asarray(text["context"][:, 77:]), 0.0)


def test_sd3_t5_embeds_truncated(sd3_pipe):
    """T5 encoder outputs longer than t5_sequence_length are truncated
    (reference truncatedT5Embeds, :402-418)."""
    cfg = _cfg()
    tokens = pipe_tokens = sd3_pipe._tokenize(cfg)
    # simulate a T5 tokenizer that emitted more positions than configured
    long_ids = np.pad(pipe_tokens["ids_t5"], ((0, 0), (0, 8)))
    long_mask = np.pad(pipe_tokens["mask_t5"], ((0, 0), (0, 8)))
    tokens = dict(tokens, ids_t5=long_ids, mask_t5=long_mask)
    tokens = {k: jnp.asarray(v) for k, v in tokens.items()}
    text = sd3_pipe._encode_text(cfg, tokens, sd3_pipe._params_bundle())
    assert text["context"].shape == (2, 77 + 16, MM_CTX)


def test_sd3_img2img(sd3_pipe):
    img = np.zeros((1, 64, 64, 3), np.float32)
    res = sd3_pipe.generate_images(_cfg(seed=5, starting_image=img, strength=0.5),
                                   image_hw=(64, 64))
    assert np.isfinite(res.latents).all()


def test_latent_preview():
    lat = np.random.RandomState(0).randn(1, 8, 8, 4).astype(np.float32)
    rgb = latent_to_rgb_preview(lat)
    assert rgb.shape == (1, 8, 8, 3)
    assert rgb.min() >= -1 and rgb.max() <= 1
    with pytest.raises(ValueError):
        latent_to_rgb_preview(np.zeros((1, 8, 8, 16)))


def test_sd3_deepcache_unsupported(sd3_pipe):
    """MMDiT has no shallow/deep UNet split — deepcache must raise, not
    silently approximate."""
    with pytest.raises(ValueError, match="deepcache"):
        sd3_pipe.generate_images(_cfg(seed=1, deepcache_interval=2),
                                 image_hw=(64, 64))
