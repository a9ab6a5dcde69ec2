"""ControlNet + safety checker tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_stable_diffusion_tpu.models.controlnet import ControlNetModel
from ml_stable_diffusion_tpu.models.safety import (
    SafetyChecker,
    SafetyCheckerConfig,
    check_images,
)
from ml_stable_diffusion_tpu.pipelines import (
    PipelineConfiguration,
    StableDiffusionPipeline,
)

from helpers import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae, CTX_DIM

TINY_SAFETY = SafetyCheckerConfig(image_size=32, patch_size=8, hidden_size=32,
                                  intermediate_size=64, num_hidden_layers=2,
                                  num_attention_heads=2, projection_dim=16,
                                  num_concepts=3, num_special_care=2)


def _tiny_controlnet():
    unet_model, _ = tiny_unet()
    cfg = unet_model.config
    model = ControlNetModel(cfg)
    params = jax.jit(model.init)(
        jax.random.key(5), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, CTX_DIM)), jnp.zeros((1, 64, 64, 3)))["params"]
    return model, params


def test_controlnet_residual_shapes_match_unet():
    """Residual count/shapes must line up with the UNet skip connections
    (reference get_num_residuals controlnet.py:191-197)."""
    model, params = _tiny_controlnet()
    down, mid = model.apply({"params": params}, jnp.zeros((2, 8, 8, 4)),
                            jnp.zeros((2,)), jnp.zeros((2, 77, CTX_DIM)),
                            jnp.zeros((2, 64, 64, 3)))
    # conv_in + 1 resnet + downsampler + 1 resnet = 4 residuals for the
    # 2-block tiny config
    assert len(down) == 4
    assert down[0].shape == (2, 8, 8, 16)
    assert down[-1].shape == (2, 4, 4, 32)
    assert mid.shape == (2, 4, 4, 32)


def test_controlnet_zero_init_gives_zero_residuals():
    """Freshly initialized zero convs must produce exactly zero residuals."""
    model, params = _tiny_controlnet()
    down, mid = model.apply({"params": params}, jnp.ones((1, 8, 8, 4)),
                            jnp.ones((1,)), jnp.ones((1, 77, CTX_DIM)),
                            jnp.ones((1, 64, 64, 3)))
    for r in down:
        np.testing.assert_allclose(np.asarray(r), 0.0)
    np.testing.assert_allclose(np.asarray(mid), 0.0)


def test_conditioning_scale():
    model, params = _tiny_controlnet()
    # give the zero convs nonzero weights
    params = jax.tree.map(lambda x: jnp.ones_like(x) * 0.01, params)
    args = (jnp.ones((1, 8, 8, 4)), jnp.ones((1,)),
            jnp.ones((1, 77, CTX_DIM)), jnp.ones((1, 64, 64, 3)))
    d1, m1 = model.apply({"params": params}, *args, conditioning_scale=1.0)
    d2, m2 = model.apply({"params": params}, *args, conditioning_scale=0.5)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1) * 0.5, rtol=1e-5)


def test_pipeline_with_controlnet(tmp_path):
    tok = tiny_tokenizer(tmp_path)
    dec, enc = tiny_vae()
    cn = _tiny_controlnet()
    pipe = StableDiffusionPipeline(tokenizer=tok, text_encoder=tiny_text_encoder(),
                                   unet=tiny_unet(), vae_decoder=dec,
                                   controlnets=[cn])
    cond = np.zeros((1, 64, 64, 3), np.float32)
    cfg = PipelineConfiguration(prompt="a cat", step_count=2, seed=1,
                                controlnet_inputs=[cond], disable_safety=True)
    res = pipe.generate_images(cfg, image_hw=(64, 64))
    assert np.isfinite(res.latents).all()
    # count mismatch must raise
    with pytest.raises(ValueError):
        pipe.generate_images(dataclasses.replace(cfg, controlnet_inputs=[cond, cond]),
                             image_hw=(64, 64))


def test_safety_checker_flags_and_blanks():
    model = SafetyChecker(TINY_SAFETY)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 32, 32, 3)))["params"]
    # force a concept hit: huge positive threshold margin
    params = dict(params)
    out = model.apply({"params": params}, jnp.zeros((2, 32, 32, 3)),
                      adjustment=10.0)
    assert bool(out["has_nsfw"][0])  # adjustment forces flags
    out2 = model.apply({"params": params}, jnp.zeros((2, 32, 32, 3)),
                       adjustment=-10.0)
    assert not bool(out2["has_nsfw"][0])

    from PIL import Image

    imgs = [Image.new("RGB", (64, 64), (255, 0, 0))]
    filtered, flags = check_images(model, params, imgs)
    assert flags == [False] or flags == [True]
    if flags[0]:
        assert np.asarray(filtered[0]).max() == 0
