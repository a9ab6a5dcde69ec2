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


def _tiny_xl_controlnet():
    cfg = dataclasses.replace(
        tiny_unet(xl=True)[0].config, up_block_types=())
    model = ControlNetModel(cfg)
    added = {"text_embeds": jnp.zeros((1, 32)), "time_ids": jnp.zeros((1, 6))}
    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, CTX_DIM)), jnp.zeros((1, 64, 64, 3)),
        added_cond=added))(jax.random.key(6))["params"]
    return model, params, added


def test_xl_controlnet_added_cond():
    """SDXL-family ControlNets carry the text_time micro-conditioning
    embedding; it must exist in the tree and condition the residuals."""
    model, params, added = _tiny_xl_controlnet()
    assert "add_embedding" in params
    # zero-init neutrality holds for the XL variant too
    down, mid = model.apply({"params": params}, jnp.ones((1, 8, 8, 4)),
                            jnp.ones((1,)), jnp.ones((1, 77, CTX_DIM)),
                            jnp.ones((1, 64, 64, 3)), added_cond=added)
    for r in down:
        np.testing.assert_allclose(np.asarray(r), 0.0)
    np.testing.assert_allclose(np.asarray(mid), 0.0)
    # enliven ONLY the zero convs (random weights elsewhere — uniform
    # weights would make the added embedding per-channel constant, which
    # GroupNorm cancels): the added conditioning must change the residuals
    params = dict(params)
    for k in list(params):
        if k.startswith("controlnet_"):
            params[k] = jax.tree.map(lambda x: jnp.ones_like(x) * 0.01,
                                     params[k])
    args = (jnp.ones((1, 8, 8, 4)), jnp.ones((1,)),
            jnp.ones((1, 77, CTX_DIM)), jnp.ones((1, 64, 64, 3)))
    _, m1 = model.apply({"params": params}, *args, added_cond=added)
    added2 = {"text_embeds": jnp.ones((1, 32)),
              "time_ids": jnp.asarray([[512, 512, 0, 0, 512, 512]],
                                      jnp.float32)}
    _, m2 = model.apply({"params": params}, *args, added_cond=added2)
    assert np.abs(np.asarray(m1) - np.asarray(m2)).max() > 1e-5


def test_xl_controlnet_port_roundtrip():
    """port_controlnet maps an XL-layout state dict (incl. add_embedding)
    onto the init tree."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).parent))
    from helpers import flax_params_to_diffusers_sd

    from ml_stable_diffusion_tpu.convert.controlnet import port_controlnet

    model, params, _ = _tiny_xl_controlnet()
    sd = flax_params_to_diffusers_sd(params, "controlnet")
    ported = port_controlnet(sd, model.config)
    got = jax.tree.map(lambda a: np.asarray(a).shape, ported)
    want = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert got == want
