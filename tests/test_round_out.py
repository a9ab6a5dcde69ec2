"""Round-out coverage: ControlNet port roundtrip, SD3.5 qk-norm path,
SDXL refiner checkpoint loading, orbax train-state save/resume, fixed-seed
regression."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ml_stable_diffusion_tpu.convert.controlnet import port_controlnet
from ml_stable_diffusion_tpu.models.controlnet import ControlNetModel
from ml_stable_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
from ml_stable_diffusion_tpu.parallel import make_mesh, make_train_step, batch_sharding
from ml_stable_diffusion_tpu.parallel.checkpoint import (
    restore_train_state,
    save_train_state,
)

from helpers import CTX_DIM, flax_params_to_diffusers_sd, tiny_unet


def test_controlnet_port_roundtrip():
    unet_model, _ = tiny_unet()
    cfg = unet_model.config
    model = ControlNetModel(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, CTX_DIM)), jnp.zeros((1, 64, 64, 3)))["params"]

    sd = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [p.key for p in path]
        mod = "/".join(keys[:-1])
        name = (mod
                .replace("controlnet_cond_embedding/blocks_",
                         "controlnet_cond_embedding/blocks.")
                .replace("controlnet_down_blocks_", "controlnet_down_blocks.")
                .replace("down_blocks_", "down_blocks.")
                .replace("mid_block_resnets_", "mid_block.resnets.")
                .replace("mid_block_attentions_", "mid_block.attentions.")
                .replace("_resnets_", ".resnets.")
                .replace("_attentions_", ".attentions.")
                .replace("_downsamplers_0", ".downsamplers.0")
                .replace("transformer_blocks_", "transformer_blocks.")
                .replace("to_out_0", "to_out.0")
                .replace("geglu_proj", "net.0.proj")
                .replace("ff/proj_out", "ff/net.2")
                .replace("/", "."))
        leafname = keys[-1]
        v = np.asarray(leaf)
        if leafname == "kernel":
            w = v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.T
            sd[name + ".weight"] = np.ascontiguousarray(w)
        elif leafname == "scale":
            sd[name + ".weight"] = v
        else:
            sd[name + ".bias"] = v

    ported = port_controlnet(sd, cfg)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(ported)}
    count = 0
    for p, v in jax.tree_util.tree_leaves_with_path(params):
        key = jax.tree_util.keystr(p)
        assert key in flat_b, key
        np.testing.assert_array_equal(np.asarray(v), flat_b[key], err_msg=key)
        count += 1
    assert count == len(flat_b)


def test_sd35_qk_norm_path():
    cfg = MMDiTConfig(patch_size=2, in_channels=4, out_channels=4, depth=2,
                      hidden_size=32, num_heads=4, context_dim=24,
                      pooled_dim=16, pos_embed_max_size=8, qk_norm=True)
    model = MMDiT(cfg)
    lat = jnp.zeros((1, 8, 8, 4))
    params = jax.jit(model.init)(jax.random.key(0), lat, jnp.zeros((1,)),
                                 jnp.zeros((1, 5, 24)), jnp.zeros((1, 16)))
    assert "norm_q" in params["params"]["blocks_0"]
    out = model.apply(params, lat, jnp.zeros((1,)), jnp.zeros((1, 5, 24)),
                      jnp.zeros((1, 16)))
    assert out.shape == (1, 8, 8, 4)


def test_refiner_checkpoint_loading(tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_convert_load import (_write_tokenizer, _write_text_encoder,
                                   _write_unet, _write_vae)

    from ml_stable_diffusion_tpu.convert import load_pipeline

    # base XL-style checkpoint needs tokenizer_2/text_encoder_2
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "model_index.json").write_text(json.dumps(
        {"_class_name": "StableDiffusionXLPipeline"}))
    _write_tokenizer(ckpt / "tokenizer")
    _write_tokenizer(ckpt / "tokenizer_2")
    _write_text_encoder(ckpt / "text_encoder")
    _write_text_encoder(ckpt / "text_encoder_2", with_projection=True)
    _write_unet(ckpt / "unet")
    _write_vae(ckpt / "vae")

    refiner = tmp_path / "refiner"
    refiner.mkdir()
    _write_unet(refiner / "unet")

    pipe = load_pipeline(ckpt, refiner_dir=refiner, compute_dtype=jnp.float32)
    assert pipe.refiner_unet is not None


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_train_checkpoint_roundtrip(tmp_path):
    model, params = tiny_unet()
    mesh = make_mesh(8, dp=2)
    init_fn, step_fn = make_train_step(model, optax.adamw(1e-3), mesh)
    state = init_fn(params)
    batch = {
        "latents": jax.device_put(jnp.zeros((4, 8, 8, 4)), batch_sharding(mesh, 4)),
        "context": jax.device_put(jnp.zeros((4, 77, 48)), batch_sharding(mesh, 3)),
        "rng": jax.random.key(0),
    }
    state, _ = step_fn(state, batch)
    save_train_state(tmp_path / "ckpt", state)

    template = init_fn(params)
    restored = restore_train_state(tmp_path / "ckpt", template)
    assert int(restored.step) == 1
    for (pa, va), (_, vb) in zip(
            jax.tree_util.tree_leaves_with_path(state.params),
            jax.tree_util.tree_leaves_with_path(restored.params)):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=jax.tree_util.keystr(pa))
    # restored state must be usable for further steps
    restored2, loss = step_fn(restored, batch)
    assert np.isfinite(float(loss))


def test_controlnet_checkpoint_loading(tmp_path):
    """ControlNet dir -> pipeline wiring (reference --controlnet loading,
    pipeline.py:663-675 control-unet swap)."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).parent))
    from test_convert_load import (_write_tokenizer, _write_text_encoder,
                                   _write_unet, _write_vae, UNET_CFG)
    from safetensors.numpy import save_file

    from ml_stable_diffusion_tpu.convert import load_pipeline
    from ml_stable_diffusion_tpu.models.controlnet import ControlNetModel
    from ml_stable_diffusion_tpu.pipelines import PipelineConfiguration

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "model_index.json").write_text(json.dumps(
        {"_class_name": "StableDiffusionPipeline"}))
    _write_tokenizer(ckpt / "tokenizer")
    _write_text_encoder(ckpt / "text_encoder")
    _write_unet(ckpt / "unet")
    _write_vae(ckpt / "vae")

    # synthesize a controlnet checkpoint by inverse-mapping a flax init
    cn_model = ControlNetModel(UNET_CFG)
    cn_params = jax.jit(cn_model.init)(
        jax.random.key(3), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 32)), jnp.zeros((1, 64, 64, 3)))["params"]
    sd = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(cn_params):
        keys = [p.key for p in path]
        mod = "/".join(keys[:-1])
        name = (mod
                .replace("controlnet_cond_embedding/blocks_",
                         "controlnet_cond_embedding/blocks.")
                .replace("controlnet_down_blocks_", "controlnet_down_blocks.")
                .replace("down_blocks_", "down_blocks.")
                .replace("mid_block_resnets_", "mid_block.resnets.")
                .replace("mid_block_attentions_", "mid_block.attentions.")
                .replace("_resnets_", ".resnets.")
                .replace("_attentions_", ".attentions.")
                .replace("_downsamplers_0", ".downsamplers.0")
                .replace("transformer_blocks_", "transformer_blocks.")
                .replace("to_out_0", "to_out.0")
                .replace("geglu_proj", "net.0.proj")
                .replace("ff/proj_out", "ff/net.2")
                .replace("/", "."))
        leafname = keys[-1]
        v = np.asarray(leaf)
        if leafname == "kernel":
            w = v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.T
            sd[name + ".weight"] = np.ascontiguousarray(w)
        elif leafname == "scale":
            sd[name + ".weight"] = v
        else:
            sd[name + ".bias"] = v
    cn_dir = tmp_path / "controlnet"
    cn_dir.mkdir()
    (cn_dir / "config.json").write_text(json.dumps({
        "in_channels": 4, "block_out_channels": [16, 32],
        "down_block_types": list(UNET_CFG.down_block_types),
        "layers_per_block": 1, "transformer_layers_per_block": [1, 1],
        "attention_head_dim": [2, 2], "cross_attention_dim": 32,
        "norm_num_groups": 8}))
    save_file(sd, str(cn_dir / "diffusion_pytorch_model.safetensors"))

    pipe = load_pipeline(ckpt, controlnet_dirs=[cn_dir],
                         compute_dtype=jnp.float32)
    assert len(pipe.controlnets) == 1
    cond = np.zeros((1, 64, 64, 3), np.float32)
    res = pipe.generate_images(
        PipelineConfiguration(prompt="cat", step_count=2, seed=0,
                              scheduler="DDIM", disable_safety=True,
                              controlnet_inputs=[cond]),
        image_hw=(64, 64))
    assert np.isfinite(res.latents).all()
