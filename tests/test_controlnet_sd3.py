"""SD3 ControlNet tests (models/controlnet_sd3.py — beyond the reference,
which has UNet-family ControlNet only).

Covers: zero-init neutrality (the SD3 analog of zero-conv init), residual
injection into the MMDiT block stream, conditioning_scale, diffusers-layout
porting structure, and the pipeline path (VAE-latent control input, CFG
duplication of block residuals)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_stable_diffusion_tpu.models.controlnet_sd3 import (
    SD3ControlNetConfig,
    SD3ControlNetModel,
)
from ml_stable_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig

MM_CTX = 128
POOLED2 = 64

MM_CFG = MMDiTConfig(patch_size=2, in_channels=16, out_channels=16, depth=4,
                     hidden_size=32, num_heads=4, context_dim=MM_CTX,
                     pooled_dim=POOLED2, pos_embed_max_size=16)
CN_CFG = SD3ControlNetConfig(mmdit=MM_CFG, num_layers=2)


def _inputs(B=1):
    k = jax.random.key(0)
    lat = jax.random.normal(k, (B, 8, 8, 16))
    t = jnp.full((B,), 500.0)
    ctx = jax.random.normal(jax.random.key(1), (B, 10, MM_CTX))
    pooled = jax.random.normal(jax.random.key(2), (B, POOLED2))
    cond = jax.random.normal(jax.random.key(3), (B, 8, 8, 16))
    return lat, t, ctx, pooled, cond


def _models():
    lat, t, ctx, pooled, cond = _inputs()
    cn = SD3ControlNetModel(CN_CFG)
    cn_params = jax.jit(cn.init)(jax.random.key(4), lat, t, ctx, pooled,
                                 cond)["params"]
    mm = MMDiT(MM_CFG)
    mm_params = jax.jit(mm.init)(jax.random.key(5), lat, t, ctx,
                                 pooled)["params"]
    return (cn, cn_params), (mm, mm_params)


def test_zero_init_is_neutral():
    """At init every residual is exactly zero (zero patch embedding feeds
    zero projections) and the MMDiT output is bit-identical with or without
    the control branch — the SD3 analog of ControlNet zero-conv init."""
    (cn, cn_params), (mm, mm_params) = _models()
    lat, t, ctx, pooled, cond = _inputs()
    res, mid = cn.apply({"params": cn_params}, lat, t, ctx, pooled, cond)
    assert mid is None
    assert len(res) == CN_CFG.num_layers
    for r in res:
        assert r.shape == (1, 16, MM_CFG.hidden_size)
        np.testing.assert_array_equal(np.asarray(r), 0.0)
    base = mm.apply({"params": mm_params}, lat, t, ctx, pooled)
    with_cn = mm.apply({"params": mm_params}, lat, t, ctx, pooled,
                       controlnet_residuals=res)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(with_cn))


def test_residual_injection_and_scale():
    (cn, cn_params), (mm, mm_params) = _models()
    lat, t, ctx, pooled, cond = _inputs()
    # un-zero the projections so the branch produces signal
    for i in range(CN_CFG.num_layers):
        blk = cn_params[f"controlnet_blocks_{i}"]
        blk["kernel"] = jax.random.normal(
            jax.random.key(10 + i), blk["kernel"].shape) * 0.1
    pp = cn_params["patch_proj_input"]
    pp["kernel"] = jax.random.normal(jax.random.key(20), pp["kernel"].shape) * 0.1

    res, _ = cn.apply({"params": cn_params}, lat, t, ctx, pooled, cond)
    assert float(np.abs(np.asarray(res[0])).max()) > 0
    base = mm.apply({"params": mm_params}, lat, t, ctx, pooled)
    out = mm.apply({"params": mm_params}, lat, t, ctx, pooled,
                   controlnet_residuals=res)
    assert float(np.abs(np.asarray(out - base)).max()) > 1e-6

    # conditioning_scale=0 kills the cond input but not the base stream taps
    res0, _ = cn.apply({"params": cn_params}, lat, t, ctx, pooled, cond,
                       conditioning_scale=0.0)
    for r in res0:
        np.testing.assert_array_equal(np.asarray(r), 0.0)

    # a different cond image produces different residuals
    res2, _ = cn.apply({"params": cn_params}, lat, t, ctx, pooled, cond + 1.0)
    assert float(np.abs(np.asarray(res2[0] - res[0])).max()) > 1e-6


def test_non_divisor_residual_count_and_final_block_skip():
    """interval = ceil(depth / n) with no residual add on the final
    context_pre_only block (ecosystem SD3Transformer2DModel scheme).  With
    depth=4 and n=3: blocks 0,1 -> res[0], block 2 -> res[1], block 3
    skipped; no IndexError for non-divisor counts, and a residual consumed
    only by the skipped final block cannot change the output."""
    _, (mm, mm_params) = _models()
    lat, t, ctx, pooled, _ = _inputs()
    hp_wp = 16
    D = MM_CFG.hidden_size
    res = [jax.random.normal(jax.random.key(30 + i), (1, hp_wp, D)) * 0.1
           for i in range(3)]
    out = mm.apply({"params": mm_params}, lat, t, ctx, pooled,
                   controlnet_residuals=tuple(res))  # traces: no IndexError
    base = mm.apply({"params": mm_params}, lat, t, ctx, pooled)
    assert float(np.abs(np.asarray(out - base)).max()) > 1e-6

    # With depth=4/n=3 the consumed indices are 0,0,1 (blocks 0..2) and
    # block 3 is skipped, so res[2] is never read: changing it must not
    # change the output.
    res_mut = list(res)
    res_mut[2] = res_mut[2] + 100.0
    out2 = mm.apply({"params": mm_params}, lat, t, ctx, pooled,
                    controlnet_residuals=tuple(res_mut))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    # ...while changing res[0] (consumed by blocks 0 and 1) must.
    res_mut2 = list(res)
    res_mut2[0] = res_mut2[0] + 1.0
    out3 = mm.apply({"params": mm_params}, lat, t, ctx, pooled,
                    controlnet_residuals=tuple(res_mut2))
    assert float(np.abs(np.asarray(out3 - out)).max()) > 1e-6

    # divisor case n == depth: every non-final block gets its own residual,
    # the final one is skipped (diffusers: context_pre_only blocks excluded)
    res_full = [jax.random.normal(jax.random.key(40 + i), (1, hp_wp, D)) * 0.1
                for i in range(4)]
    o_full = mm.apply({"params": mm_params}, lat, t, ctx, pooled,
                      controlnet_residuals=tuple(res_full))
    res_full_mut = list(res_full)
    res_full_mut[3] = res_full_mut[3] + 100.0
    o_full2 = mm.apply({"params": mm_params}, lat, t, ctx, pooled,
                       controlnet_residuals=tuple(res_full_mut))
    np.testing.assert_array_equal(np.asarray(o_full), np.asarray(o_full2))


def test_port_structure_roundtrip():
    """port_sd3_controlnet maps a diffusers-layout state dict onto exactly
    the Flax init tree (names and shapes)."""
    import torch

    from ml_stable_diffusion_tpu.convert.mmdit import port_sd3_controlnet

    (cn, cn_params), _ = _models()
    D = MM_CFG.hidden_size
    M = MM_CFG.pos_embed_max_size
    P = MM_CFG.patch_size
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = torch.randn(o, i)
        sd[f"{name}.bias"] = torch.randn(o)

    sd["pos_embed.proj.weight"] = torch.randn(D, 16, P, P)
    sd["pos_embed.proj.bias"] = torch.randn(D)
    sd["pos_embed.pos_embed"] = torch.randn(1, M * M, D)
    sd["pos_embed_input.proj.weight"] = torch.randn(D, 16, P, P)
    sd["pos_embed_input.proj.bias"] = torch.randn(D)
    lin("time_text_embed.timestep_embedder.linear_1", 256, D)
    lin("time_text_embed.timestep_embedder.linear_2", D, D)
    lin("time_text_embed.text_embedder.linear_1", POOLED2, D)
    lin("time_text_embed.text_embedder.linear_2", D, D)
    lin("context_embedder", MM_CTX, D)
    for i in range(CN_CFG.num_layers):
        b = f"transformer_blocks.{i}"
        lin(f"{b}.norm1.linear", D, 6 * D)
        lin(f"{b}.norm1_context.linear", D, 6 * D)
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                   "add_v_proj"):
            lin(f"{b}.attn.{nm}", D, D)
        lin(f"{b}.attn.to_out.0", D, D)
        lin(f"{b}.attn.to_add_out", D, D)
        lin(f"{b}.ff.net.0.proj", D, 4 * D)
        lin(f"{b}.ff.net.2", 4 * D, D)
        lin(f"{b}.ff_context.net.0.proj", D, 4 * D)
        lin(f"{b}.ff_context.net.2", 4 * D, D)
        lin(f"controlnet_blocks.{i}", D, D)

    ported = port_sd3_controlnet(sd, CN_CFG)
    flat_w = {jax.tree_util.keystr(p): v.shape for p, v in
              jax.tree_util.tree_leaves_with_path(cn_params)}
    flat_g = {jax.tree_util.keystr(p): tuple(v.shape) for p, v in
              jax.tree_util.tree_leaves_with_path(ported)}
    assert set(flat_w) == set(flat_g)
    for k, shape in flat_w.items():
        assert flat_g[k] == tuple(shape), (k, flat_g[k], shape)


@pytest.mark.slow
def test_sd3_pipeline_with_controlnet(tmp_path_factory=None):
    """E2E: the SD3 pipeline VAE-encodes the control image, runs the control
    branch each step, and the control input changes the generated latents
    (with zero-init nets it would not)."""
    from ml_stable_diffusion_tpu.models.vae import VAEConfig, VAEDecoder, VAEEncoder
    from ml_stable_diffusion_tpu.pipelines import PipelineConfiguration
    from ml_stable_diffusion_tpu.pipelines.sd3 import StableDiffusion3Pipeline

    import pathlib
    import tempfile
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from helpers import tiny_text_encoder, tiny_tokenizer

    POOLED = 32
    cfg = dataclasses.replace(MM_CFG, pooled_dim=2 * POOLED)
    mm = MMDiT(cfg)
    mm_params = jax.jit(mm.init)(
        jax.random.key(0), jnp.zeros((1, 8, 8, 16)), jnp.zeros((1,)),
        jnp.zeros((1, 10, MM_CTX)), jnp.zeros((1, 2 * POOLED)))["params"]

    cn_cfg = SD3ControlNetConfig(mmdit=cfg, num_layers=2)
    cn = SD3ControlNetModel(cn_cfg)
    cn_params = jax.jit(cn.init)(
        jax.random.key(1), jnp.zeros((1, 8, 8, 16)), jnp.zeros((1,)),
        jnp.zeros((1, 10, MM_CTX)), jnp.zeros((1, 2 * POOLED)),
        jnp.zeros((1, 8, 8, 16)))["params"]
    # un-zero so control signal flows
    for i in range(cn_cfg.num_layers):
        blk = cn_params[f"controlnet_blocks_{i}"]
        blk["kernel"] = jax.random.normal(jax.random.key(2 + i),
                                          blk["kernel"].shape) * 0.05
    pp = cn_params["patch_proj_input"]
    pp["kernel"] = jax.random.normal(jax.random.key(9), pp["kernel"].shape) * 0.05

    vcfg = VAEConfig(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                     norm_num_groups=4, latent_channels=16,
                     use_quant_conv=False)
    dec = VAEDecoder(vcfg)
    dp = jax.jit(dec.init)(jax.random.key(3), jnp.zeros((1, 8, 8, 16)))["params"]
    enc = VAEEncoder(vcfg)
    ep = jax.jit(enc.init)(jax.random.key(4), jnp.zeros((1, 64, 64, 3)))["params"]

    tmp = pathlib.Path(tempfile.mkdtemp())
    pipe = StableDiffusion3Pipeline(
        tokenizer=tiny_tokenizer(_mk(tmp / "t1")),
        tokenizer2=tiny_tokenizer(_mk(tmp / "t2")),
        text_encoder=tiny_text_encoder(use_projection=True),
        text_encoder2=tiny_text_encoder(use_projection=True),
        mmdit=(mm, mm_params),
        vae_decoder=(dec, dp),
        vae_encoder=(enc, ep),
        controlnets=[(cn, cn_params)],
    )
    control = np.zeros((64, 64, 3), np.uint8)
    control[:, 32:] = 255
    gen = PipelineConfiguration(prompt="a cat", step_count=2, seed=7,
                                disable_safety=True,
                                controlnet_inputs=[control])
    res = pipe.generate_images(gen, image_hw=(64, 64))
    assert np.isfinite(res.latents).all()

    gen2 = PipelineConfiguration(prompt="a cat", step_count=2, seed=7,
                                 disable_safety=True,
                                 controlnet_inputs=[255 - control])
    res2 = pipe.generate_images(gen2, image_hw=(64, 64))
    assert float(np.abs(res.latents - res2.latents).max()) > 1e-6


def _mk(p):
    p.mkdir(parents=True, exist_ok=True)
    return p
