"""IP-Adapter tests: cross-attention enumeration/porting, decoupled-
attention math identities, CLIP vision encoder torch parity, and pipeline
end-to-end conditioning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_stable_diffusion_tpu.convert.ip_adapter import (
    cross_attention_paths,
    load_ip_adapter_state,
    port_ip_adapter,
    port_ip_image_projection,
)
from ml_stable_diffusion_tpu.models.unet import UNetConfig
from ml_stable_diffusion_tpu.pipelines import (
    PipelineConfiguration,
    StableDiffusionPipeline,
)

from helpers import CTX_DIM, tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae

HW = (64, 64)


def test_cross_attention_enumeration_sd21():
    """SD-2.1 geometry has 16 cross-attentions; the enumeration is
    down -> up -> MID LAST (diffusers attn_processors order: torch
    registers the up_blocks ModuleList attribute before mid_block), so the
    ip weight indices are the odd numbers 1..31 with the mid attention at
    index 31."""
    paths = cross_attention_paths(UNetConfig.sd21())
    assert len(paths) == 16
    assert paths[0][0] == "down_blocks_0_attentions_0"
    assert paths[5][0] == "down_blocks_2_attentions_1"
    assert paths[6][0] == "up_blocks_1_attentions_0"
    assert paths[14][0] == "up_blocks_3_attentions_2"
    assert paths[-1][0] == "mid_block_attentions_0"


def test_port_ip_adapter_mapping_and_errors():
    _, params = tiny_unet()
    cfg_t = UNetConfig(
        block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, transformer_layers_per_block=(1, 1),
        num_attention_heads=(2, 2), cross_attention_dim=CTX_DIM,
        norm_num_groups=8)
    paths = cross_attention_paths(cfg_t)
    assert len(paths) == 4  # down0, up1 x2, mid (mid enumerates last)
    rng = np.random.default_rng(0)
    ip_layers = {}
    for i, path in enumerate(paths):
        node = params
        for k in path:
            node = node[k]
        inner = np.asarray(node["to_k"]["kernel"]).shape[1]
        ip_layers[f"{2*i+1}.to_k_ip.weight"] = (
            rng.normal(size=(inner, CTX_DIM)).astype(np.float32))
        ip_layers[f"{2*i+1}.to_v_ip.weight"] = (
            rng.normal(size=(inner, CTX_DIM)).astype(np.float32))
    ported = port_ip_adapter(cfg_t, ip_layers)
    for i, path in enumerate(paths):
        np.testing.assert_array_equal(
            ported[path]["to_k_ip"]["kernel"],
            ip_layers[f"{2*i+1}.to_k_ip.weight"].T)
    with pytest.raises(ValueError, match="wrong base model"):
        port_ip_adapter(cfg_t, {"1.to_k_ip.weight": ip_layers["1.to_k_ip.weight"],
                                "1.to_v_ip.weight": ip_layers["1.to_v_ip.weight"]})


def test_unknown_projection_rejected():
    with pytest.raises(ValueError, match="projection layout"):
        load_ip_adapter_state({
            "image_proj": {"weird": np.zeros((4, 8), np.float32)},
            "ip_adapter": {}})


def _plus_image_proj(rng, dim=16, depth=2, heads=2, dim_head=64,
                     num_queries=4, embed_dim=16, out_dim=48, ff_mult=2):
    """Synthetic h94-resampler-layout image_proj group."""
    inner = heads * dim_head
    g = {"latents": rng.normal(size=(1, num_queries, dim)).astype(np.float32),
         "proj_in.weight": rng.normal(size=(dim, embed_dim)).astype(np.float32) * .1,
         "proj_in.bias": np.zeros((dim,), np.float32),
         "proj_out.weight": rng.normal(size=(out_dim, dim)).astype(np.float32) * .1,
         "proj_out.bias": np.zeros((out_dim,), np.float32),
         "norm_out.weight": np.ones((out_dim,), np.float32),
         "norm_out.bias": np.zeros((out_dim,), np.float32)}
    for i in range(depth):
        a = f"layers.{i}.0"
        g[f"{a}.norm1.weight"] = np.ones((dim,), np.float32)
        g[f"{a}.norm1.bias"] = np.zeros((dim,), np.float32)
        g[f"{a}.norm2.weight"] = np.ones((dim,), np.float32)
        g[f"{a}.norm2.bias"] = np.zeros((dim,), np.float32)
        g[f"{a}.to_q.weight"] = rng.normal(size=(inner, dim)).astype(np.float32) * .1
        g[f"{a}.to_kv.weight"] = rng.normal(size=(2 * inner, dim)).astype(np.float32) * .1
        g[f"{a}.to_out.weight"] = rng.normal(size=(dim, inner)).astype(np.float32) * .1
        f = f"layers.{i}.1"
        g[f"{f}.0.weight"] = np.ones((dim,), np.float32)
        g[f"{f}.0.bias"] = np.zeros((dim,), np.float32)
        g[f"{f}.1.weight"] = rng.normal(size=(ff_mult * dim, dim)).astype(np.float32) * .1
        g[f"{f}.3.weight"] = rng.normal(size=(dim, ff_mult * dim)).astype(np.float32) * .1
    return g


def test_resampler_geometry_and_port():
    from ml_stable_diffusion_tpu.convert.ip_adapter import (
        port_ip_resampler,
        resampler_geometry,
    )
    from ml_stable_diffusion_tpu.models.ip_adapter import IPResampler

    rng = np.random.default_rng(3)
    g = _plus_image_proj(rng)
    geom = resampler_geometry(g)
    assert geom == {"output_dim": 48, "dim": 16, "depth": 2, "dim_head": 64,
                    "heads": 2, "num_queries": 4, "ff_mult": 2}
    params = port_ip_resampler(g)
    model = IPResampler(**geom)
    patches = rng.normal(size=(2, 5, 16)).astype(np.float32)
    out = model.apply({"params": params}, jnp.asarray(patches))
    assert out.shape == (2, 4, 48)
    assert np.isfinite(np.asarray(out)).all()
    # the ported params match what init would create (tree compatibility)
    init = jax.jit(model.init)(jax.random.key(0),
                               jnp.zeros((1, 5, 16)))["params"]
    got = jax.tree.map(lambda a: a.shape, params)
    want = jax.tree.map(lambda a: a.shape, init)
    assert got == want


def test_unet_ip_identities():
    """ip_scale=0 and zero image tokens are both exact no-ops; nonzero
    tokens at nonzero scale change the output."""
    model, params = tiny_unet()
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
    t = jnp.zeros((1,))
    ctx = jax.random.normal(jax.random.key(1), (1, 77, CTX_DIM))
    ip = jax.random.normal(jax.random.key(2), (1, 4, CTX_DIM))

    # params including the decoupled projections come from an ip-aware init
    full = jax.jit(lambda k: model.init(k, x, t, ctx, ip_context=ip))(
        jax.random.key(3))["params"]
    base = model.apply({"params": full}, x, t, ctx)
    zero_scale = model.apply({"params": full}, x, t, ctx, ip_context=ip,
                             ip_scale=0.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(zero_scale))
    zero_tokens = model.apply({"params": full}, x, t, ctx,
                              ip_context=jnp.zeros_like(ip), ip_scale=1.0)
    np.testing.assert_allclose(np.asarray(base), np.asarray(zero_tokens),
                               atol=1e-6)
    on = model.apply({"params": full}, x, t, ctx, ip_context=ip, ip_scale=1.0)
    assert np.abs(np.asarray(on) - np.asarray(base)).max() > 1e-5


def test_clip_vision_torch_parity():
    """port_clip_vision vs transformers CLIPVisionModelWithProjection."""
    torch = pytest.importorskip("torch")
    tr = pytest.importorskip("transformers")

    from ml_stable_diffusion_tpu.convert.clip_vision import port_clip_vision
    from ml_stable_diffusion_tpu.convert.report import compute_psnr
    from ml_stable_diffusion_tpu.models.clip_vision import (
        CLIPVisionConfig,
        CLIPVisionEncoder,
    )

    hf_cfg = tr.CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, projection_dim=16)
    with torch.no_grad():
        hf = tr.CLIPVisionModelWithProjection(hf_cfg).eval()
    cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=2, projection_dim=16)
    params = port_clip_vision(
        {k: v for k, v in hf.state_dict().items()}, cfg)
    model = CLIPVisionEncoder(cfg)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    ours = model.apply({"params": params}, jnp.asarray(img))
    # transformers normalizes via its processor; ours embeds the CLIP
    # mean/std — feed IT the normalized tensor
    from ml_stable_diffusion_tpu.models.safety import (
        CLIP_IMAGE_MEAN,
        CLIP_IMAGE_STD,
    )

    x = (img - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    with torch.no_grad():
        theirs = hf(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    psnr = compute_psnr(np.asarray(ours["image_embeds"]),
                        theirs.image_embeds.numpy())
    assert psnr >= 35, psnr


def _tiny_vision():
    from ml_stable_diffusion_tpu.models.clip_vision import (
        CLIPVisionConfig,
        CLIPVisionEncoder,
    )

    cfg = CLIPVisionConfig(image_size=16, patch_size=8, hidden_size=16,
                           intermediate_size=32, num_hidden_layers=1,
                           num_attention_heads=2, projection_dim=8)
    model = CLIPVisionEncoder(cfg)
    params = jax.jit(model.init)(jax.random.key(5),
                                 jnp.zeros((1, 16, 16, 3)))["params"]
    return model, params


@pytest.fixture(scope="module")
def ip_pipe(tmp_path_factory):
    tok = tiny_tokenizer(tmp_path_factory.mktemp("tok"))
    dec, enc = tiny_vae()
    pipe = StableDiffusionPipeline(
        tokenizer=tok, text_encoder=tiny_text_encoder(), unet=tiny_unet(),
        vae_decoder=dec, vae_encoder=enc)
    # synthetic BASE-format adapter state for the tiny UNet
    rng = np.random.default_rng(7)
    paths = cross_attention_paths(pipe.unet.config)
    ip_layers = {}
    for i, path in enumerate(paths):
        node = pipe.unet_params
        for k in path:
            node = node[k]
        inner = np.asarray(node["to_k"]["kernel"]).shape[1]
        ip_layers[f"{2*i+1}.to_k_ip.weight"] = (
            rng.normal(size=(inner, CTX_DIM)).astype(np.float32) * 0.1)
        ip_layers[f"{2*i+1}.to_v_ip.weight"] = (
            rng.normal(size=(inner, CTX_DIM)).astype(np.float32) * 0.1)
    vis_model, vis_params = _tiny_vision()
    proj_dim = 8
    image_proj = {
        "proj.weight": rng.normal(size=(2 * CTX_DIM, proj_dim)).astype(np.float32),
        "proj.bias": np.zeros((2 * CTX_DIM,), np.float32),
        "norm.weight": np.ones((CTX_DIM,), np.float32),
        "norm.bias": np.zeros((CTX_DIM,), np.float32),
    }
    pipe.load_ip_adapter({"image_proj": image_proj, "ip_adapter": ip_layers},
                         (vis_model, vis_params))
    return pipe


def _cfg(**kw):
    kw.setdefault("prompt", "a cat")
    kw.setdefault("step_count", 2)
    kw.setdefault("seed", 3)
    kw.setdefault("disable_safety", True)
    return PipelineConfiguration(**kw)


@pytest.mark.slow
def test_pipeline_ip_adapter_e2e(ip_pipe):
    rng = np.random.default_rng(1)
    img_a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    img_b = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    base = ip_pipe.generate_images(_cfg(), image_hw=HW).latents
    a = ip_pipe.generate_images(_cfg(ip_adapter_image=img_a), image_hw=HW).latents
    b = ip_pipe.generate_images(_cfg(ip_adapter_image=img_b), image_hw=HW).latents
    assert np.abs(a - base).max() > 1e-6  # image conditioning engaged
    assert np.abs(a - b).max() > 1e-6     # and depends on the image
    # scale=0 turns the adapter into a numerical no-op
    z = ip_pipe.generate_images(
        _cfg(ip_adapter_image=img_a, ip_adapter_scale=0.0), image_hw=HW).latents
    np.testing.assert_allclose(z, base, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_ip_adapter_with_inpaint(ip_pipe):
    """IP conditioning composes with the inpainting pack: kept region is
    still image-invariant, repainted region responds to the ip image."""
    rng = np.random.default_rng(2)
    init = rng.uniform(-0.5, 0.5, (1, 64, 64, 3)).astype(np.float32)
    mask = np.zeros((64, 64), np.float32)
    mask[:, :32] = 1.0
    ref_a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    ref_b = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    a = ip_pipe.generate_images(
        _cfg(starting_image=init, mask_image=mask, ip_adapter_image=ref_a),
        image_hw=HW).latents
    b = ip_pipe.generate_images(
        _cfg(starting_image=init, mask_image=mask, ip_adapter_image=ref_b),
        image_hw=HW).latents
    np.testing.assert_array_equal(a[:, :, 4:], b[:, :, 4:])
    assert np.abs(a[:, :, :4] - b[:, :, :4]).max() > 1e-6


def test_ip_requires_load(ip_pipe, tmp_path_factory):
    tok = tiny_tokenizer(tmp_path_factory.mktemp("tok2"))
    dec, enc = tiny_vae()
    plain = StableDiffusionPipeline(
        tokenizer=tok, text_encoder=tiny_text_encoder(), unet=tiny_unet(),
        vae_decoder=dec, vae_encoder=enc)
    with pytest.raises(ValueError, match="load_ip_adapter"):
        plain.generate_images(
            _cfg(ip_adapter_image=np.zeros((16, 16, 3), np.float32)),
            image_hw=HW)


@pytest.mark.slow
def test_pipeline_ip_adapter_plus_e2e(tmp_path_factory):
    """PLUS adapter end-to-end: the resampler consumes the vision
    encoder's penultimate patch states and conditions generation."""
    rng = np.random.default_rng(9)
    tok = tiny_tokenizer(tmp_path_factory.mktemp("tokp"))
    dec, enc = tiny_vae()
    pipe = StableDiffusionPipeline(
        tokenizer=tok, text_encoder=tiny_text_encoder(), unet=tiny_unet(),
        vae_decoder=dec, vae_encoder=enc)
    paths = cross_attention_paths(pipe.unet.config)
    ip_layers = {}
    for i, path in enumerate(paths):
        node = pipe.unet_params
        for k in path:
            node = node[k]
        inner = np.asarray(node["to_k"]["kernel"]).shape[1]
        ip_layers[f"{2*i+1}.to_k_ip.weight"] = (
            rng.normal(size=(inner, CTX_DIM)).astype(np.float32) * 0.1)
        ip_layers[f"{2*i+1}.to_v_ip.weight"] = (
            rng.normal(size=(inner, CTX_DIM)).astype(np.float32) * 0.1)
    vis_model, vis_params = _tiny_vision()
    # resampler over the tiny vision tower's penultimate states (hidden 16)
    image_proj = _plus_image_proj(rng, embed_dim=16, out_dim=CTX_DIM)
    pipe.load_ip_adapter({"image_proj": image_proj, "ip_adapter": ip_layers},
                         (vis_model, vis_params))
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    base = pipe.generate_images(_cfg(), image_hw=HW).latents
    on = pipe.generate_images(_cfg(ip_adapter_image=img), image_hw=HW).latents
    assert np.abs(on - base).max() > 1e-6
