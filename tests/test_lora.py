"""LoRA adapter tests: format parsing (kohya incl. SDXL sgm naming,
diffusers PEFT, old attn-processor), delta math, layout orientation vs
torch, pipeline merge/stack/clear semantics."""

import numpy as np
import pytest

from ml_stable_diffusion_tpu.convert import lora as L
from ml_stable_diffusion_tpu.convert.native_io import save_file

from helpers import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae


def test_kohya_demangle_diffusers_names():
    cases = {
        "down_blocks_1_attentions_0_transformer_blocks_0_attn1_to_q":
            "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q",
        "up_blocks_2_attentions_1_transformer_blocks_3_attn2_to_out_0":
            "up_blocks.2.attentions.1.transformer_blocks.3.attn2.to_out.0",
        "mid_block_attentions_0_transformer_blocks_0_ff_net_0_proj":
            "mid_block.attentions.0.transformer_blocks.0.ff.net.0.proj",
        "down_blocks_0_attentions_0_transformer_blocks_0_ff_net_2":
            "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2",
        "down_blocks_0_resnets_1_conv1": "down_blocks.0.resnets.1.conv1",
        "up_blocks_1_resnets_0_conv_shortcut":
            "up_blocks.1.resnets.0.conv_shortcut",
        "down_blocks_1_attentions_0_proj_in":
            "down_blocks.1.attentions.0.proj_in",
        "down_blocks_0_downsamplers_0_conv":
            "down_blocks.0.downsamplers.0.conv",
        "mid_block_resnets_0_time_emb_proj":
            "mid_block.resnets.0.time_emb_proj",
    }
    for mangled, want in cases.items():
        assert L._kohya_demangle(L.TARGET_UNET, mangled) == want


def test_kohya_demangle_sgm_names():
    """kohya's SDXL trainer uses sgm module names; the stride-3 block
    arithmetic matches diffusers' non-diffusers-LoRA loader."""
    cases = {
        "input_blocks_4_1_transformer_blocks_0_attn1_to_q":
            "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q",
        "input_blocks_8_1_transformer_blocks_9_attn2_to_v":
            "down_blocks.2.attentions.1.transformer_blocks.9.attn2.to_v",
        "middle_block_1_transformer_blocks_2_ff_net_0_proj":
            "mid_block.attentions.0.transformer_blocks.2.ff.net.0.proj",
        "output_blocks_5_1_transformer_blocks_0_attn1_to_k":
            "up_blocks.1.attentions.2.transformer_blocks.0.attn1.to_k",
        "output_blocks_0_1_proj_out": "up_blocks.0.attentions.0.proj_out",
        "input_blocks_1_0_in_layers_2": "down_blocks.0.resnets.0.conv1",
        "input_blocks_5_0_out_layers_3": "down_blocks.1.resnets.1.conv2",
        "output_blocks_3_0_skip_connection":
            "up_blocks.1.resnets.0.conv_shortcut",
        "middle_block_2_emb_layers_1": "mid_block.resnets.1.time_emb_proj",
        "input_blocks_3_0_op": "down_blocks.0.downsamplers.0.conv",
        "output_blocks_2_2_conv": "up_blocks.0.upsamplers.0.conv",
    }
    for mangled, want in cases.items():
        assert L._kohya_demangle(L.TARGET_UNET, mangled) == want


def test_kohya_demangle_te_and_transformer():
    assert (L._kohya_demangle(
        L.TARGET_TE, "text_model_encoder_layers_11_self_attn_q_proj")
        == "text_model.encoder.layers.11.self_attn.q_proj")
    assert (L._kohya_demangle(L.TARGET_TE2,
                              "text_model_encoder_layers_3_mlp_fc1")
            == "text_model.encoder.layers.3.mlp.fc1")
    cases = {
        "transformer_blocks_0_attn_to_q": "transformer_blocks.0.attn.to_q",
        "transformer_blocks_5_attn_add_k_proj":
            "transformer_blocks.5.attn.add_k_proj",
        "transformer_blocks_1_attn_to_out_0":
            "transformer_blocks.1.attn.to_out.0",
        "transformer_blocks_2_ff_net_0_proj":
            "transformer_blocks.2.ff.net.0.proj",
        "transformer_blocks_2_ff_context_net_2":
            "transformer_blocks.2.ff_context.net.2",
        "transformer_blocks_3_norm1_context_linear":
            "transformer_blocks.3.norm1_context.linear",
    }
    for mangled, want in cases.items():
        assert L._kohya_demangle(L.TARGET_TRANSFORMER, mangled) == want


def test_delta_math():
    rng = np.random.default_rng(0)
    down = rng.normal(size=(4, 16)).astype(np.float32)
    up = rng.normal(size=(8, 4)).astype(np.float32)
    # alpha=None -> alpha == rank -> plain up@down
    m = L.LoRAModule(down=down, up=up)
    np.testing.assert_allclose(m.delta(), up @ down, rtol=1e-6)
    # explicit alpha scales by alpha/rank; scale multiplies
    m = L.LoRAModule(down=down, up=up, alpha=2.0)
    np.testing.assert_allclose(m.delta(scale=3.0),
                               3.0 * (2.0 / 4.0) * (up @ down), rtol=1e-6)
    # conv LoRA: (out,r,1,1) x (r,in,kh,kw)
    downc = rng.normal(size=(4, 16, 3, 3)).astype(np.float32)
    upc = rng.normal(size=(8, 4, 1, 1)).astype(np.float32)
    m = L.LoRAModule(down=downc, up=upc)
    want = np.einsum("or,rihw->oihw", upc[:, :, 0, 0], downc)
    np.testing.assert_allclose(m.delta(), want, rtol=1e-4, atol=1e-5)


def test_parse_kohya_and_peft_equivalent():
    rng = np.random.default_rng(1)
    down = rng.normal(size=(2, 16)).astype(np.float32)
    up = rng.normal(size=(16, 2)).astype(np.float32)
    base = "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
    kohya = {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_down.weight": down,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_up.weight": up,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".alpha": np.float32(1.0),
    }
    peft = {f"unet.{base}.lora_A.weight": down,
            f"unet.{base}.lora_B.weight": up}
    proc = {"down_blocks.0.attentions.0.transformer_blocks.0.attn1"
            ".processor.to_q_lora.down.weight": down,
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1"
            ".processor.to_q_lora.up.weight": up}
    a = L.parse_lora_state_dict(kohya)
    b = L.parse_lora_state_dict(peft)
    c = L.parse_lora_state_dict(proc)
    for ad in (a, b, c):
        assert set(ad.modules) == {(L.TARGET_UNET, base)}
    assert a.modules[(L.TARGET_UNET, base)].alpha == 1.0
    # kohya carries alpha=1 at rank 2 -> factor 0.5; PEFT has no alpha ->
    # factor 1.0
    np.testing.assert_allclose(a.modules[(L.TARGET_UNET, base)].delta(),
                               0.5 * b.modules[(L.TARGET_UNET, base)].delta(),
                               rtol=1e-6)


def test_missing_factor_rejected():
    with pytest.raises(ValueError, match="missing a factor"):
        L.parse_lora_state_dict(
            {"unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_q"
             ".lora_A.weight": np.zeros((2, 8), np.float32)})


def test_orientation_matches_torch():
    """Merged forward == torch forward with W + (alpha/r) up@down, for both
    a Linear (kernel (in,out)) and a 3x3 conv (kernel HWIO)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    # Linear
    W = rng.normal(size=(8, 16)).astype(np.float32)  # torch (out, in)
    down = rng.normal(size=(2, 16)).astype(np.float32)
    up = rng.normal(size=(8, 2)).astype(np.float32)
    x = rng.normal(size=(5, 16)).astype(np.float32)
    kernel = W.T.copy()  # ported layout (in, out)
    d = L._oriented_delta(L.LoRAModule(down, up).delta(0.7), kernel)
    merged = kernel + d
    ours = x @ merged
    wt = torch.nn.functional.linear(
        torch.from_numpy(x),
        torch.from_numpy(W + 0.7 * (up @ down))).numpy()
    np.testing.assert_allclose(ours, wt, rtol=1e-4, atol=1e-4)
    # Conv 3x3
    Wc = rng.normal(size=(8, 4, 3, 3)).astype(np.float32)  # OIHW
    downc = rng.normal(size=(2, 4, 3, 3)).astype(np.float32)
    upc = rng.normal(size=(8, 2, 1, 1)).astype(np.float32)
    xc = rng.normal(size=(1, 6, 6, 4)).astype(np.float32)
    kern = Wc.transpose(2, 3, 1, 0).copy()  # HWIO
    dc = L._oriented_delta(L.LoRAModule(downc, upc).delta(), kern)
    import jax
    import jax.numpy as jnp

    ours_c = jax.lax.conv_general_dilated(
        jnp.asarray(xc), jnp.asarray(kern + dc), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    mergedW = Wc + np.einsum("or,rihw->oihw", upc[:, :, 0, 0], downc)
    wt_c = torch.nn.functional.conv2d(
        torch.from_numpy(xc.transpose(0, 3, 1, 2)),
        torch.from_numpy(mergedW), padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours_c), wt_c, rtol=1e-3, atol=1e-3)


def _tiny_unet_adapter(params, scale_seed=3, rank=2):
    """Kohya-format adapter hitting a dense attn proj, the GEGLU proj and a
    3x3 conv of the tiny UNet; returns (state_dict, expected deltas)."""
    rng = np.random.default_rng(scale_seed)
    sd = {}
    expected = {}

    def add(mangled, flax_path, conv=False):
        kern = params
        for k in flax_path:
            kern = kern[k]
        kern = np.asarray(kern["kernel"])
        if conv:
            kh, kw, cin, cout = kern.shape
            down = rng.normal(size=(rank, cin, kh, kw)).astype(np.float32) * .1
            up = rng.normal(size=(cout, rank, 1, 1)).astype(np.float32) * .1
            d = np.einsum("or,rihw->oihw", up[:, :, 0, 0],
                          down).transpose(2, 3, 1, 0)
        else:
            cin, cout = kern.shape
            down = rng.normal(size=(rank, cin)).astype(np.float32) * 0.1
            up = rng.normal(size=(cout, rank)).astype(np.float32) * 0.1
            d = (up @ down).T
        sd[f"lora_unet_{mangled}.lora_down.weight"] = down
        sd[f"lora_unet_{mangled}.lora_up.weight"] = up
        sd[f"lora_unet_{mangled}.alpha"] = np.float32(rank)  # factor 1.0
        expected[flax_path + ("kernel",)] = d

    add("down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q",
        ("down_blocks_0_attentions_0", "transformer_blocks_0", "attn1",
         "to_q"))
    add("down_blocks_0_attentions_0_transformer_blocks_0_ff_net_0_proj",
        ("down_blocks_0_attentions_0", "transformer_blocks_0", "ff",
         "geglu_proj"))
    add("down_blocks_0_resnets_0_conv1",
        ("down_blocks_0_resnets_0", "conv1"), conv=True)
    return sd, expected


def test_merge_into_tiny_unet():
    _, params = tiny_unet()
    sd, expected = _tiny_unet_adapter(params)
    adapter = L.parse_lora_state_dict(sd)
    originals = {}
    merged = L.merge_lora_into_params(params, adapter, L.TARGET_UNET,
                                      scale=1.0, originals=originals)
    assert set(originals) == set(expected)
    for path, d in expected.items():
        node_m, node_o = merged, params
        for k in path:
            node_m, node_o = node_m[k], node_o[k]
        np.testing.assert_allclose(np.asarray(node_m),
                                   np.asarray(node_o) + d,
                                   rtol=2e-5, atol=2e-5)
    # untouched leaves are shared, not copied (copy-on-write merge)
    assert merged["conv_in"] is params["conv_in"]


@pytest.mark.slow
def test_pipeline_apply_stack_clear(tmp_path):
    import jax.numpy as jnp

    from ml_stable_diffusion_tpu.pipelines import (
        PipelineConfiguration,
        StableDiffusionPipeline,
    )

    dec, enc = tiny_vae()
    pipe = StableDiffusionPipeline(
        tokenizer=tiny_tokenizer(tmp_path), text_encoder=tiny_text_encoder(),
        unet=tiny_unet(), vae_decoder=dec, vae_encoder=enc)
    cfg = lambda: PipelineConfiguration(prompt="a cat", step_count=2,
                                        seed=7, disable_safety=True)
    base = pipe.generate_images(cfg(), image_hw=(64, 64)).latents

    sd, expected = _tiny_unet_adapter(pipe.unet_params)
    lora_path = tmp_path / "adapter.safetensors"
    save_file(sd, lora_path)

    # scale=0 is an exact no-op on the weights
    pipe.apply_lora(lora_path, scale=0.0)
    z = pipe.generate_images(cfg(), image_hw=(64, 64)).latents
    np.testing.assert_array_equal(base, z)
    pipe.clear_loras()

    pipe.apply_lora(lora_path, scale=1.0)
    assert pipe.applied_loras == [("adapter", 1.0)]
    a = pipe.generate_images(cfg(), image_hw=(64, 64)).latents
    assert np.abs(a - base).max() > 1e-6

    # stacking the same adapter again doubles the delta
    pipe.apply_lora(lora_path, scale=1.0)
    for path, d in expected.items():
        node = pipe.unet_params
        for k in path:
            node = node[k]
        orig = pipe._lora_originals["unet_params"][path]
        np.testing.assert_allclose(np.asarray(node), orig + 2 * d,
                                   rtol=2e-5, atol=2e-5)

    # clear restores bit-exactly and reproduces the baseline
    pipe.clear_loras()
    b = pipe.generate_images(cfg(), image_hw=(64, 64)).latents
    np.testing.assert_array_equal(base, b)
    assert pipe.applied_loras == []


def test_pipeline_text_encoder_lora(tmp_path):
    from ml_stable_diffusion_tpu.pipelines import StableDiffusionPipeline

    dec, enc = tiny_vae()
    pipe = StableDiffusionPipeline(
        tokenizer=tiny_tokenizer(tmp_path), text_encoder=tiny_text_encoder(),
        unet=tiny_unet(), vae_decoder=dec, vae_encoder=enc)
    rng = np.random.default_rng(5)
    kern = np.asarray(pipe.text_encoder_params["layers_0"]["q_proj"]["kernel"])
    cin, cout = kern.shape
    sd = {"lora_te_text_model_encoder_layers_0_self_attn_q_proj"
          ".lora_down.weight": rng.normal(size=(2, cin)).astype(np.float32),
          "lora_te_text_model_encoder_layers_0_self_attn_q_proj"
          ".lora_up.weight": rng.normal(size=(cout, 2)).astype(np.float32)}
    pipe.apply_lora(L.parse_lora_state_dict(sd), scale=0.5)
    merged = np.asarray(
        pipe.text_encoder_params["layers_0"]["q_proj"]["kernel"])
    want = kern + 0.5 * (sd["lora_te_text_model_encoder_layers_0_self_attn_"
                            "q_proj.lora_up.weight"]
                         @ sd["lora_te_text_model_encoder_layers_0_self_attn_"
                              "q_proj.lora_down.weight"]).T
    np.testing.assert_allclose(merged, want, rtol=2e-5, atol=2e-5)
    # adapter targeting a component the pipeline lacks -> clear error
    sd2 = {"text_encoder_2.text_model.encoder.layers.0.self_attn.q_proj"
           ".lora_A.weight": np.zeros((2, 8), np.float32),
           "text_encoder_2.text_model.encoder.layers.0.self_attn.q_proj"
           ".lora_B.weight": np.zeros((8, 2), np.float32)}
    with pytest.raises(ValueError, match="no component"):
        pipe.apply_lora(L.parse_lora_state_dict(sd2))


def test_mmdit_lora_paths():
    """Translated SD3 (transformer.) module paths exist in a tiny MMDiT
    param tree and merging changes exactly those kernels."""
    import jax
    import jax.numpy as jnp

    from ml_stable_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig

    cfg = MMDiTConfig(depth=2, hidden_size=32, num_heads=2, patch_size=2,
                      context_dim=16, pooled_dim=16, pos_embed_max_size=8)
    model = MMDiT(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 8, 8, cfg.in_channels)),
        jnp.zeros((1,)), jnp.zeros((1, 5, 16)), jnp.zeros((1, 16)))["params"]

    rng = np.random.default_rng(6)
    sd = {}
    for mod in ("transformer_blocks.0.attn.to_q",
                "transformer_blocks.0.attn.add_v_proj",
                "transformer_blocks.1.ff.net.0.proj",
                "transformer_blocks.0.ff_context.net.2",
                "transformer_blocks.0.norm1.linear",
                "context_embedder"):
        path = L.mmdit_flax_path(mod)
        kern = params
        for k in path:
            kern = kern[k]
        cin, cout = np.asarray(kern["kernel"]).shape
        sd[f"transformer.{mod}.lora_A.weight"] = (
            rng.normal(size=(2, cin)).astype(np.float32))
        sd[f"transformer.{mod}.lora_B.weight"] = (
            rng.normal(size=(cout, 2)).astype(np.float32))
    adapter = L.parse_lora_state_dict(sd)
    originals = {}
    merged = L.merge_lora_into_params(params, adapter, L.TARGET_TRANSFORMER,
                                      originals=originals)
    assert len(originals) == 6
    for path in originals:
        node_m, node_o = merged, params
        for k in path:
            node_m, node_o = node_m[k], node_o[k]
        assert np.abs(np.asarray(node_m) - np.asarray(node_o)).max() > 0
