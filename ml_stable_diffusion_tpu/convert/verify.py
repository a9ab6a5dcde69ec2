"""Convert-time correctness gates.

The reference's converter asserts >= 35 dB PSNR against the source torch
module for every converted model as part of the tool itself
(torch2coreml.py report_correctness :80-97, ABSOLUTE_MIN_PSNR :77).  Here:

- modules with a transformers-executable reference (CLIP text encoders, T5,
  the safety checker's CLIP vision tower) are executed in torch directly
  from the checkpoint directory and gated at >= 35 dB;
- UNet / VAE / ControlNet / MMDiT (whose torch classes live in diffusers,
  not a dependency here) are gated against the independent torch mirror
  forwards in convert/torch_mirrors.py — full assembled-model numerics on
  the same state dict, >= 35 dB, exactly the reference's own UNet gate
  (torch2coreml.py:970-975) — plus an element-count match (catches silently
  dropped weights the numerics could mask on sparse-impact tensors).
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from .report import report_correctness

logger = logging.getLogger(__name__)


def _tree_element_count(params) -> int:
    import jax

    return sum(int(np.prod(np.shape(leaf)))
               for leaf in jax.tree_util.tree_leaves(params))


def element_count_matches(state_dict: dict, params, name: str,
                          exclude: tuple[str, ...] = ("position_ids",)):
    """Assert the port consumed every source tensor (no silent drops)."""
    src = sum(int(np.prod(tuple(v.shape))) for k, v in state_dict.items()
              if not any(e in k for e in exclude))
    dst = _tree_element_count(params)
    if src != dst:
        raise AssertionError(
            f"{name}: ported element count {dst} != source {src} — "
            "the port dropped or duplicated tensors")
    logger.info("%s: element count matches source (%d)", name, src)


# ---- full-model mirrors (UNet / VAE / ControlNet / MMDiT) -----------------
#
# The reference gates the UNet itself numerically at conversion time
# (torch2coreml.py:970-975); these run the independent torch mirror forwards
# (convert/torch_mirrors.py) against the ported Flax model on random inputs
# and gate >= 35 dB.


def _rand(rng, *shape):
    import jax.numpy as jnp

    return jnp.asarray(rng.randn(*shape), jnp.float32)


def _nchw(x):
    import torch

    return torch.from_numpy(np.asarray(x, np.float32).transpose(0, 3, 1, 2))


def _xl_added_cond(cfg, rng, B, text_embed_dim=None):
    """SDXL/refiner micro-conditioning inputs sized from the config.  The
    pooled text width is 1280 for the published XL/refiner checkpoints
    (TextEncoderXL projection); tiny test configs pass it explicitly."""
    if text_embed_dim is None:
        cand = cfg.projection_class_embeddings_input_dim - 1280
        if cand > 0 and cand % cfg.addition_time_embed_dim == 0:
            text_embed_dim = 1280
        else:  # fall back to the XL convention of 6 time ids
            text_embed_dim = (cfg.projection_class_embeddings_input_dim
                              - 6 * cfg.addition_time_embed_dim)
    n_ids = ((cfg.projection_class_embeddings_input_dim - text_embed_dim)
             // cfg.addition_time_embed_dim)
    import jax.numpy as jnp

    return {
        "text_embeds": _rand(rng, B, text_embed_dim),
        "time_ids": jnp.asarray(
            rng.randint(0, 1024, size=(B, n_ids)).astype(np.float32)),
    }


def torch_parity_unet(state_dict, model, params, label="unet",
                      text_embed_dim=None, hw=16) -> float:
    """Assembled-UNet gate: ported Flax forward vs the diffusers-semantics
    torch mirror on the SAME state dict (>= 35 dB)."""
    import torch

    from .torch_mirrors import torch_unet_forward

    cfg = model.config
    rng = np.random.RandomState(0)
    B = 2
    sample = _rand(rng, B, hw, hw, cfg.in_channels)
    t = np.asarray([500.0, 10.0], np.float32)
    ctx = _rand(rng, B, 77, cfg.cross_attention_dim)
    added = (None if cfg.addition_embed_type is None
             else _xl_added_cond(cfg, rng, B, text_embed_dim))
    import jax.numpy as jnp

    tc = (None if not getattr(cfg, "time_cond_proj_dim", None)
          else _rand(rng, B, cfg.time_cond_proj_dim))  # LCM guidance input
    out = model.apply({"params": params}, sample, jnp.asarray(t), ctx,
                      added_cond=added, timestep_cond=tc)
    t_added = None if added is None else {
        k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in added.items()}
    ref = torch_unet_forward(state_dict, cfg, _nchw(sample),
                             torch.from_numpy(t),
                             torch.from_numpy(np.asarray(ctx, np.float32)),
                             added_cond=t_added,
                             timestep_cond=(None if tc is None else
                                            torch.from_numpy(
                                                np.asarray(tc, np.float32))))
    return report_correctness(np.asarray(out, np.float32).transpose(0, 3, 1, 2),
                              ref.numpy(), f"convert:{label}")


def torch_parity_controlnet(state_dict, model, params,
                            label="controlnet") -> float:
    import torch

    from .torch_mirrors import torch_controlnet_forward

    cfg = model.config
    rng = np.random.RandomState(0)
    B, hw = 2, 16
    sample = _rand(rng, B, hw, hw, cfg.in_channels)
    t = np.asarray([500.0, 10.0], np.float32)
    ctx = _rand(rng, B, 77, cfg.cross_attention_dim)
    cond = np.asarray(rng.rand(B, hw * 8, hw * 8, 3), np.float32)
    import jax.numpy as jnp

    down, mid = model.apply({"params": params}, sample, jnp.asarray(t), ctx,
                            jnp.asarray(cond))
    rdown, rmid = torch_controlnet_forward(
        state_dict, cfg, _nchw(sample), torch.from_numpy(t),
        torch.from_numpy(np.asarray(ctx, np.float32)), _nchw(cond))
    got = np.concatenate([np.asarray(d, np.float32).transpose(0, 3, 1, 2).ravel()
                          for d in down]
                         + [np.asarray(mid, np.float32).transpose(0, 3, 1, 2).ravel()])
    ref = np.concatenate([r.numpy().ravel() for r in rdown]
                         + [rmid.numpy().ravel()])
    return report_correctness(got, ref, f"convert:{label}")


def torch_parity_vae_decoder(state_dict, model, params,
                             label="vae_decoder", hw=8) -> float:
    from .torch_mirrors import torch_vae_decoder_forward

    cfg = model.config
    rng = np.random.RandomState(0)
    z = _rand(rng, 2, hw, hw, cfg.latent_channels)
    out = model.apply({"params": params}, z)
    ref = torch_vae_decoder_forward(state_dict, cfg, _nchw(z))
    return report_correctness(np.asarray(out, np.float32).transpose(0, 3, 1, 2),
                              ref.numpy(), f"convert:{label}")


def torch_parity_vae_encoder(state_dict, model, params,
                             label="vae_encoder", hw=64) -> float:
    from .torch_mirrors import torch_vae_encoder_forward

    cfg = model.config
    rng = np.random.RandomState(0)
    x = _rand(rng, 2, hw, hw, cfg.in_channels) * 0.5
    out = model.apply({"params": params}, x)
    ref = torch_vae_encoder_forward(state_dict, cfg, _nchw(x))
    return report_correctness(np.asarray(out, np.float32).transpose(0, 3, 1, 2),
                              ref.numpy(), f"convert:{label}")


def torch_parity_mmdit(state_dict, model, params, label="mmdit",
                       hw=16) -> float:
    import torch

    from .torch_mirrors import torch_mmdit_forward

    cfg = model.config
    rng = np.random.RandomState(0)
    B = 2
    latents = _rand(rng, B, hw, hw, cfg.in_channels)
    t = np.asarray([800.0, 200.0], np.float32)
    ctx = _rand(rng, B, 20, cfg.context_dim)
    pooled = _rand(rng, B, cfg.pooled_dim)
    import jax.numpy as jnp

    out = model.apply({"params": params}, latents, jnp.asarray(t), ctx, pooled)
    ref = torch_mmdit_forward(state_dict, cfg, _nchw(latents),
                              torch.from_numpy(t),
                              torch.from_numpy(np.asarray(ctx, np.float32)),
                              torch.from_numpy(np.asarray(pooled, np.float32)))
    return report_correctness(np.asarray(out, np.float32).transpose(0, 3, 1, 2),
                              ref.numpy(), f"convert:{label}")


def torch_parity_sd3_controlnet(state_dict, model, params,
                                label="sd3_controlnet", hw=16) -> float:
    import torch

    from .torch_mirrors import torch_sd3_controlnet_forward

    cfg = model.config
    mcfg = cfg.mmdit
    rng = np.random.RandomState(0)
    B = 2
    latents = _rand(rng, B, hw, hw, mcfg.in_channels)
    t = np.asarray([800.0, 200.0], np.float32)
    ctx = _rand(rng, B, 20, mcfg.context_dim)
    pooled = _rand(rng, B, mcfg.pooled_dim)
    cond = _rand(rng, B, hw, hw, mcfg.in_channels)
    import jax.numpy as jnp

    down, _ = model.apply({"params": params}, latents, jnp.asarray(t), ctx,
                          pooled, cond)
    ref = torch_sd3_controlnet_forward(
        state_dict, mcfg, cfg.num_layers, _nchw(latents),
        torch.from_numpy(t),
        torch.from_numpy(np.asarray(ctx, np.float32)),
        torch.from_numpy(np.asarray(pooled, np.float32)), _nchw(cond))
    got = np.concatenate([np.asarray(d, np.float32).ravel() for d in down])
    refv = np.concatenate([r.numpy().ravel() for r in ref])
    return report_correctness(got, refv, f"convert:{label}")


def torch_parity_text_encoder(module_dir: str | Path, model, params) -> float:
    """Run the checkpoint's torch CLIP text encoder and gate >= 35 dB."""
    import jax.numpy as jnp
    import torch
    import transformers

    module_dir = Path(module_dir)
    cls = (transformers.CLIPTextModelWithProjection
           if model.config.use_text_projection else transformers.CLIPTextModel)
    tm = cls.from_pretrained(module_dir).eval()

    rng = np.random.RandomState(0)
    ids = rng.randint(1, model.config.vocab_size - 2, size=(2, 77))
    ids[:, 0] = min(49406, model.config.vocab_size - 2)
    eos = model.config.eos_token_id
    ids[0, 20:] = eos
    ids[1, 50:] = eos
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids))
    out = model.apply({"params": params}, jnp.asarray(ids))
    ref_hidden = (ref.last_hidden_state.numpy())
    return report_correctness(np.asarray(out["last_hidden_state"],
                                         np.float32),
                              ref_hidden, f"convert:{module_dir.name}")


def torch_parity_t5(module_dir: str | Path, model, params) -> float:
    import jax.numpy as jnp
    import torch
    import transformers

    module_dir = Path(module_dir)
    tm = transformers.T5EncoderModel.from_pretrained(
        module_dir, torch_dtype=torch.float32).eval()
    rng = np.random.RandomState(0)
    ids = rng.randint(3, model.config.vocab_size - 1, size=(2, 77))
    mask = np.ones_like(ids)
    ids[1, 40:] = 0
    mask[1, 40:] = 0
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)).last_hidden_state
    out = model.apply({"params": params}, jnp.asarray(ids),
                      jnp.asarray(mask))
    return report_correctness(
        np.asarray(out["encoder_hidden_states"], np.float32), ref.numpy(),
        f"convert:{module_dir.name}")


def torch_parity_safety(module_dir: str | Path, model, params) -> float:
    """Gate the safety checker's CLIP vision tower + projection against the
    checkpoint's torch weights (the concept-score math past the projection
    is pure numpy, covered by unit tests)."""
    import jax.numpy as jnp
    import torch
    import transformers

    from ..models.safety import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD
    from .load import load_safetensors_state_dict

    module_dir = Path(module_dir)
    cfg = model.config
    vision_cfg = transformers.CLIPVisionConfig(
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        projection_dim=cfg.projection_dim)
    tm = transformers.CLIPVisionModel(vision_cfg).eval()
    sd = load_safetensors_state_dict(module_dir)
    vision_sd = {k[len("vision_model."):]: torch.from_numpy(np.asarray(v))
                 for k, v in sd.items() if k.startswith("vision_model.")}
    tm.load_state_dict(vision_sd)
    proj = np.asarray(sd["visual_projection.weight"], np.float32)

    rng = np.random.RandomState(0)
    imgs = rng.rand(2, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    x = (imgs - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    with torch.no_grad():
        pooled = tm(pixel_values=torch.from_numpy(
            x.transpose(0, 3, 1, 2))).pooler_output.numpy()
    ref = pooled @ proj.T
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)

    out = model.apply({"params": params}, jnp.asarray(imgs))
    return report_correctness(np.asarray(out["image_embeds"], np.float32),
                              ref, f"convert:{module_dir.name}")
