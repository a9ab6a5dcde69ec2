"""Convert-time correctness gates.

The reference's converter asserts >= 35 dB PSNR against the source torch
module for every converted model as part of the tool itself
(torch2coreml.py report_correctness :80-97, ABSOLUTE_MIN_PSNR :77).  Here:

- modules with a transformers-executable reference (CLIP text encoders, T5,
  the safety checker's CLIP vision tower) are executed in torch directly
  from the checkpoint directory and gated at >= 35 dB;
- modules without a local torch implementation (UNet / VAE / ControlNet /
  MMDiT — their torch classes live in diffusers, which is not a dependency)
  are gated structurally: every source tensor must have been consumed by the
  port (element-count match), which catches silently dropped weights.  Their
  numerical parity is covered by the test suite's hand-built torch blocks
  (tests/test_unet.py, tests/test_vae.py).
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
