"""CLIP score: image-prompt cosine similarity.

TPU analog of the reference's opt-in quality gate
(tests/test_stable_diffusion.py test_image_to_prompt_clip_score :117-156,
threshold 0.3 :37): embeds the prompt with a CLIP text tower and the image
with a CLIP vision tower (the same ViT used by models/safety.py), and scores
their cosine similarity.  Weights come from any HF CLIP checkpoint via
convert/clip.py + convert/safety.py-style porting.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

#: reference quality gate (test_stable_diffusion.py:37)
MINIMUM_CLIP_SCORE = 0.3


def clip_score(text_encoder, text_params, vision_model, vision_params,
               tokenizer, prompt: str, pil_image) -> float:
    """cosine(text embedding, image embedding) in [-1, 1]."""
    from PIL import Image

    ids, _ = tokenizer.tokenize(prompt)
    tout = text_encoder.apply({"params": text_params}, jnp.asarray(ids[None]))
    temb = np.asarray(tout["pooled_output"][0], np.float64)
    temb /= np.linalg.norm(temb) + 1e-8

    size = vision_model.config.image_size
    img = np.asarray(pil_image.resize((size, size), Image.BICUBIC),
                     np.float32) / 255.0
    vout = vision_model.apply({"params": vision_params}, jnp.asarray(img[None]))
    vemb = np.asarray(vout["image_embeds"], np.float64).reshape(-1)
    vemb /= np.linalg.norm(vemb) + 1e-8
    if temb.shape != vemb.shape:
        raise ValueError(
            f"text embedding dim {temb.shape[0]} != image embedding dim "
            f"{vemb.shape[0]}: the text tower does not project into the "
            "vision tower's joint space — point --clip-checkpoint at a "
            "bundle whose text encoder carries a text_projection into the "
            "safety checker's projection_dim")
    return float(temb @ vemb)
