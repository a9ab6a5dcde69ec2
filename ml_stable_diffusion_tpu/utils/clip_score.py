"""CLIP score: image-prompt cosine similarity.

TPU analog of the reference's opt-in quality gate
(tests/test_stable_diffusion.py test_image_to_prompt_clip_score :117-156,
threshold 0.3 :37): embeds the prompt with a CLIP text tower and the image
with a CLIP vision tower (the same ViT used by models/safety.py), and scores
their cosine similarity.  Weights come from any HF CLIP checkpoint via
convert/clip.py + convert/safety.py-style porting.

The score is only meaningful in CLIP *joint* space: the text tower must
carry a ``text_projection`` (``use_text_projection=True``) projecting the
EOS hidden state into the vision tower's ``projection_dim``.  SD1.x's
bundled text encoder has NO text_projection — its 768-dim pooled output
coincidentally matches the safety checker's visual joint dim, so a shape
check cannot catch the mismatch; we guard on the config itself.  Note the
reference's 0.3 threshold (test_stable_diffusion.py:37) was calibrated on
a full CLIPModel with projected text_embeds; it has never been exercised
against a real checkpoint in this repo (no network on the build host), so
``--min-clip-score`` should be re-validated before production gating.
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

    # Guard on the ACTUAL joint-space condition, not output shape: SD1.x
    # text encoders pool to 768 which coincidentally equals the safety
    # checker's projection_dim, so a dim check passes while the score is
    # computed outside CLIP joint space (advisor finding r4).
    te_cfg = getattr(text_encoder, "config", None)
    if not getattr(te_cfg, "use_text_projection", False):
        raise ValueError(
            "clip_score requires a text encoder WITH text_projection "
            "(use_text_projection=True) so the pooled output lands in the "
            "CLIP joint space; this encoder pools the raw EOS hidden state "
            "(SD1.x-style). Point --clip-checkpoint at a full CLIP bundle "
            "whose text_encoder carries a text_projection into the safety "
            "checker's projection_dim.")

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
