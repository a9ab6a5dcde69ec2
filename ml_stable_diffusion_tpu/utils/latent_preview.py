"""Cheap latent -> RGB preview (no VAE decode).

The reference renders mid-generation previews for SD3 by a linear latent->RGB
map (StableDiffusion3Pipeline.swift decodePreviewImage + rgbFactors
:327-394).  The factor matrix is checkpoint-family-specific; the SD 1.x/2.x
4-channel factors below are the widely used linear approximation, and custom
(e.g. 16-channel SD3) factors can be supplied per call.
"""

from __future__ import annotations

import numpy as np

#: 4-channel SD latent -> RGB linear factors (rows: latent ch, cols: RGB)
SD_RGB_FACTORS = np.array([
    [0.298, 0.207, 0.208],
    [0.187, 0.286, 0.173],
    [-0.158, 0.189, 0.264],
    [-0.184, -0.271, -0.473],
], dtype=np.float32)


def latent_to_rgb_preview(latents, rgb_factors=None,
                          value_range: tuple[float, float] = (-1.0, 1.0)):
    """(B, h, w, C) scaled latents -> (B, h, w, 3) float in [-1, 1]."""
    latents = np.asarray(latents, np.float32)
    if rgb_factors is None:
        if latents.shape[-1] != 4:
            raise ValueError("built-in factors cover 4-channel latents; pass "
                             "rgb_factors for this latent space")
        rgb_factors = SD_RGB_FACTORS
    rgb = latents @ np.asarray(rgb_factors, np.float32)
    lo, hi = value_range
    return np.clip(rgb, lo, hi)
