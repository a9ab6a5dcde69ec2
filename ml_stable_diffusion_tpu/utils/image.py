"""Tensor <-> image conversion (TPU replacement for the reference's
CGImage+vImage.swift and pipeline.py numpy_to_pil helpers).

Framework-internal image tensors are NHWC float32.  Decoded images live in
[-1, 1] (reference CGImage+vImage.swift:23-65); model inputs for ControlNet /
img2img are mapped into a caller-chosen [min, max] range with alpha masking
(reference CGImage+vImage.swift:67-180, pipeline.py:717-722).
"""

from __future__ import annotations

import numpy as np

try:  # PIL is in the base image; gate anyway so compute paths import clean.
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def _require_pil():
    if Image is None:  # pragma: no cover
        raise ImportError("pillow is required for image IO")


def denormalize_to_uint8(x: np.ndarray) -> np.ndarray:
    """[-1,1] float NHWC -> uint8 NHWC (clamped).

    Uses the native C++ converter (native/image) when built — the serving
    analog of the reference's vImage conversion path."""
    x = np.asarray(x, dtype=np.float32)
    try:
        from .native_image import denormalize_to_uint8_native

        return denormalize_to_uint8_native(x)
    except OSError:
        return (np.clip(x / 2.0 + 0.5, 0.0, 1.0) * 255.0).round().astype(np.uint8)


def tensor_to_pil(x: np.ndarray) -> list:
    """NHWC float [-1,1] batch -> list of PIL RGB images."""
    _require_pil()
    u8 = denormalize_to_uint8(x)
    return [Image.fromarray(im) for im in u8]


def uint8_to_pil(x: np.ndarray) -> list:
    """NHWC uint8 batch -> list of PIL RGB images (the fused-postprocess
    decode path emits device-side uint8; see pipelines decode_latents)."""
    _require_pil()
    return [Image.fromarray(im) for im in np.asarray(x, np.uint8)]


def pil_to_tensor(images, size: tuple[int, int] | None = None,
                  value_range: tuple[float, float] = (-1.0, 1.0),
                  mask_alpha: bool = True) -> np.ndarray:
    """PIL image(s) -> NHWC float32 in [lo, hi].

    - ``size``: optional (H, W) LANCZOS resize (reference pipeline.py:719).
    - ``mask_alpha``: zero out fully transparent pixels, as the reference's
      ControlNet path does (CGImage+vImage.swift:137-180).
    """
    _require_pil()
    if not isinstance(images, (list, tuple)):
        images = [images]
    lo, hi = value_range
    out = []
    for im in images:
        if size is not None:
            im = im.resize((size[1], size[0]), Image.LANCZOS)
        rgba = np.asarray(im.convert("RGBA"), dtype=np.float32)
        rgb = rgba[..., :3] / 255.0
        if mask_alpha:
            alpha = rgba[..., 3:4] / 255.0
            rgb = rgb * (alpha > 0)
        out.append(rgb * (hi - lo) + lo)
    return np.stack(out, axis=0).astype(np.float32)


def nchw_to_nhwc(x: np.ndarray) -> np.ndarray:
    return np.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: np.ndarray) -> np.ndarray:
    return np.transpose(x, (0, 3, 1, 2))
