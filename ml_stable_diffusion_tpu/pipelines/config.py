"""Public generation configuration.

Field-for-field parity with the reference's de-facto public config API
(StableDiffusionPipeline.Configuration.swift:15-89) plus the Python CLI's
extra knobs (pipeline.py:785-857), adapted to TPU idioms where noted.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence


@dataclasses.dataclass
class PipelineConfiguration:
    #: one prompt for all image_count images (reference semantics), or a
    #: list of image_count prompts — batched serving of independent
    #: requests in one program (beyond the reference, which rejects
    #: batch>1 prompts, pipeline.py:434-438)
    prompt: str | Sequence[str] = ""
    negative_prompt: str | Sequence[str] = ""

    #: img2img input: PIL image or NHWC float array in [-1, 1]
    starting_image: Any | None = None
    strength: float = 1.0
    #: inpainting mask (beyond the reference): PIL image or (H, W[, 1])
    #: float array in [0, 1]; 1 = repaint, 0 = keep ``starting_image``.
    #: With a standard 4-channel UNet this runs legacy latent-blend
    #: inpainting (known region re-noised to each step's level inside the
    #: scan); with a 9-channel inpainting UNet checkpoint the mask +
    #: masked-image latents are concatenated as model inputs.
    mask_image: Any | None = None

    image_count: int = 1
    step_count: int = 50
    #: one seed (the batch shares one stream, reference semantics) or a
    #: list of image_count seeds — each image reproduces its own seed's
    #: stream (per-request seeds under batched serving)
    seed: int | Sequence[int] = 0
    guidance_scale: float = 7.5

    #: SDXL ensemble-of-denoisers handoff point (0..1 fraction of steps)
    refiner_start: float = 0.8

    #: per-ControlNet conditioning images (PIL or NHWC arrays)
    controlnet_inputs: Sequence[Any] = ()

    #: IP-Adapter reference image (beyond the reference): PIL image or
    #: (H, W, 3) array in [0, 1]; requires ``pipe.load_ip_adapter(...)``
    ip_adapter_image: Any | None = None
    #: weight of the image tokens' decoupled cross-attention
    ip_adapter_scale: float = 1.0

    disable_safety: bool = False
    #: reference reduceMemory (StableDiffusionPipeline.swift:94,169-200,
    #: main.swift --reduce-memory): models load just-in-time and unload
    #: after use.  TPU analog: generation runs as per-stage programs
    #: (encode / each denoise phase / decode) whose weights are transferred
    #: from host RAM per call, so peak HBM holds one stage's weights +
    #: activations rather than every model at once.  Pair with
    #: ``pipeline.offload_params_to_host()``.
    reduce_memory: bool = False
    #: progress callback sees decoded (denoised-x0) previews instead of raw
    #: noisy latents (reference useDenoisedIntermediates)
    use_denoised_intermediates: bool = False

    #: scheduler key from schedulers.SCHEDULER_MAP
    scheduler: str = "PNDM"
    #: "linspace" | "leading" | "trailing" | "karras"
    timestep_spacing: str | None = None
    #: rectified-flow shift (SD3; reference --timestep-shift)
    timestep_shift: float = 3.0

    #: "jax" (native, fastest) | "numpy" | "torch" | "nvidia" (bit-parity
    #: with the reference's --rng flag, main.swift:48)
    rng: str = "jax"

    #: serial batch-1 CFG parity mode (reference --unet-batch-one,
    #: torch2coreml.py:825-826, pipeline.py:540-557)
    unet_batch_one: bool = False

    #: "auto" | "xla" | "flash" — TPU analog of the reference's
    #: --attention-implementation {ORIGINAL, SPLIT_EINSUM[_V2]} switch
    attention_implementation: str = "auto"

    #: DeepCache-style serving acceleration (beyond the reference; arXiv
    #: 2312.03209/2312.09608 family): run the FULL UNet only every Nth
    #: denoise step and a shallow pass (conv_in + top down block + last up
    #: block) between, reusing the cached deep trunk feature.  Compiled as
    #: a ``lax.cond`` inside the one-program scan (both branches traced
    #: once; the cache lives in the scan carry, never leaving the device).
    #: 1 = off (exact); 2-3 = typical quality/speed tradeoff.  UNet
    #: families only (SD/SDXL); incompatible with ``unet_batch_one`` and
    #: the per-step progress-callback path.
    deepcache_interval: int = 1

    #: latent scale/shift; None -> per-family defaults (main.swift:119-139)
    encoder_scale_factor: float | None = None
    decoder_scale_factor: float | None = None
    decoder_shift_factor: float | None = None

    # SDXL micro-conditioning (StableDiffusionXLPipeline.swift:315-363)
    original_size: tuple[int, int] | None = None
    crops_coords_top_left: tuple[int, int] = (0, 0)
    target_size: tuple[int, int] | None = None
    aesthetic_score: float = 6.0
    negative_aesthetic_score: float = 2.5

    def validate(self):
        if not (0.0 < self.strength <= 1.0):
            raise ValueError("strength must be in (0, 1]")
        if self.step_count < 1:
            raise ValueError("step_count must be >= 1")
        if self.image_count < 1:
            raise ValueError("image_count must be >= 1")
        if self.deepcache_interval < 1:
            raise ValueError("deepcache_interval must be >= 1")
