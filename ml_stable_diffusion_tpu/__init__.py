"""TPU-native Stable Diffusion framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of Apple's Core ML
Stable Diffusion stack (apple/ml-stable-diffusion), re-designed TPU-first:

- ``models/``     Flax modules: CLIP text encoders, UNet (SD/SDXL), VAE
                  (4-ch and 16-ch), ControlNet, MMDiT (SD3), T5 encoder,
                  safety checker.  NHWC layouts, bf16 compute.
- ``ops/``        Pallas TPU kernels + XLA compute paths: flash attention,
                  fused GroupNorm+SiLU, dequant-on-load palettized matmul.
- ``schedulers/`` Pure-JAX, `lax.scan`-compatible schedulers: DDIM, PNDM/PLMS,
                  DPM-Solver++(2M), Euler, EulerAncestral, LMS, DiscreteFlow.
- ``pipelines/``  SD 1.x/2.x, SDXL (+refiner), SD3 pipelines; txt2img/img2img,
                  CFG, ControlNet, safety checking — one jitted program per
                  generation (denoise loop is a single `lax.scan`).
- ``parallel/``   `jax.sharding.Mesh` + pjit/shard_map multi-chip scale-out.
- ``convert/``    Weight porting from HF-diffusers-layout checkpoints into
                  Flax pytrees (the TPU analog of torch2coreml.py).
- ``compress/``   k-means palettization, mixed-bit recipes, W8A8 activation
                  quantization (the TPU analog of the reference's
                  mixed_bit_compression_* / activation_quantization tooling).
- ``tokenizer/``  CLIP BPE + T5 tokenizers.
- ``utils/``      dtype policy, reproducible RNG sources, image conversion,
                  timers.
"""

from ._version import __version__

__all__ = ["__version__"]
