"""Image generation CLI.

Flag parity with the reference's two generation CLIs: the Python pipeline
(pipeline.py:785-857) and the Swift StableDiffusionSample (main.swift:22-105).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

logger = logging.getLogger(__name__)


def parser_spec() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "sdtpu-generate", description="TPU-native Stable Diffusion generation")
    p.add_argument("prompt", nargs="?", default=None,
                   help="positional prompt (Swift CLI style)")
    p.add_argument("--prompt", dest="prompt_opt", default=None)
    p.add_argument("--negative-prompt", default="")
    p.add_argument("-i", "--checkpoint-path", required=True,
                   help="diffusers-layout checkpoint directory")
    p.add_argument("-o", "--output-path", default=".")
    p.add_argument("--seed", type=int, default=93)
    p.add_argument("--num-inference-steps", "--step-count", type=int,
                   default=50, dest="step_count")
    p.add_argument("--guidance-scale", type=float, default=7.5)
    p.add_argument("--image-count", type=int, default=1)
    p.add_argument("--scheduler", default="PNDM",
                   help="PNDM|DPMSolverMultistep|DDIM|Euler|EulerAncestral|LMS|DiscreteFlow|LCM")
    p.add_argument("--timestep-spacing", default=None,
                   help="linspace|leading|trailing|karras")
    p.add_argument("--timestep-shift", type=float, default=3.0)
    p.add_argument("--deepcache-interval", type=int, default=1,
                   help="run the full UNet only every Nth step, a shallow "
                        "cached pass between (1 = off/exact; 2-3 typical; "
                        "SD/SDXL only)")
    p.add_argument("--rng", default="jax",
                   choices=["jax", "numpy", "torch", "nvidia"])
    p.add_argument("--image", default=None, help="img2img input image path")
    p.add_argument("--mask", default=None, metavar="PATH",
                   help="inpainting mask image (white = repaint, black = "
                        "keep --image content); requires --image. Works "
                        "with any model (legacy latent blending) and with "
                        "9-channel inpainting UNet checkpoints")
    p.add_argument("--strength", type=float, default=1.0)
    p.add_argument("--size", default="512x512", help="HxW output size")
    p.add_argument("--controlnet-inputs", nargs="*", default=[],
                   help="conditioning image paths, one per loaded controlnet")
    p.add_argument("--disable-safety", action="store_true")
    p.add_argument("--unet-batch-one", action="store_true")
    p.add_argument("--attention-implementation", default="auto",
                   choices=["auto", "xla", "flash"])
    p.add_argument("--fuse-qkv", action="store_true",
                   help="serve-time fused qkv projections for self-attention")
    p.add_argument("--refiner-start", type=float, default=0.8)
    p.add_argument("--custom-vae", default=None)
    p.add_argument("--controlnet", nargs="*", default=[],
                   help="ControlNet checkpoint directories (reference "
                        "--controlnet, main.swift:69)")
    p.add_argument("--save-every", type=int, default=0,
                   help="save intermediate images every N steps (main.swift:57)")
    p.add_argument("--compute-units", "--device", dest="device", default=None,
                   help="TPU analog of the reference's --compute-units "
                        "(main.swift:335-345): jax platform or "
                        "'platform:index', e.g. tpu, tpu:0, cpu")
    p.add_argument("--multilingual", action="store_true",
                   help="use a MultilingualTextEncoderProjection artifact "
                        "instead of the CLIP text encoder (reference "
                        "--multilingual, main.swift:96-105 / "
                        "Resources.swift:73-88)")
    p.add_argument("--multilingual-projection", default=None, metavar="DIR",
                   help="directory with MultilingualTextEncoderProjection."
                        "safetensors (default: the checkpoint directory)")
    p.add_argument("--multilingual-embedder", default=None,
                   metavar="MODULE:FUNC",
                   help="python entrypoint fn(text, script)->(S,512) playing "
                        "NLContextualEmbedding's role (the reference uses the "
                        "OS-provided model, MultilingualTextEncoder.swift:36)")
    p.add_argument("--script", default="latin",
                   help="writing-script hint passed to the embedder "
                        "(reference Script enum, MultilingualTextEncoder."
                        "swift:181-194)")
    p.add_argument("--lora", action="append", default=[], metavar="PATH[:SCALE]",
                   help="merge a LoRA adapter (.safetensors, kohya or "
                        "diffusers-PEFT format) at the given strength; "
                        "repeatable — adapters stack (beyond the reference)")
    p.add_argument("--textual-inversion", action="append", default=[],
                   metavar="PATH[:TOKEN]",
                   help="load a textual-inversion embedding (.pt or "
                        ".safetensors) under the given placeholder token "
                        "(defaults to the file's name); repeatable "
                        "(beyond the reference)")
    p.add_argument("--ip-adapter", default=None, metavar="PATH",
                   help="IP-Adapter checkpoint (.safetensors/.bin, base "
                        "projection variant); requires --ip-image-encoder "
                        "and --ip-adapter-image (beyond the reference)")
    p.add_argument("--ip-image-encoder", default=None, metavar="DIR",
                   help="CLIPVisionModelWithProjection checkpoint dir "
                        "(the adapter's paired image encoder)")
    p.add_argument("--ip-adapter-image", default=None, metavar="PATH",
                   help="reference image for IP-Adapter conditioning")
    p.add_argument("--ip-adapter-scale", type=float, default=1.0)
    p.add_argument("--w8a8", action="store_true",
                   help="serve the UNet's large Dense+Conv layers as int8 "
                        "MXU ops (the reference's W8A8 deployment path, "
                        "activation_quantization.py)")
    p.add_argument("--w8a8-scales", default=None, metavar="JSON",
                   help="calibrated activation scales {module_path: absmax} "
                        "from compress.w8a8.capture_activation_scales "
                        "(default: uniform constant scales)")
    p.add_argument("--reduce-memory", action="store_true",
                   help="load each model's weights to HBM just-in-time and "
                        "free them after use (reference --reduce-memory, "
                        "main.swift:94 / StableDiffusionPipeline.swift:"
                        "169-200); generation runs as per-stage programs")
    p.add_argument("--use-denoised-intermediates", action="store_true",
                   help="--save-every previews decode predicted-x0 instead "
                        "of raw noisy latents (Configuration.swift:44)")
    p.add_argument("--mesh", default=None, metavar="SPEC",
                   help="shard the pipeline across the visible chips and run "
                        "the full generation program under GSPMD (TPU-native "
                        "multi-chip extension, SURVEY.md §2.4). SPEC is "
                        "'tp=N' or 'dp=D,tp=T'; e.g. --mesh tp=4")
    return p


def _parse_mesh(spec: str):
    """'tp=N' / 'dp=D,tp=T' -> jax.sharding.Mesh over the visible devices."""
    from ..parallel import make_mesh

    kv = dict(part.split("=") for part in spec.split(","))
    dp = int(kv.get("dp", 1))
    tp = int(kv.get("tp", 1))
    return make_mesh(dp * tp, dp=dp, tp=tp)


def _load_embedder(spec: str, script: str):
    """'module:function' -> embed_fn(text)->(S,512), with the script hint
    bound (reference --script, main.swift:96-105)."""
    import functools
    import importlib

    mod_name, _, fn_name = spec.partition(":")
    fn = getattr(importlib.import_module(mod_name), fn_name)
    return functools.partial(fn, script=script)


def run(args) -> list:
    import jax
    import jax.numpy as jnp

    from ..convert.load import load_pipeline
    from ..pipelines.config import PipelineConfiguration
    from ..utils.image import pil_to_tensor

    if getattr(args, "device", None):
        plat, _, idx = args.device.partition(":")
        jax.config.update("jax_default_device",
                          jax.devices(plat)[int(idx or 0)])

    prompt = args.prompt_opt or args.prompt or ""
    h, w = (int(x) for x in args.size.split("x"))

    multilingual = None
    if args.multilingual:
        from ..convert.artifacts import load_module
        from ..models.multilingual import MultilingualProjection

        if not args.multilingual_embedder:
            raise SystemExit(
                "--multilingual needs --multilingual-embedder MODULE:FUNC "
                "(an external fn(text, script)->(S,512) embedding model; "
                "the reference uses the OS NLContextualEmbedding service)")
        proj_dir = Path(args.multilingual_projection or args.checkpoint_path)
        params, _ = load_module(proj_dir,
                                name="MultilingualTextEncoderProjection")
        hidden = params["linear"]["kernel"].shape[1]
        embed_fn = _load_embedder(args.multilingual_embedder, args.script)
        multilingual = (MultilingualProjection(hidden_size=hidden), params,
                        embed_fn)

    mesh = _parse_mesh(args.mesh) if args.mesh else None
    pipe = load_pipeline(args.checkpoint_path, custom_vae_dir=args.custom_vae,
                         controlnet_dirs=args.controlnet,
                         fuse_qkv=args.fuse_qkv,
                         multilingual_encoder=multilingual, mesh=mesh)
    if args.ip_adapter:
        if not (args.ip_image_encoder and args.ip_adapter_image):
            raise SystemExit("--ip-adapter requires --ip-image-encoder and "
                             "--ip-adapter-image")
        pipe.load_ip_adapter(args.ip_adapter, args.ip_image_encoder)
    for spec in args.textual_inversion:
        # PATH[:TOKEN] — don't split Windows drive letters or paths whose
        # colon tail still contains separators (mirrors the --lora parser)
        head, sep, tail = spec.rpartition(":")
        path, tok = spec, ""
        if sep and len(head) > 1 and "/" not in tail and "\\" not in tail:
            path, tok = head, tail
        pipe.load_textual_inversion(path, token=tok or None)
    for spec in args.lora:
        # PATH[:SCALE] — the scale suffix must parse as a float (Windows
        # drive letters don't)
        path, scale = spec, 1.0
        if ":" in spec:
            head, _, tail = spec.rpartition(":")
            try:
                scale = float(tail)
                path = head
            except ValueError:
                pass
        pipe.apply_lora(path, scale=scale)
    if args.w8a8:
        import json as _json

        scales, extra_kw = None, {}
        if args.w8a8_scales:
            data = _json.loads(Path(args.w8a8_scales).read_text())
            if "act_scales" in data:
                # w8a8-analyze recipe: calibrated scales + skip list of
                # layers that failed the reference's 40/30 dB class gates
                from ..compress.w8a8 import DEFAULT_SKIP_PATTERNS

                scales = data["act_scales"]
                extra_kw["skip_patterns"] = (tuple(DEFAULT_SKIP_PATTERNS)
                                             + tuple(data.get("skip", ())))
            else:  # flat {module_path: absmax} from w8a8-calibrate
                scales = data
        pipe.enable_w8a8(scales, **extra_kw)
    if args.reduce_memory:
        pipe.offload_params_to_host()

    starting_image = None
    if args.image:
        from PIL import Image

        starting_image = pil_to_tensor(Image.open(args.image), size=(h, w))

    ip_adapter_image = None
    if args.ip_adapter_image:
        if pipe.ip_image_encoder is None:
            raise SystemExit("--ip-adapter-image requires --ip-adapter "
                             "(and --ip-image-encoder)")
        from PIL import Image

        S = pipe.ip_image_encoder[0].config.image_size
        ip_adapter_image = pil_to_tensor(Image.open(args.ip_adapter_image),
                                         size=(S, S), value_range=(0.0, 1.0))

    mask_image = None
    if args.mask:
        from PIL import Image

        mask_image = pil_to_tensor(Image.open(args.mask).convert("L"),
                                   size=(h, w), value_range=(0.0, 1.0))

    controlnet_inputs = []
    for path in args.controlnet_inputs:
        from PIL import Image

        controlnet_inputs.append(
            pil_to_tensor(Image.open(path), size=(h, w), value_range=(0, 1)))

    cfg = PipelineConfiguration(
        prompt=prompt, negative_prompt=args.negative_prompt,
        starting_image=starting_image, mask_image=mask_image,
        ip_adapter_image=ip_adapter_image,
        ip_adapter_scale=args.ip_adapter_scale,
        strength=args.strength,
        image_count=args.image_count, step_count=args.step_count,
        seed=args.seed, guidance_scale=args.guidance_scale,
        refiner_start=args.refiner_start,
        controlnet_inputs=controlnet_inputs,
        disable_safety=args.disable_safety,
        scheduler=args.scheduler, timestep_spacing=args.timestep_spacing,
        timestep_shift=args.timestep_shift, rng=args.rng,
        unet_batch_one=args.unet_batch_one,
        use_denoised_intermediates=args.use_denoised_intermediates,
        reduce_memory=args.reduce_memory,
        attention_implementation=args.attention_implementation,
        deepcache_interval=args.deepcache_interval)

    out_dir = Path(args.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)

    handler = None
    if args.save_every > 0:
        def handler(progress):
            if progress.step % args.save_every == 0:
                for i, im in enumerate(progress.current_images):
                    im.save(out_dir / _name(prompt, args.seed, i,
                                            step=progress.step))
            return True

    result = pipe.generate_images(cfg, progress_handler=handler,
                                  image_hw=(h, w))
    paths = []
    for i, im in enumerate(result.images):
        path = out_dir / _name(prompt, args.seed, i)
        im.save(path)
        paths.append(path)
        if result.nsfw_flags[i]:
            logger.warning("image %d flagged by safety checker", i)
    logger.info("%.3f s/step; saved %s", result.seconds_per_step,
                [str(p) for p in paths])
    return paths


def _name(prompt: str, seed: int, idx: int, step: int | None = None) -> str:
    """<prompt-slug>.<seed>.<idx>[.step].png (reference image naming,
    main.swift:301-321 / pipeline.py get_image_path :700)."""
    slug = "_".join(prompt.split())[:50] or "image"
    parts = [slug, str(seed), str(idx)]
    if step is not None:
        parts.append(f"step{step}")
    return ".".join(parts) + ".png"


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    run(parser_spec().parse_args(argv))


if __name__ == "__main__":
    main()
