"""Conversion CLI: diffusers checkpoint -> TPU artifact bundle.

Flag surface modeled on the reference converter (torch2coreml.py parser_spec
:1603-1780): per-module convert switches across every family (SD / SDXL +
refiner / SD3), ControlNet and safety-checker conversion, --quantize-nbits,
bundling for the generation CLI.  Where the reference traces+compiles to
.mlpackage, this ports weights into Flax pytrees stored as safetensors +
manifests (convert/artifacts.py); palettized weights are stored bit-packed
(indices+LUT) and served compressed (the ANE decompress-on-execute analog,
reference README.md:165).
"""

from __future__ import annotations

import argparse
import json
import logging
import shutil
from pathlib import Path

logger = logging.getLogger(__name__)


def parser_spec():
    p = argparse.ArgumentParser("sdtpu-convert")
    p.add_argument("--model-version", "-i", dest="checkpoint", required=True,
                   help="diffusers-layout checkpoint directory")
    p.add_argument("-o", "--output-dir", required=True)
    p.add_argument("--convert-unet", action="store_true")
    p.add_argument("--convert-text-encoder", action="store_true")
    p.add_argument("--convert-vae-decoder", action="store_true")
    p.add_argument("--convert-vae-encoder", action="store_true")
    p.add_argument("--convert-safety-checker", action="store_true",
                   help="reference torch2coreml.py:1119 convert_safety_checker")
    p.add_argument("--convert-mmdit", action="store_true",
                   help="SD3 transformer (reference convert_mmdit :1053)")
    p.add_argument("--convert-t5", action="store_true",
                   help="SD3 text_encoder_3 (reference _download_t5_model :251)")
    p.add_argument("--convert-controlnet", nargs="+", default=(),
                   metavar="DIR",
                   help="diffusers ControlNet checkpoint dirs (reference "
                        "convert_controlnet torch2coreml.py:1317)")
    p.add_argument("--refiner-version", default=None, metavar="DIR",
                   help="SDXL refiner checkpoint dir; converts its UNet as "
                        "RefinerUnet (torch2coreml.py:1574-1585)")
    p.add_argument("--convert-all", action="store_true",
                   help="convert every module the checkpoint's family needs")
    p.add_argument("--quantize-nbits", type=int, default=None,
                   choices=[1, 2, 4, 6, 8],
                   help="palettize UNet/MMDiT weights; artifacts store packed "
                        "indices+LUT and serve compressed (torch2coreml.py:1592)")
    p.add_argument("--palettize-min-size", type=int, default=None,
                   help="min tensor elements to palettize (default 1e5, "
                        "reference PALETTIZE_MIN_SIZE pre_analysis.py:31)")
    p.add_argument("--custom-vae", default=None)
    p.add_argument("--bundle-resources-for-generation", action="store_true",
                   help="copy tokenizer files + scheduler config next to the "
                        "artifacts and write bundle.json (reference "
                        "bundle_resources_for_swift_cli)")
    p.add_argument("--convert-multilingual-projection", default=None,
                   metavar="TORCH_CKPT",
                   help="convert a user-trained multilingual projection "
                        "(torch Linear state dict; reference "
                        "multilingual_projection.py:15-45)")
    p.add_argument("--check-output-correctness", action="store_true",
                   help="reload each saved artifact and verify equality "
                        "(the reference's conversion-time correctness gate, "
                        "torch2coreml.py:91-92)")
    return p


def _family(src: Path) -> str:
    index = src / "model_index.json"
    if index.exists():
        return json.loads(index.read_text()).get("_class_name",
                                                 "StableDiffusionPipeline")
    return "StableDiffusionPipeline"


def run(args):
    import numpy as np
    import jax.numpy as jnp

    from ..compress.palettize import palettize_tree
    from ..convert import artifacts, load

    src = Path(args.checkpoint)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    all_ = args.convert_all
    family = _family(src)
    is_xl = "XL" in family
    is_sd3 = "StableDiffusion3" in family

    def exists(name):
        # idempotent conversion: skip-if-exists (torch2coreml.py:113-126)
        if (out / f"{name}.safetensors").exists():
            logger.info("%s exists, skipping", name)
            return True
        return False

    def check(name, params):
        if not args.check_output_correctness:
            return
        import jax

        from ..compress.palettize import PalettizedTensor

        def as_dense(x):
            return (x.dequantize() if isinstance(x, PalettizedTensor)
                    else np.asarray(x))

        loaded, _ = artifacts.load_module(out, name=name)
        is_leaf = lambda x: isinstance(x, PalettizedTensor)  # noqa: E731
        for (pa, va), (_, vb) in zip(
                jax.tree_util.tree_leaves_with_path(params, is_leaf=is_leaf),
                jax.tree_util.tree_leaves_with_path(loaded)):
            np.testing.assert_array_equal(
                as_dense(va), vb, err_msg=jax.tree_util.keystr(pa))
        logger.info("%s artifact verified", name)

    def save(name, params, config=None):
        artifacts.save_module(out, params, config=config, name=name)
        check(name, params)
        logger.info("%s converted", name)

    def parity(kind, module_dir, model, params):
        """Reference-style conversion gate (torch2coreml.py:80-97): every
        converted model is executed against a torch reference and gated at
        >= 35 dB — transformers models directly from the checkpoint, the
        UNet/VAE/ControlNet/MMDiT via the independent mirror forwards
        (convert/torch_mirrors.py), exactly the reference's own UNet check
        (torch2coreml.py:970-975).  Falls back to the structural
        element-count match if torch is unavailable."""
        if not args.check_output_correctness:
            return
        from ..convert import verify

        if kind == "clip":
            verify.torch_parity_text_encoder(module_dir, model, params)
            return
        if kind == "t5":
            verify.torch_parity_t5(module_dir, model, params)
            return
        if kind == "safety":
            verify.torch_parity_safety(module_dir, model, params)
            return

        sd = load.load_safetensors_state_dict(module_dir)
        verify.element_count_matches(sd, params, str(module_dir))
        try:
            import torch  # noqa: F401
        except ImportError:
            logger.warning("%s: torch unavailable — numerical mirror gate "
                           "skipped (element count only)", module_dir)
            return
        label = Path(module_dir).name
        # gate the PORT in fp32 (bf16 serving is a deliberate precision
        # choice, not a porting error)
        if kind == "unet":
            m32, p32 = load.load_unet(module_dir, dtype=jnp.float32)
            verify.torch_parity_unet(sd, m32, p32, label=label)
        elif kind == "mmdit":
            m32, p32 = load.load_mmdit(module_dir, dtype=jnp.float32)
            verify.torch_parity_mmdit(sd, m32, p32, label=label)
        elif kind == "controlnet":
            m32, p32 = load.load_controlnet(module_dir, dtype=jnp.float32)
            if type(m32).__name__ == "SD3ControlNetModel":
                verify.torch_parity_sd3_controlnet(sd, m32, p32, label=label)
            else:
                verify.torch_parity_controlnet(sd, m32, p32, label=label)

    def quantized(params):
        """Palettize eligible kernels -> tree with PalettizedTensor leaves
        (stored compressed; honest on-disk size is logged after save)."""
        kwargs = {}
        if args.palettize_min_size is not None:
            kwargs["min_size"] = args.palettize_min_size
        tree, stats = palettize_tree(params, args.quantize_nbits, **kwargs)
        logger.info("palettized @%db: %d tensors, payload %.2fx smaller "
                    "(%.1f MB -> %.1f MB)",
                    args.quantize_nbits, stats["palettized"],
                    stats["orig_bytes"] / max(stats["new_bytes"], 1),
                    stats["orig_bytes"] / 2**20, stats["new_bytes"] / 2**20)
        return tree

    # -- text encoders ----------------------------------------------------------
    # --quantize-nbits palettizes the text encoders too, like the reference
    # (torch2coreml.py:185-204 palettizes text_encoder/text_encoder_2/unet/
    # refiner/controlnets); artifacts dequantize at load (install-mode
    # serving — the measured-fast design, pipelines/sd.py install_palettized)
    if (all_ or args.convert_text_encoder) and not exists("TextEncoder"):
        if (src / "text_encoder").exists():
            model, params = load.load_text_encoder(
                src / "text_encoder", with_projection=True if is_sd3 else None)
            parity("clip", src / "text_encoder", model, params)
            if args.quantize_nbits:
                params = quantized(params)
            save("TextEncoder", params, model.config)
        else:
            logger.info("no text_encoder/ in checkpoint (refiner-only XL)")
    if ((all_ and (is_xl or is_sd3)) or args.convert_text_encoder) \
            and (src / "text_encoder_2").exists() and not exists("TextEncoder2"):
        model, params = load.load_text_encoder(src / "text_encoder_2",
                                               with_projection=True)
        parity("clip", src / "text_encoder_2", model, params)
        if args.quantize_nbits:
            params = quantized(params)
        save("TextEncoder2", params, model.config)
    if ((all_ and is_sd3) or args.convert_t5) \
            and (src / "text_encoder_3").exists() and not exists("TextEncoderT5"):
        model, params = load.load_t5(src / "text_encoder_3")
        if args.check_output_correctness:
            # gate the PORT in fp32 (the bf16 serving cast is a deliberate
            # precision choice, not a porting error)
            parity("t5", src / "text_encoder_3",
                   *load.load_t5(src / "text_encoder_3", dtype=jnp.float32))
        save("TextEncoderT5", params, model.config)

    # -- denoiser ---------------------------------------------------------------
    if is_sd3:
        if (all_ or args.convert_mmdit) and not exists("MMDiT"):
            model, params = load.load_mmdit(src / "transformer")
            parity("mmdit", src / "transformer", model, params)
            if args.quantize_nbits:
                params = quantized(params)
            save("MMDiT", params, model.config)
    else:
        if (all_ or args.convert_unet) and not exists("Unet"):
            model, params = load.load_unet(src / "unet", dtype=jnp.bfloat16)
            parity("unet", src / "unet", model, params)
            if args.quantize_nbits:
                params = quantized(params)
            save("Unet", params, model.config)
    if args.refiner_version and not exists("RefinerUnet"):
        model, params = load.load_unet(Path(args.refiner_version) / "unet",
                                       dtype=jnp.bfloat16)
        parity("unet", Path(args.refiner_version) / "unet", model, params)
        if args.quantize_nbits:
            params = quantized(params)
        save("RefinerUnet", params, model.config)

    # -- VAE ----------------------------------------------------------------------
    vae_dir = Path(args.custom_vae) if args.custom_vae else src / "vae"
    if (all_ or args.convert_vae_decoder) and not exists("VAEDecoder"):
        (dec, dec_params), _ = load.load_vae(vae_dir)
        save("VAEDecoder", dec_params, dec.config)
    if (all_ or args.convert_vae_encoder) and not exists("VAEEncoder"):
        _, (enc, enc_params) = load.load_vae(vae_dir)
        save("VAEEncoder", enc_params, enc.config)
    if args.check_output_correctness and (all_ or args.convert_vae_decoder
                                          or args.convert_vae_encoder):
        from ..convert import verify

        (dec, dec_params), (enc, enc_params) = load.load_vae(
            vae_dir, dtype=jnp.float32)
        sd = load.load_safetensors_state_dict(vae_dir)
        dec_n = verify._tree_element_count(dec_params)
        enc_n = verify._tree_element_count(enc_params)
        src_n = sum(int(np.prod(tuple(v.shape))) for v in sd.values())
        if dec_n + enc_n != src_n:
            raise AssertionError(
                f"VAE port element count {dec_n}+{enc_n} != source {src_n}")
        logger.info("VAE: element count matches source (%d)", src_n)
        try:
            import torch  # noqa: F401
        except ImportError:
            logger.warning("VAE: torch unavailable — mirror gate skipped")
        else:
            verify.torch_parity_vae_decoder(sd, dec, dec_params,
                                            label=vae_dir.name)
            verify.torch_parity_vae_encoder(sd, enc, enc_params,
                                            label=vae_dir.name)

    # -- safety checker -------------------------------------------------------------
    if (all_ or args.convert_safety_checker) \
            and (src / "safety_checker" / "config.json").exists() \
            and not exists("SafetyChecker"):
        model, params = load.load_safety_checker(src / "safety_checker")
        parity("safety", src / "safety_checker", model, params)
        save("SafetyChecker", params, model.config)

    # -- controlnets ------------------------------------------------------------------
    for cn_dir in args.convert_controlnet:
        cn_dir = Path(cn_dir)
        name = f"ControlNet-{cn_dir.name}"
        if exists(name):
            continue
        model, params = load.load_controlnet(cn_dir)
        parity("controlnet", cn_dir, model, params)
        if args.quantize_nbits:
            params = quantized(params)
        save(name, params, model.config)

    if args.convert_multilingual_projection:
        import torch

        from ..models.multilingual import port_multilingual_projection

        sd = torch.load(args.convert_multilingual_projection,
                        map_location="cpu", weights_only=True)
        params = port_multilingual_projection(sd)
        artifacts.save_module(out, params,
                              name="MultilingualTextEncoderProjection")
        logger.info("MultilingualTextEncoderProjection converted")

    # -- bundle -----------------------------------------------------------------------
    if args.bundle_resources_for_generation:
        for tok_name, dest in (("tokenizer", out), ("tokenizer_2",
                                                    out / "tokenizer_2")):
            tok = src / tok_name
            if not tok.exists():
                continue
            dest.mkdir(parents=True, exist_ok=True)
            for f in ("vocab.json", "merges.txt"):
                if (tok / f).exists():
                    shutil.copy(tok / f, dest / f)
        if (src / "tokenizer_3" / "tokenizer.json").exists():
            (out / "tokenizer_3").mkdir(exist_ok=True)
            shutil.copy(src / "tokenizer_3" / "tokenizer.json",
                        out / "tokenizer_3" / "tokenizer.json")
        index_file = src / "model_index.json"
        index = (json.loads(index_file.read_text())
                 if index_file.exists() else {})
        sched_file = src / "scheduler" / "scheduler_config.json"
        bundle = {
            "family": family,
            "scheduler": (json.loads(sched_file.read_text())
                          if sched_file.exists() else None),
            "force_zeros_for_empty_prompt": index.get(
                "force_zeros_for_empty_prompt", True),
            "controlnets": [f"ControlNet-{Path(d).name}"
                            for d in args.convert_controlnet],
        }
        (out / "bundle.json").write_text(json.dumps(bundle, indent=1))
        logger.info("resources bundled (bundle.json, tokenizers, scheduler)")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    run(parser_spec().parse_args(argv))


if __name__ == "__main__":
    main()
