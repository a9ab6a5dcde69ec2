"""Conversion CLI: diffusers checkpoint -> TPU artifact bundle.

Flag surface modeled on the reference converter (torch2coreml.py parser_spec
:1603-1780): per-module convert switches, --quantize-nbits, bundling for the
generation CLI.  Where the reference traces+compiles to .mlpackage, this
ports weights into Flax pytrees and stores them as safetensors + manifests
(convert/artifacts.py).
"""

from __future__ import annotations

import argparse
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
    p.add_argument("--convert-all", action="store_true")
    p.add_argument("--quantize-nbits", type=int, default=None,
                   choices=[1, 2, 4, 6, 8],
                   help="palettize UNet weights (torch2coreml.py:1592)")
    p.add_argument("--custom-vae", default=None)
    p.add_argument("--bundle-resources-for-generation", action="store_true",
                   help="copy tokenizer files next to the artifacts "
                        "(reference bundle_resources_for_swift_cli)")
    p.add_argument("--convert-multilingual-projection", default=None,
                   metavar="TORCH_CKPT",
                   help="convert a user-trained multilingual projection "
                        "(torch Linear state dict; reference "
                        "multilingual_projection.py:15-45)")
    p.add_argument("--check-output-correctness", action="store_true",
                   help="reload each saved artifact and verify bit-equality "
                        "(the reference's conversion-time correctness gate, "
                        "torch2coreml.py:91-92)")
    return p


def run(args):
    import jax.numpy as jnp

    from ..compress import palettize_weights
    from ..convert import artifacts, load

    src = Path(args.checkpoint)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    all_ = args.convert_all

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
        import numpy as np

        from ..convert.artifacts import load_module

        loaded, _ = load_module(out, name=name)
        for (pa, va), (_, vb) in zip(
                jax.tree_util.tree_leaves_with_path(params),
                jax.tree_util.tree_leaves_with_path(loaded)):
            np.testing.assert_array_equal(
                np.asarray(va), vb, err_msg=jax.tree_util.keystr(pa))
        logger.info("%s artifact verified bit-exact", name)

    if (all_ or args.convert_text_encoder) and not exists("TextEncoder"):
        model, params = load.load_text_encoder(src / "text_encoder")
        artifacts.save_module(out, params, config=model.config,
                              name="TextEncoder")
        check("TextEncoder", params)
        logger.info("TextEncoder converted")
    if (all_ or args.convert_unet) and not exists("Unet"):
        model, params = load.load_unet(src / "unet", dtype=jnp.bfloat16)
        if args.quantize_nbits:
            params, stats = palettize_weights(params, args.quantize_nbits)
            logger.info("palettized UNet @%db: %.2fx smaller",
                        args.quantize_nbits,
                        stats["orig_bytes"] / max(stats["new_bytes"], 1))
        artifacts.save_module(out, params, config=model.config, name="Unet")
        check("Unet", params)
        logger.info("Unet converted")
    vae_dir = Path(args.custom_vae) if args.custom_vae else src / "vae"
    if (all_ or args.convert_vae_decoder) and not exists("VAEDecoder"):
        (dec, dec_params), _ = load.load_vae(vae_dir)
        artifacts.save_module(out, dec_params, config=dec.config,
                              name="VAEDecoder")
        logger.info("VAEDecoder converted")
    if (all_ or args.convert_vae_encoder) and not exists("VAEEncoder"):
        _, (enc, enc_params) = load.load_vae(vae_dir)
        artifacts.save_module(out, enc_params, config=enc.config,
                              name="VAEEncoder")
        logger.info("VAEEncoder converted")
    if args.convert_multilingual_projection:
        import torch

        from ..models.multilingual import port_multilingual_projection

        sd = torch.load(args.convert_multilingual_projection,
                        map_location="cpu", weights_only=True)
        params = port_multilingual_projection(sd)
        artifacts.save_module(out, params,
                              name="MultilingualTextEncoderProjection")
        logger.info("MultilingualTextEncoderProjection converted")
    if args.bundle_resources_for_generation:
        tok = src / "tokenizer"
        for f in ("vocab.json", "merges.txt"):
            if (tok / f).exists():
                shutil.copy(tok / f, out / f)
        logger.info("tokenizer resources bundled")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    run(parser_spec().parse_args(argv))


if __name__ == "__main__":
    main()
