"""Compression CLI: palettize / MBP analysis / MBP apply.

Maps the reference's three compression tools onto subcommands:
- ``palettize``: global k-means palettization (torch2coreml quantize_weights)
- ``mbp-analyze``: per-layer sensitivity sweeps -> JSON
  (mixed_bit_compression_pre_analysis.py)
- ``mbp-apply``: recipe JSON -> compressed artifacts
  (mixed_bit_compression_apply.py)
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

logger = logging.getLogger(__name__)


def parser_spec():
    p = argparse.ArgumentParser("sdtpu-compress")
    sub = p.add_subparsers(dest="cmd", required=True)

    pal = sub.add_parser("palettize")
    pal.add_argument("-i", "--checkpoint", required=True)
    pal.add_argument("-o", "--output-dir", required=True)
    pal.add_argument("--nbits", type=int, required=True, choices=[1, 2, 4, 6, 8])

    ana = sub.add_parser("mbp-analyze")
    ana.add_argument("-i", "--checkpoint", required=True)
    ana.add_argument("-o", "--output-json", required=True)
    ana.add_argument("--prompt", default="a photo of an astronaut riding a horse on mars")
    ana.add_argument("--nbits", type=int, nargs="*", default=[1, 2, 4, 6, 8])
    ana.add_argument("--cumulative", action="store_true")
    ana.add_argument("--size", default="512x512")

    build = sub.add_parser("mbp-build-recipe")
    build.add_argument("-i", "--analysis-json", required=True)
    build.add_argument("-o", "--output-json", required=True)
    build.add_argument("--psnr-threshold", type=float, default=40.0)

    app = sub.add_parser("mbp-apply")
    app.add_argument("-i", "--checkpoint", required=True)
    app.add_argument("--recipe", required=True)
    app.add_argument("-o", "--output-dir", required=True)
    return p


def _load_unet(checkpoint):
    import jax.numpy as jnp

    from ..convert import load

    return load.load_unet(Path(checkpoint) / "unet", dtype=jnp.float32)


def run(args):
    from ..compress import (
        benchmark_signal_integrity,
        build_recipe,
        palettize_tree,
    )
    from ..compress.mixed_bit import apply_recipe_palettized
    from ..convert import artifacts

    if args.cmd == "palettize":
        model, params = _load_unet(args.checkpoint)
        params, stats = palettize_tree(params, args.nbits)
        artifacts.save_module(Path(args.output_dir), params,
                              config=model.config, name="Unet")
        logger.info("palettized (stored compressed): %s", stats)

    elif args.cmd == "mbp-analyze":
        model, params = _load_unet(args.checkpoint)
        run_fn = _one_step_runner(model, args)
        benchmark_signal_integrity(run_fn, params,
                                   nbits_list=tuple(args.nbits),
                                   cumulative=args.cumulative,
                                   out_json=args.output_json)
        logger.info("analysis written to %s", args.output_json)

    elif args.cmd == "mbp-build-recipe":
        analysis = json.loads(Path(args.analysis_json).read_text())
        recipe = build_recipe(analysis["single_layer"], args.psnr_threshold)
        Path(args.output_json).write_text(json.dumps(recipe, indent=1))
        logger.info("recipe written to %s", args.output_json)

    elif args.cmd == "mbp-apply":
        model, params = _load_unet(args.checkpoint)
        recipe = json.loads(Path(args.recipe).read_text())
        params = apply_recipe_palettized(params, recipe)
        artifacts.save_module(Path(args.output_dir), params,
                              config=model.config, name="Unet")
        logger.info("recipe applied (stored compressed) -> %s",
                    args.output_dir)


def _one_step_runner(model, args):
    """1-step denoise latent output, the reference's signal-integrity probe
    (pre_analysis.py run_pipe :248: single step, fixed latents)."""
    import jax
    import jax.numpy as jnp

    h, w = (int(x) // 8 for x in args.size.split("x"))
    cfg = model.config
    latents = jax.random.normal(jax.random.key(0), (1, h, w, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(1),
                            (1, 77, cfg.cross_attention_dim))

    @jax.jit
    def forward(p):
        return model.apply({"params": p}, latents,
                           jnp.asarray([500.0]), ctx)

    return lambda p: forward(p)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    run(parser_spec().parse_args(argv))


if __name__ == "__main__":
    main()
