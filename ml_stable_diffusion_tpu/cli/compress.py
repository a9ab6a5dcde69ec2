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
    ana.add_argument("--probe-prompts", type=int, default=8,
                     help="number of fixed probe prompts (reference uses 8, "
                          "pre_analysis.py:34-45)")

    build = sub.add_parser("mbp-build-recipe")
    build.add_argument("-i", "--analysis-json", required=True)
    build.add_argument("-o", "--output-json", required=True)
    build.add_argument("--psnr-threshold", type=float, default=40.0)

    rep = sub.add_parser("mbp-report",
                         help="size/quality tradeoff table from an analysis "
                              "(the reference's PSNR-vs-size plot, "
                              "pre_analysis.py:501-507, as markdown)")
    rep.add_argument("-i", "--analysis-json", required=True)
    rep.add_argument("--checkpoint", required=True)
    rep.add_argument("-o", "--output-md", required=True)
    rep.add_argument("--output-json", default=None,
                     help="also emit the (avg_bits, size_MB, est_psnr) "
                          "series as JSON (the reference plot's raw data)")
    rep.add_argument("--psnr-thresholds", type=float, nargs="*",
                     default=[35.0, 40.0, 45.0])

    app = sub.add_parser("mbp-apply")
    app.add_argument("-i", "--checkpoint", required=True)
    app.add_argument("--recipe", required=True)
    app.add_argument("-o", "--output-dir", required=True)

    # W8A8 toolchain (reference activation_quantization.py:342-448:
    # calibration-data capture over fixed prompts, then per-layer +
    # cumulative quantization behind PSNR gates)
    cal = sub.add_parser("w8a8-calibrate")
    cal.add_argument("-i", "--checkpoint", required=True)
    cal.add_argument("-o", "--output-json", required=True)
    cal.add_argument("--size", default="512x512")
    cal.add_argument("--probe-prompts", type=int, default=8)

    w8a = sub.add_parser("w8a8-analyze")
    w8a.add_argument("-i", "--checkpoint", required=True)
    w8a.add_argument("--scales", required=True,
                     help="calibrated {module_path: absmax} JSON from "
                          "w8a8-calibrate")
    w8a.add_argument("-o", "--output-json", required=True)
    w8a.add_argument("--conv-psnr", type=float, default=40.0,
                     help="PSNR gate for non-attention layers (reference "
                          "activation_quantization.py:491)")
    w8a.add_argument("--attn-psnr", type=float, default=30.0,
                     help="PSNR gate for attention projections (:495)")
    w8a.add_argument("--size", default="512x512")
    w8a.add_argument("--probe-prompts", type=int, default=8)
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
        from ..compress.mixed_bit import benchmark_baselines

        model, params = _load_unet(args.checkpoint)
        run_fn = _one_step_runner(model, args)
        results = benchmark_signal_integrity(run_fn, params,
                                             nbits_list=tuple(args.nbits),
                                             cumulative=args.cumulative,
                                             out_json=args.output_json)
        # reference pre-analysis emits baseline variants next to the sweeps
        # (original/serving-dtype + linear 8-bit, pre_analysis.py:376-434)
        results["baselines"] = benchmark_baselines(run_fn, params)
        Path(args.output_json).write_text(json.dumps(results, indent=1))
        logger.info("analysis + baselines written to %s", args.output_json)

    elif args.cmd == "mbp-build-recipe":
        analysis = json.loads(Path(args.analysis_json).read_text())
        recipe = build_recipe(analysis["single_layer"], args.psnr_threshold)
        Path(args.output_json).write_text(json.dumps(recipe, indent=1))
        logger.info("recipe written to %s", args.output_json)

    elif args.cmd == "mbp-report":
        from ..compress.mixed_bit import mbp_report, mbp_report_rows

        analysis = json.loads(Path(args.analysis_json).read_text())
        _, params = _load_unet(args.checkpoint)
        recipes = {f"recipe_{t:g}dB": build_recipe(analysis["single_layer"], t)
                   for t in args.psnr_thresholds}
        md = mbp_report(analysis["single_layer"], recipes, params,
                        baselines=analysis.get("baselines"))
        Path(args.output_md).write_text(md)
        logger.info("report written to %s", args.output_md)
        if args.output_json:
            rows = mbp_report_rows(analysis["single_layer"], recipes, params,
                                   baselines=analysis.get("baselines"))
            Path(args.output_json).write_text(json.dumps(rows, indent=1))
            logger.info("tradeoff series written to %s", args.output_json)

    elif args.cmd == "mbp-apply":
        model, params = _load_unet(args.checkpoint)
        recipe = json.loads(Path(args.recipe).read_text())
        params = apply_recipe_palettized(params, recipe)
        artifacts.save_module(Path(args.output_dir), params,
                              config=model.config, name="Unet")
        logger.info("recipe applied (stored compressed) -> %s",
                    args.output_dir)

    elif args.cmd == "w8a8-calibrate":
        from ..compress.w8a8 import capture_activation_scales

        model, params = _load_unet(args.checkpoint)
        latents, t, ctx = _probe_batch(model, args)
        # eager apply (the interceptor records concrete absmax per module)
        scales = capture_activation_scales(
            lambda inp: model.apply({"params": params}, *inp),
            [(latents, t, ctx)])
        Path(args.output_json).write_text(json.dumps(
            {k: round(v, 6) for k, v in sorted(scales.items())}, indent=1))
        logger.info("calibrated %d module scales -> %s", len(scales),
                    args.output_json)

    elif args.cmd == "w8a8-analyze":
        import flax.linen as nn

        from ..compress.w8a8 import (
            benchmark_w8a8,
            build_w8a8_recipe,
            quantizable_dense_paths,
        )

        model, params = _load_unet(args.checkpoint)
        scales = json.loads(Path(args.scales).read_text())
        latents, t, ctx = _probe_batch(model, args)

        def run_fn(interceptor):
            if interceptor is None:
                return model.apply({"params": params}, latents, t, ctx)
            with nn.intercept_methods(interceptor):
                return model.apply({"params": params}, latents, t, ctx)

        single = benchmark_w8a8(run_fn, scales, cumulative=False)
        recipe = build_w8a8_recipe(single, scales, conv_psnr=args.conv_psnr,
                                   attn_psnr=args.attn_psnr)
        # cumulative pass over the kept layers in ascending impact
        # (highest single-layer PSNR first — the reference's ordering)
        kept = [p for p in quantizable_dense_paths(scales)
                if p not in set(recipe["skip"])]
        kept.sort(key=lambda k: -single.get(k, 0.0))
        cumulative = (benchmark_w8a8(run_fn, scales, paths=kept,
                                     cumulative=True) if kept else {})
        final = min(cumulative.values()) if cumulative else None
        Path(args.output_json).write_text(json.dumps(
            {**recipe, "single_layer": single, "cumulative": cumulative,
             "final_cumulative_psnr": final}, indent=1))
        logger.info("w8a8 analysis: %d kept / %d skipped, cumulative "
                    "PSNR %s -> %s", len(kept), len(recipe["skip"]),
                    final, args.output_json)


#: fixed probe prompts spanning subjects/styles — the reference measures
#: sensitivity end-to-end over 8 fixed prompts with synced RNG
#: (pre_analysis.py:34-45, 244-258); a single random context mis-ranks
#: layers whose sensitivity is text-conditioned.
PROBE_PROMPTS = (
    "a photograph of an astronaut riding a horse",
    "a watercolor painting of a lighthouse at dusk",
    "macro photo of a honeybee on a sunflower, sharp focus",
    "isometric pixel art of a cozy coffee shop interior",
    "portrait of an elderly fisherman, dramatic lighting",
    "a red vintage car parked on a rainy neon street at night",
    "an intricate pencil sketch of a gothic cathedral",
    "aerial view of terraced rice fields at sunrise",
)


def _probe_batch(model, args):
    """(latents, t, ctx) over the fixed probe prompts with real text
    conditioning and synced RNG — the shared probe of the MBP and W8A8
    tools (reference pre_analysis.py run_pipe :248 / activation_
    quantization.py generate_calibration_data :37-55)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..convert import load
    from ..tokenizer import CLIPTokenizer

    h, w = (int(x) // 8 for x in args.size.split("x"))
    cfg = model.config
    root = Path(args.checkpoint)
    prompts = PROBE_PROMPTS[: max(1, args.probe_prompts)]
    P = len(prompts)

    te_dir, tok_dir = root / "text_encoder", root / "tokenizer"
    if te_dir.exists() and tok_dir.exists():
        te, te_params = load.load_text_encoder(te_dir)
        tok = CLIPTokenizer.from_pretrained_dir(tok_dir)
        ids = np.stack([tok.tokenize(p, max_length=77)[0] for p in prompts])
        ctx = jax.jit(lambda p, i: te.apply({"params": p}, i)
                      ["last_hidden_state"])(te_params, jnp.asarray(ids))
        if ctx.shape[-1] != cfg.cross_attention_dim:
            raise ValueError(
                f"text encoder width {ctx.shape[-1]} != UNet "
                f"cross_attention_dim {cfg.cross_attention_dim}")
    else:  # no text encoder in the checkpoint: fall back to fixed contexts
        logger.warning("no text_encoder/tokenizer; probing with fixed "
                       "random contexts (weaker than the reference probe)")
        ctx = jax.random.normal(jax.random.key(1),
                                (P, 77, cfg.cross_attention_dim))
    latents = jax.random.normal(jax.random.key(0),
                                (P, h, w, cfg.in_channels))
    t = jnp.full((P,), 500.0)
    return latents, t, ctx


def _one_step_runner(model, args):
    """1-step denoise output over the probe batch, jitted (MBP sweeps)."""
    import jax

    latents, t, ctx = _probe_batch(model, args)

    @jax.jit
    def forward(p):
        return model.apply({"params": p}, latents, t, ctx)

    return lambda p: forward(p)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    run(parser_spec().parse_args(argv))


if __name__ == "__main__":
    main()
