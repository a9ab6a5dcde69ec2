#!/usr/bin/env python
"""Flagship benchmark: SD-2.1-base 512x512 diffusion speed on one TPU chip.

Measures the reference's headline metric — diffusion iter/s with CFG batch 2,
20 steps (BASELINE.md: best reference device is M2 iPad ANE at 3.07 iter/s;
target >= 30 iter/s on one v5e chip).

Random bf16 weights (identical FLOPs/layout to ported real weights — speed
is weight-value independent).  The HEADLINE measures the real serving path —
``StableDiffusionPipeline.generate_images`` (text encode + denoise scan in
one jitted program, program cache, bundle materialization) — as the median
of 3 runs with distinct seeds/prompts; the raw hand-rolled scan rides in
``extra.raw_scan_iter_s``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
``extra`` carries driver-verified secondary numbers (SDXL 1024 e2e latency,
6-bit palettized compressed serving) — each fail-safe so the headline
metric always lands.  Set SDTPU_BENCH_EXTRAS=0 to skip them.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sdtpu_jax_cache")

import jax

# the axon sitecustomize swallows JAX_COMPILATION_CACHE_DIR (like
# JAX_PLATFORMS) — the persistent cache only engages via jax.config
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
import jax.numpy as jnp
import numpy as np

from ml_stable_diffusion_tpu.utils.compile import sdtpu_jit
from ml_stable_diffusion_tpu.models.unet import UNetConfig, UNet2DConditionModel
from ml_stable_diffusion_tpu.schedulers import DPMSolverMultistepScheduler

BASELINE_ITERS_PER_S = 3.07  # iPad Pro M2, reference README.md:74
STEPS = 20
GUIDANCE = 7.5


def _sd21_parts():
    cfg = UNetConfig.sd21()
    import dataclasses

    if os.environ.get("SDTPU_FUSE_QKV") == "1":
        cfg = dataclasses.replace(cfg, fuse_qkv=True)
    if os.environ.get("SDTPU_FUSED_GN") == "1":
        cfg = dataclasses.replace(cfg, fused_groupnorm=True)
    if os.environ.get("SDTPU_GN_LOWMEM") == "1":
        cfg = dataclasses.replace(cfg, lowmem_groupnorm=True)
    if os.environ.get("SDTPU_FAST_GELU") == "1":
        cfg = dataclasses.replace(cfg, fast_gelu=True)
    model = UNet2DConditionModel(cfg, dtype=jnp.bfloat16)

    h = w = 64  # 512 / 8
    sample = jnp.zeros((2, h, w, 4), jnp.float32)
    t0 = jnp.zeros((2,), jnp.float32)
    ctx = jnp.zeros((2, 77, cfg.cross_attention_dim), jnp.float32)

    shapes = jax.eval_shape(lambda k: model.init(k, sample, t0, ctx),
                            jax.random.key(0))["params"]
    leaves, treedef = jax.tree.flatten(shapes)
    keys = jax.random.split(jax.random.key(0), len(leaves))
    params = jax.tree.unflatten(treedef, [
        (jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02)
        for k, s in zip(keys, leaves)])
    # NOTE: with SDTPU_FUSE_QKV=1 the init already builds fused to_qkv params

    sched = DPMSolverMultistepScheduler()
    plan = sched.set_timesteps(STEPS)

    def make_scan(apply_params_fn):
        def denoise_body(params_in, latents, context):
            params = apply_params_fn(params_in)
            state = sched.initial_state(plan, latents.shape)

            def step(carry, i):
                lat, st = carry
                lat_in = sched.scale_model_input(plan, st, lat, i)
                lat2 = jnp.concatenate([lat_in, lat_in], axis=0)
                eps = model.apply({"params": params}, lat2, plan.timesteps[i],
                                  context)
                neg, pos = jnp.split(eps, 2, axis=0)
                guided = neg + GUIDANCE * (pos - neg)
                st, lat = sched.step(plan, st, guided, i, lat)
                return (lat, st), None

            (lat, _), _ = jax.lax.scan(step, (latents, state),
                                       jnp.arange(plan.num_steps))
            return lat

        return denoise_body

    context = jax.random.normal(jax.random.key(2),
                                (2, 77, cfg.cross_attention_dim), jnp.float32)

    def fresh_latents(i):
        # distinct inputs per repeat: the TPU tunnel may replay cached
        # results for identical (executable, args) requests
        return jax.random.normal(jax.random.key(100 + i), (1, h, w, 4),
                                 jnp.float32)

    return cfg, params, make_scan, context, fresh_latents


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])


def _time_best(fn, fresh_latents, repeats=3):
    """MEDIAN of ``repeats`` timed runs after one warmup (the reference's
    metric protocol, test_stable_diffusion.py:107-110 — r2 used min, which
    flatters tunnel noise)."""
    fn(fresh_latents(0)).block_until_ready()  # warmup / compile
    times = []
    for i in range(repeats):
        lat = fresh_latents(i + 1)
        lat.block_until_ready()
        t = time.perf_counter()
        fn(lat).block_until_ready()
        times.append(time.perf_counter() - t)
    return _median(times)


def bench_sd21(parts) -> float:
    _, params, make_scan, context, fresh = parts
    denoise = sdtpu_jit(make_scan(lambda p: p))
    best = _time_best(lambda lat: denoise(params, lat, context), fresh)
    return STEPS / best


def _rand_tree(model, init_args, dtype, seed=0, scale=0.02):
    shapes = jax.eval_shape(lambda k: model.init(k, *init_args),
                            jax.random.key(seed))["params"]
    leaves, treedef = jax.tree.flatten(shapes)
    keys = jax.random.split(jax.random.key(seed), len(leaves))
    return jax.tree.unflatten(treedef, [
        jax.random.normal(k, s.shape, dtype) * scale
        for k, s in zip(keys, leaves)])


def bench_pipeline(parts) -> float:
    """HEADLINE: the real serving path — StableDiffusionPipeline.
    generate_images (program cache, _materialize_bundle, interceptor
    wrapping, text encode + denoise scan in ONE jitted program) with
    SD-2.1-dimension random weights.  Median seconds/step of 3 runs with
    distinct seeds+prompts (distinct args defeat tunnel replay)."""
    import json as _json
    import pathlib
    import tempfile

    from ml_stable_diffusion_tpu.models.clip import (
        CLIPTextConfig,
        CLIPTextEncoder,
    )
    from ml_stable_diffusion_tpu.models.vae import VAEConfig, VAEDecoder
    from ml_stable_diffusion_tpu.pipelines import PipelineConfiguration
    from ml_stable_diffusion_tpu.pipelines.sd import StableDiffusionPipeline
    from ml_stable_diffusion_tpu.tokenizer import CLIPTokenizer

    cfg, unet_params, _, _, _ = parts
    model = UNet2DConditionModel(cfg, dtype=jnp.bfloat16)

    tokdir = pathlib.Path(tempfile.mkdtemp())
    vocab = {}
    for ch in "abcdefghijklmnopqrstuvwxyz":
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = 49406
    vocab["<|endoftext|>"] = 49407
    (tokdir / "vocab.json").write_text(_json.dumps(vocab))
    (tokdir / "merges.txt").write_text("#version: 0.2\n")

    te_cfg = CLIPTextConfig.sd2()
    te = CLIPTextEncoder(te_cfg)
    te_params = _rand_tree(te, (jnp.zeros((1, 77), jnp.int32),), jnp.float32,
                           seed=1)
    dec = VAEDecoder(VAEConfig.sd())
    dec_params = _rand_tree(dec, (jnp.zeros((1, 8, 8, 4)),), jnp.float32,
                            seed=2)

    pipe = StableDiffusionPipeline(
        tokenizer=CLIPTokenizer.from_pretrained_dir(tokdir),
        text_encoder=(te, te_params), unet=(model, unet_params),
        vae_decoder=(dec, dec_params))

    prompts = ["a photo of an astronaut riding a horse on mars",
               "a cat wearing a tiny hat", "a watercolor bridge at dawn",
               "a robot reading in a library"]

    def run_once(i, steps=STEPS):
        gen = PipelineConfiguration(
            prompt=prompts[i % len(prompts)], step_count=steps,
            guidance_scale=GUIDANCE, seed=1000 + i, disable_safety=True,
            scheduler="DPMSolverMultistep")
        r = pipe.generate_images(gen, image_hw=(512, 512))
        return r.seconds_per_step * steps

    run_once(0)  # warmup / compile
    headline = 1.0 / (_median([run_once(i + 1) for i in range(3)]) / STEPS)

    # few-step serving: LCM 4-step generation through the same pipeline
    # (the production pairing is apply_lora on an LCM-LoRA; speed is
    # weight-value independent)
    lcm_extra = {}
    try:
        def run_lcm(i):
            gen = PipelineConfiguration(
                prompt=prompts[i % len(prompts)], step_count=4,
                guidance_scale=1.0, seed=2000 + i, disable_safety=True,
                scheduler="LCM")
            r = pipe.generate_images(gen, image_hw=(512, 512))
            return r.seconds_per_step * 4
        run_lcm(0)  # warmup / compile
        lcm_extra = {"lcm_4step_e2e_s": round(
            _median([run_lcm(i + 1) for i in range(3)]), 4)}
    except Exception as e:  # never lose the headline
        lcm_extra = {"lcm_error": f"{type(e).__name__}: {e}"[:200]}

    # Fixed-vs-marginal split: the generation includes per-call costs the
    # denoise loop doesn't scale with (text encode; on this dev host also a
    # ~30-45 ms axon-tunnel round trip for the latent fetch — CLAUDE.md:
    # block_until_ready alone does not force that sync).  Slope over two
    # step counts isolates the true per-step cost.
    slope_extra = {}
    try:
        run_once(0, steps=2 * STEPS)  # warmup / compile the 40-step program
        t40 = _median([run_once(i + 1, steps=2 * STEPS) for i in range(2)])
        t20 = _median([run_once(i + 10) for i in range(2)])
        slope = (t40 - t20) / STEPS
        slope_extra = {
            "pipeline_marginal_iter_s": round(1.0 / slope, 3),
            "pipeline_fixed_overhead_ms": round((t20 - STEPS * slope) * 1e3,
                                                1),
        }
    except Exception as e:  # never lose the headline
        slope_extra = {"pipeline_slope_error": f"{type(e).__name__}: {e}"[:200]}
    return headline, {**slope_extra, **lcm_extra}


def bench_palettized6(parts) -> dict:
    """6-bit palettized serving (install-mode: host dequant at load, dense
    bf16 in HBM — the default; the in-program gather variant measured
    1.11 iter/s in BENCH r2, see pipelines/sd.py install_palettized)."""
    from ml_stable_diffusion_tpu.compress.palettize import (
        dequantize_tree,
        palettize_tree,
    )

    _, params, make_scan, context, fresh = parts
    tree, stats = palettize_tree(
        jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params), 6)
    dense = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16)
                         if hasattr(x, "astype") else x,
                         dequantize_tree(tree))

    denoise = sdtpu_jit(make_scan(lambda p: p))
    best = _time_best(lambda lat: denoise(dense, lat, context), fresh)

    # WHOLE-bundle shrink (reference palettizes text encoders + denoiser,
    # torch2coreml.py:185-204; VAE stays dense there too): UNet + CLIP-H
    # palettized, VAE dense, at fp16-equivalent on-disk bytes
    from ml_stable_diffusion_tpu.models.clip import (
        CLIPTextConfig,
        CLIPTextEncoder,
    )
    from ml_stable_diffusion_tpu.models.vae import VAEConfig, VAEDecoder

    te = CLIPTextEncoder(CLIPTextConfig.sd2())
    te_params = _rand_tree(te, (jnp.zeros((1, 77), jnp.int32),),
                           jnp.float32, seed=7)
    _, te_stats = palettize_tree(te_params, 6)
    vae_elems = sum(
        int(np.prod(s.shape)) for s in jax.tree.leaves(jax.eval_shape(
            lambda k: VAEDecoder(VAEConfig.sd()).init(
                k, jnp.zeros((1, 8, 8, 4))), jax.random.key(0))["params"]))
    vae_bytes = 2 * vae_elems  # fp16-equivalent dense
    orig = stats["orig_bytes"] + te_stats["orig_bytes"] + vae_bytes
    new = stats["new_bytes"] + te_stats["new_bytes"] + vae_bytes
    return {
        "palettized6_iter_s": round(STEPS / best, 3),
        "palettized6_payload_shrink": round(
            stats["orig_bytes"] / max(stats["new_bytes"], 1), 2),
        "palettized6_bundle_shrink": round(orig / max(new, 1), 2),
        "palettized6_mode": "install-dequant",
    }


def bench_batch4(parts, single_iter_s: float) -> dict:
    """Dynamic-batching serving throughput: 4 coalesced single-image
    requests (CFG batch 8) through one scan — the program
    GenerationServer.submit runs for 4 concurrent users (serving.py)."""
    cfg, params, make_scan, _, _ = parts
    denoise = sdtpu_jit(make_scan(lambda p: p))
    h = w = 64
    ctx8 = jax.random.normal(jax.random.key(3),
                             (8, 77, cfg.cross_attention_dim), jnp.float32)

    def fresh4(i):
        return jax.random.normal(jax.random.key(200 + i), (4, h, w, 4),
                                 jnp.float32)

    best = _time_best(lambda lat: denoise(params, lat, ctx8), fresh4)
    return {
        "serve_batch4_e2e_s": round(best, 3),
        # throughput multiple vs 4 serial single-image runs
        "serve_batch4_speedup": round((4 * STEPS / single_iter_s) / best, 2),
    }


def main():
    parts = _sd21_parts()
    raw_iter_s = bench_sd21(parts)
    try:
        # headline through the REAL pipeline layer (program cache,
        # generate_images); raw scan stays as a secondary number
        iters_per_s, slope_extra = bench_pipeline(parts)
        raw_extra = {"raw_scan_iter_s": round(raw_iter_s, 3), **slope_extra}
    except Exception as e:
        iters_per_s = raw_iter_s
        raw_extra = {"pipeline_error": f"{type(e).__name__}: {e}"[:200]}

    extra = dict(raw_extra)
    if os.environ.get("SDTPU_BENCH_EXTRAS", "1") != "0":
        try:
            extra.update(bench_batch4(parts, iters_per_s))
        except Exception as e:
            extra["batch4_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            extra.update(bench_palettized6(parts))
        except Exception as e:  # never lose the headline metric
            extra["palettized6_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            import bench_w8a8

            # dense-only measured FASTER than dense+conv (55.4 vs 53.7
            # iter/s, r2): int8 convs cost more in activation quant + rescale
            # than their halved weight traffic saves on this chip
            extra["w8a8_dense_iter_s"] = round(
                bench_w8a8.run(include_convs=False), 3)
        except Exception as e:
            extra["w8a8_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            import bench_sdxl

            best = bench_sdxl.run()
            extra["sdxl_1024_e2e_s"] = round(best, 3)
            extra["sdxl_vs_baseline"] = round(bench_sdxl.BASELINE_E2E_S / best,
                                              2)
        except Exception as e:
            extra["sdxl_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            import bench_sd3

            extra["sd3_1024_e2e_s"] = round(bench_sd3.run(), 3)
            # full-capability SD3 path: + the T5-XXL encode (runs once per
            # generation outside the denoise loop, timed as its own program)
            t5_s = bench_sd3.run_t5_encode()
            extra["sd3_t5_xxl_encode_s"] = round(t5_s, 3)
            extra["sd3_1024_e2e_with_t5_s"] = round(
                extra["sd3_1024_e2e_s"] + t5_s, 3)
        except Exception as e:
            extra["sd3_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps({
        "metric": "SD-2.1-base 512x512 pipeline diffusion speed "
                  "(generate_images, CFG batch 2, 20 steps, DPM++ 2M, "
                  "median of 3)",
        "value": round(iters_per_s, 3),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_s / BASELINE_ITERS_PER_S, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
