#!/usr/bin/env python
"""Secondary benchmark: SDXL-base 1024x1024 end-to-end latency on one chip.

Reference best: 20 s on a Mac Studio M2 Ultra (BASELINE.md); target < 4 s.
E2E = text encode (dual CLIP) + 20-step CFG denoise + VAE decode, all real
SDXL dimensions with random bf16 weights (speed is weight-value independent).
"""

import json
import time

import jax

from ml_stable_diffusion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from ml_stable_diffusion_tpu.utils.compile import sdtpu_jit
from ml_stable_diffusion_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
from ml_stable_diffusion_tpu.models.unet import UNetConfig, UNet2DConditionModel
from ml_stable_diffusion_tpu.models.vae import VAEConfig, VAEDecoder
from ml_stable_diffusion_tpu.schedulers import DPMSolverMultistepScheduler

STEPS = 20
GUIDANCE = 5.0
BASELINE_E2E_S = 20.0  # M2 Ultra, README.md:137
# Reference's 768x768 config (the MBP-compressed UNet benchmark rows,
# README.md:100-105): best 27 s / 0.98 iter/s on iPad Pro (M2).  MBP
# artifacts here dequantize at install (measured: in-program LUT dequant
# is ~50x slower on TPU, CLAUDE.md), so compressed serving speed == dense.
BASELINE_768_E2E_S = 27.0


def _sync(x):
    """Force device completion via a SCALAR element fetch: block_until_ready
    on axon arrays can return without syncing (CLAUDE.md), and fetching the
    full output would add MBs of tunnel transfer to the timed region."""
    return np.asarray(x[(0,) * x.ndim])


def _random_params(model, *args, dtype=jnp.bfloat16):
    shapes = jax.eval_shape(lambda k: model.init(k, *args), jax.random.key(0))["params"]
    return jax.tree.map(lambda s: jnp.zeros(s.shape, dtype), shapes)


def run(image_size: int = 1024, parity_upsample: bool | None = None) -> float:
    """-> best e2e seconds (importable from bench.py for the driver run).

    ``parity_upsample`` (default: env SDTPU_PARITY_UPSAMPLE) computes every
    NN-upsample+conv3x3 (UNet up path + VAE decoder upsamplers) as four
    2x2 parity convs — 4/9 the FLOPs, no 2x-res intermediate."""
    import dataclasses
    import os

    if parity_upsample is None:
        parity_upsample = os.environ.get("SDTPU_PARITY_UPSAMPLE") == "1"
    # fused upsamplers are the config default (r5); "0" opts out
    fused_upsample = os.environ.get("SDTPU_FUSED_UPSAMPLE", "1") != "0"
    h = w = image_size // 8

    ucfg = UNetConfig.sdxl()
    if parity_upsample:
        ucfg = dataclasses.replace(ucfg, parity_upsample=True)
    if not fused_upsample:
        ucfg = dataclasses.replace(ucfg, fused_upsample=False)
    unet = UNet2DConditionModel(ucfg, dtype=jnp.bfloat16)
    added = {"text_embeds": jnp.zeros((2, 1280), jnp.float32),
             "time_ids": jnp.zeros((2, 6), jnp.float32)}
    shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((2, h, w, 4)), jnp.zeros((2,)),
                            jnp.zeros((2, 77, 2048)), added_cond=added),
        jax.random.key(0))["params"]
    uparams = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)

    te1 = CLIPTextEncoder(CLIPTextConfig.sd1(), dtype=jnp.bfloat16)
    te1_params = _random_params(te1, jnp.zeros((2, 77), jnp.int32))
    te2 = CLIPTextEncoder(CLIPTextConfig.sdxl_g(), dtype=jnp.bfloat16)
    te2_params = _random_params(te2, jnp.zeros((2, 77), jnp.int32))

    vcfg = VAEConfig.sd()
    vae = VAEDecoder(vcfg, dtype=jnp.bfloat16,
                     parity_upsample=parity_upsample,
                     fused_upsample=fused_upsample)
    vparams = _random_params(vae, jnp.zeros((1, h, w, 4)))

    sched = DPMSolverMultistepScheduler()
    plan = sched.set_timesteps(STEPS)

    @sdtpu_jit
    def e2e(uparams, te1_params, te2_params, vparams, ids, latents):
        o1 = te1.apply({"params": te1_params}, ids)
        o2 = te2.apply({"params": te2_params}, ids)
        ctx = jnp.concatenate([o1["penultimate_hidden_state"],
                               o2["penultimate_hidden_state"]], axis=-1)
        pooled = o2["pooled_output"]
        sz = float(image_size)
        added = {"text_embeds": pooled,
                 "time_ids": jnp.broadcast_to(
                     jnp.asarray([sz, sz, 0, 0, sz, sz], jnp.float32),
                     (2, 6))}
        state = sched.initial_state(plan, latents.shape)

        def step(carry, i):
            lat, st = carry
            lat2 = jnp.concatenate([lat, lat], axis=0)
            eps = unet.apply({"params": uparams}, lat2, plan.timesteps[i],
                             ctx, added_cond=added)
            neg, pos = jnp.split(eps, 2, axis=0)
            guided = neg + GUIDANCE * (pos - neg)
            st, lat = sched.step(plan, st, guided, i, lat)
            return (lat, st), None

        (lat, _), _ = jax.lax.scan(step, (latents, state),
                                   jnp.arange(plan.num_steps))
        img = vae.apply({"params": vparams}, lat / 0.13025)
        # fused [-1,1]->uint8 postprocess (pipelines decode_latents does the
        # same): ready-to-save pixels, 4x smaller device->host transfer
        img = jnp.clip(img.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
        return jnp.round(img * 255.0).astype(jnp.uint8)

    ids = jnp.zeros((2, 77), jnp.int32)

    def fresh(i):
        return jax.random.normal(jax.random.key(i), (1, h, w, 4), jnp.float32)

    _sync(e2e(uparams, te1_params, te2_params, vparams, ids, fresh(0)))

    times = []
    for i in range(3):
        lat = fresh(i + 1)
        np.asarray(lat)
        t0 = time.perf_counter()
        _sync(e2e(uparams, te1_params, te2_params, vparams, ids, lat))
        times.append(time.perf_counter() - t0)
    return min(times)


def _init_tree(model, *args, dtype=jnp.bfloat16, seed=0, **kwargs):
    """Variance-preserving flax init (jitted — eager init compiles per-op
    through the tunnel), cast to ``dtype``: the signal-integrity extra
    needs O(input) output magnitudes; 0.02-scale random weights predict
    ~zero noise and inflate every PSNR."""
    return jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(dtype),
        model.init(k, *args, **kwargs)["params"]))(jax.random.key(seed))


def build_pipeline_rig():
    """Real StableDiffusionXLPipeline with SDXL-dimension flax-init weights
    (non-degenerate, unlike run()'s zeros: the DeepCache signal-integrity
    extra measures trajectory divergence of a realistic-magnitude net)."""
    import json as _json
    import pathlib
    import tempfile

    from ml_stable_diffusion_tpu.pipelines.sdxl import (
        StableDiffusionXLPipeline,
    )
    from ml_stable_diffusion_tpu.tokenizer import CLIPTokenizer

    def tiny_tokenizer():
        tokdir = pathlib.Path(tempfile.mkdtemp())
        vocab = {}
        for ch in "abcdefghijklmnopqrstuvwxyz!":
            vocab[ch] = len(vocab)
            vocab[ch + "</w>"] = len(vocab)
        vocab["<|startoftext|>"] = 49406
        vocab["<|endoftext|>"] = 49407
        (tokdir / "vocab.json").write_text(_json.dumps(vocab))
        (tokdir / "merges.txt").write_text("#version: 0.2\n")
        return CLIPTokenizer.from_pretrained_dir(tokdir)

    ucfg = UNetConfig.sdxl()
    unet = UNet2DConditionModel(ucfg, dtype=jnp.bfloat16)
    added = {"text_embeds": jnp.zeros((2, 1280), jnp.float32),
             "time_ids": jnp.zeros((2, 6), jnp.float32)}
    uparams = _init_tree(unet, jnp.zeros((2, 32, 32, 4)), jnp.zeros((2,)),
                         jnp.zeros((2, 77, 2048)), added_cond=added)

    te1 = CLIPTextEncoder(CLIPTextConfig.sd1(), dtype=jnp.bfloat16)
    te1_params = _init_tree(te1, jnp.zeros((1, 77), jnp.int32),
                            dtype=jnp.float32, seed=1)
    te2 = CLIPTextEncoder(CLIPTextConfig.sdxl_g(), dtype=jnp.bfloat16)
    te2_params = _init_tree(te2, jnp.zeros((1, 77), jnp.int32),
                            dtype=jnp.float32, seed=2)

    vae = VAEDecoder(VAEConfig.sd(), dtype=jnp.bfloat16)
    vparams = _init_tree(vae, jnp.zeros((1, 8, 8, 4)), dtype=jnp.float32,
                         seed=3)

    return StableDiffusionXLPipeline(
        tokenizer=tiny_tokenizer(), tokenizer2=tiny_tokenizer(),
        text_encoder=(te1, te1_params), text_encoder2=(te2, te2_params),
        unet=(unet, uparams), vae_decoder=(vae, vparams))


def main():
    best = run()
    print(json.dumps({
        "metric": "SDXL-base 1024x1024 end-to-end latency (text encode + 20 steps CFG + VAE decode)",
        "value": round(best, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_E2E_S / best, 2),
    }))


if __name__ == "__main__":
    main()
