#!/usr/bin/env python
"""Cold/warm start benchmark: time-to-first-image from process start.

The serving-deployment metric the reference's model-load timing logs play
at (coreml_model.py:44,88-95 logs per-model load seconds; its .mlmodelc
artifacts are pre-compiled precisely to make app start-up cheap).  On TPU
the analog is XLA compilation: a COLD start (empty compile cache) pays the
full program compile — through this environment's tunnel that is minutes —
while a WARM start (populated ``.jax_cache``) pays only artifact load +
install + cache deserialization.

Protocol: a fresh subprocess (honest process start: python + jax import +
artifact load + pipeline install + one 20-step 512x512 generation) with
``SDTPU_JAX_CACHE_DIR`` pointed at either an empty temp dir (cold) or the
repo's persistent cache (warm).  The parent's subprocess wall time is the
reported time-to-first-image.

Artifacts: an SD-2.1-dimension random-weight bundle written once to
``.bench_artifacts/sd21/`` (gitignored, ~1.7 GB) via convert.artifacts —
the same on-disk format real conversions produce, so the child exercises
the production load path (safetensors mmap -> manifest -> pipeline).
"""

import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent
ARTIFACT_DIR = REPO / ".bench_artifacts" / "sd21"
STEPS = 20


def ensure_artifacts() -> pathlib.Path:
    """Write the SD-2.1-dimension artifact bundle once (idempotent —
    skip-if-exists like the reference's conversions, torch2coreml.py:113)."""
    if (ARTIFACT_DIR / "Unet.safetensors").exists():
        return ARTIFACT_DIR
    import jax

    # the parent must NOT claim the TPU: the axon tunnel is single-client
    # and the measured children need it — generate the bundle on CPU
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from ml_stable_diffusion_tpu.convert.artifacts import save_module
    from ml_stable_diffusion_tpu.models.clip import (
        CLIPTextConfig,
        CLIPTextEncoder,
    )
    from ml_stable_diffusion_tpu.models.unet import (
        UNetConfig,
        UNet2DConditionModel,
    )
    from ml_stable_diffusion_tpu.models.vae import VAEConfig, VAEDecoder

    def rand_tree(model, init_args, dtype, seed):
        shapes = jax.eval_shape(lambda k: model.init(k, *init_args),
                                jax.random.key(seed))["params"]
        leaves, treedef = jax.tree.flatten(shapes)
        keys = jax.random.split(jax.random.key(seed), len(leaves))
        return jax.tree.unflatten(treedef, [
            jax.random.normal(k, s.shape, dtype) * 0.02
            for k, s in zip(keys, leaves)])

    ucfg = UNetConfig.sd21()
    unet = UNet2DConditionModel(ucfg, dtype=jnp.bfloat16)
    uparams = rand_tree(unet, (jnp.zeros((2, 64, 64, 4), jnp.float32),
                               jnp.zeros((2,), jnp.float32),
                               jnp.zeros((2, 77, ucfg.cross_attention_dim),
                                         jnp.float32)), jnp.bfloat16, 0)
    te_cfg = CLIPTextConfig.sd2()
    te = CLIPTextEncoder(te_cfg)
    te_params = rand_tree(te, (jnp.zeros((1, 77), jnp.int32),),
                          jnp.float32, 1)
    vcfg = VAEConfig.sd()
    dec = VAEDecoder(vcfg)
    dec_params = rand_tree(dec, (jnp.zeros((1, 8, 8, 4)),), jnp.float32, 2)

    save_module(ARTIFACT_DIR, uparams, ucfg, name="Unet")
    save_module(ARTIFACT_DIR, te_params, te_cfg, name="TextEncoder")
    save_module(ARTIFACT_DIR, dec_params, vcfg, name="VAEDecoder")
    vocab = {}
    for ch in "abcdefghijklmnopqrstuvwxyz":
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = 49406
    vocab["<|endoftext|>"] = 49407
    (ARTIFACT_DIR / "vocab.json").write_text(json.dumps(vocab))
    (ARTIFACT_DIR / "merges.txt").write_text("#version: 0.2\n")
    (ARTIFACT_DIR / "bundle.json").write_text(json.dumps(
        {"family": "StableDiffusionPipeline"}))
    return ARTIFACT_DIR


def child(cache_dir: str, artifact_dir: str, seed: int) -> None:
    """Fresh-process body: load artifacts, generate one image, print
    inner-phase timings as JSON on the last line."""
    t0 = time.monotonic()
    import jax  # noqa: F401  (position: jax import is part of start-up)

    from ml_stable_diffusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(cache_dir)
    t_import = time.monotonic() - t0

    from ml_stable_diffusion_tpu.convert.load import (
        load_pipeline_from_artifacts,
    )
    from ml_stable_diffusion_tpu.pipelines import PipelineConfiguration

    pipe = load_pipeline_from_artifacts(artifact_dir)
    t_load = time.monotonic() - t0 - t_import

    cfg = PipelineConfiguration(
        prompt="a photo of an astronaut riding a horse on mars",
        step_count=STEPS, seed=seed, disable_safety=True,
        scheduler="DPMSolverMultistep")
    res = pipe.generate_images(cfg, image_hw=(512, 512))
    assert res.images[0].size == (512, 512)
    print(json.dumps({"import_s": round(t_import, 2),
                      "load_install_s": round(t_load, 2),
                      "first_generate_s": round(
                          time.monotonic() - t0 - t_import - t_load, 2),
                      "ttfi_s": round(time.monotonic() - t0, 2)}),
          flush=True)


def _run_child(cache_dir: str, seed: int, timeout_s: float) -> dict:
    art = ensure_artifacts()
    # Inherit the env UNCHANGED: on this image PYTHONPATH=/root/.axon_site
    # is precisely how the axon PJRT plugin registers (sitecustomize.py
    # lives there) — stripping it makes the child fail with "Backend
    # 'axon' is not in the list of known backends".
    env = dict(os.environ)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, __file__, "child", cache_dir, str(art), str(seed)],
        cwd=str(REPO), env=env, capture_output=True, text=True,
        timeout=timeout_s)
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"child failed rc={proc.returncode}: "
                           f"{proc.stderr[-500:]}")
    inner = json.loads(proc.stdout.strip().splitlines()[-1])
    inner["process_wall_s"] = round(wall, 2)
    return inner


def run(include_cold: bool = True, timeout_s: float = 3600.0) -> dict:
    """-> {warm_start_s, cold_start_s?, per-phase breakdowns}."""
    out = {}
    warm = _run_child(str(REPO / ".jax_cache"), seed=101, timeout_s=timeout_s)
    out["warm_start_s"] = warm["process_wall_s"]
    out["warm_start_detail"] = warm
    if include_cold:
        with tempfile.TemporaryDirectory() as cold_cache:
            cold = _run_child(cold_cache, seed=102, timeout_s=timeout_s)
        out["cold_start_s"] = cold["process_wall_s"]
        out["cold_start_detail"] = cold
    return out


def main():
    out = {"metric": "SD-2.1 512x512 time-to-first-image from process start",
           **run()}
    print(json.dumps(out))
    # record for bench.py's budget-skipped fallback (committed artifact)
    out["recorded_by"] = "builder standalone bench_cold_start.py"
    (REPO / "bench_coldstart_recorded.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2], sys.argv[3], int(sys.argv[4]))
    else:
        main()
