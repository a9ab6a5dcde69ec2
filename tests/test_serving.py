"""Serving facade tests: precompile, concurrent requests, stats."""

import concurrent.futures

import numpy as np

from ml_stable_diffusion_tpu.pipelines import PipelineConfiguration
from ml_stable_diffusion_tpu.pipelines.sd import StableDiffusionPipeline
from ml_stable_diffusion_tpu.serving import GenerationServer, ServeConfig

from helpers import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae


def test_serving_precompile_and_concurrent_requests(tmp_path):
    tok = tiny_tokenizer(tmp_path)
    dec, _ = tiny_vae()
    pipe = StableDiffusionPipeline(tokenizer=tok,
                                   text_encoder=tiny_text_encoder(),
                                   unet=tiny_unet(), vae_decoder=dec)
    server = GenerationServer(pipe, [
        ServeConfig(image_hw=(64, 64), step_count=2, scheduler="DDIM")])
    server.precompile()

    def req(seed):
        return server.generate(
            PipelineConfiguration(prompt="a cat", seed=seed, step_count=2,
                                  scheduler="DDIM", disable_safety=True),
            image_hw=(64, 64))

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(req, range(4)))
    assert len(results) == 4
    for r in results:
        assert np.isfinite(r.latents).all()
    # distinct seeds -> distinct outputs
    assert np.abs(results[0].latents - results[1].latents).max() > 1e-6

    stats = server.stats()
    assert stats["requests_served"] == 4
    assert stats["e2e_latency_median_s"] > 0


def _tiny_pipe(tmp_path):
    tok = tiny_tokenizer(tmp_path)
    dec, enc = tiny_vae()
    return StableDiffusionPipeline(tokenizer=tok,
                                   text_encoder=tiny_text_encoder(),
                                   unet=tiny_unet(), vae_decoder=dec,
                                   vae_encoder=enc)


def test_multi_prompt_batch_matches_singles(tmp_path):
    """One batched program with per-image prompts+seeds must reproduce each
    request's single-image generation (the contract dynamic batching
    relies on)."""
    pipe = _tiny_pipe(tmp_path)

    def single(prompt, seed):
        return pipe.generate_images(PipelineConfiguration(
            prompt=prompt, seed=seed, step_count=3, scheduler="DDIM",
            disable_safety=True), image_hw=(64, 64)).latents

    a = single("a cat", 7)
    b = single("a dog on a hill", 11)
    batched = pipe.generate_images(PipelineConfiguration(
        prompt=["a cat", "a dog on a hill"], seed=[7, 11], image_count=2,
        step_count=3, scheduler="DDIM", disable_safety=True),
        image_hw=(64, 64)).latents
    np.testing.assert_allclose(batched[0:1], a, atol=2e-4)
    np.testing.assert_allclose(batched[1:2], b, atol=2e-4)
    # ancestral scheduler: per-seed step noise streams
    a2 = single("a cat", 7)  # warm cache irrelevant; just check finite path
    anc = pipe.generate_images(PipelineConfiguration(
        prompt=["a cat", "a dog"], seed=[7, 11], image_count=2,
        step_count=3, scheduler="EulerAncestral", disable_safety=True),
        image_hw=(64, 64)).latents
    assert np.isfinite(anc).all()
    assert np.abs(anc[0] - anc[1]).max() > 1e-6


def test_multi_prompt_validation(tmp_path):
    pipe = _tiny_pipe(tmp_path)
    import pytest

    with pytest.raises(ValueError, match="image_count"):
        pipe.generate_images(PipelineConfiguration(
            prompt=["a", "b"], image_count=3, step_count=1,
            disable_safety=True), image_hw=(64, 64))
    with pytest.raises(ValueError, match="seed list"):
        pipe.generate_images(PipelineConfiguration(
            prompt="a", seed=[1, 2, 3], image_count=2, step_count=1,
            disable_safety=True), image_hw=(64, 64))


def test_dynamic_batching_coalesces_and_matches(tmp_path):
    """Concurrent submits with compatible shapes run as ONE batched program
    and each future's result matches its direct generation."""
    pipe = _tiny_pipe(tmp_path)
    server = GenerationServer(pipe, max_batch=4, batch_window_s=1.0)

    def cfg(prompt, seed):
        return PipelineConfiguration(prompt=prompt, seed=seed, step_count=2,
                                     scheduler="DDIM", disable_safety=True)

    futs = [server.submit(cfg(p, s), image_hw=(64, 64))
            for p, s in [("a cat", 1), ("a dog", 2), ("a fish", 3)]]
    results = [f.result(timeout=600) for f in futs]
    assert server.batches_run == 1
    assert server.requests_served == 3
    for r in results:
        assert len(r.images) == 1 and r.latents.shape[0] == 1

    direct = pipe.generate_images(cfg("a dog", 2), image_hw=(64, 64))
    np.testing.assert_allclose(results[1].latents, direct.latents, atol=2e-4)

    # incompatible request (img2img) falls back to the direct path
    img = np.zeros((1, 64, 64, 3), np.float32)
    f = server.submit(PipelineConfiguration(
        prompt="x", seed=5, step_count=2, scheduler="DDIM",
        disable_safety=True, starting_image=img, strength=0.5),
        image_hw=(64, 64))
    assert np.isfinite(f.result(timeout=600).latents).all()
    server.shutdown()


def test_submit_nonblocking_for_nonbatchable(tmp_path):
    """Non-batchable submissions (img2img/controlnet/multi-image) must not
    execute on the caller's thread: submit returns before the generation
    completes and the Future resolves to the result (VERDICT r2 next #10)."""
    import threading
    import time as _time

    class SlowPipe:
        def __init__(self):
            self.started = threading.Event()
            self.release = threading.Event()
            self.calls = []

        def generate_images(self, cfg, image_hw=(64, 64), **kw):
            self.started.set()
            assert self.release.wait(10.0)
            self.calls.append(cfg)
            from ml_stable_diffusion_tpu.pipelines.sd import GenerationResult
            return GenerationResult(images=[None], latents=np.zeros((1, 2)),
                                    nsfw_flags=[False], seconds_per_step=0.0)

    pipe = SlowPipe()
    server = GenerationServer(pipe)
    # multi-image request -> non-batchable path
    t0 = _time.monotonic()
    fut = server.submit(PipelineConfiguration(prompt="a cat", image_count=2,
                                              step_count=2,
                                              disable_safety=True))
    submit_elapsed = _time.monotonic() - t0
    assert submit_elapsed < 1.0  # returned before generation ran
    assert pipe.started.wait(10.0)  # the worker picked it up
    assert not fut.done()
    pipe.release.set()
    res = fut.result(timeout=10.0)
    assert res.latents.shape == (1, 2)
    assert server.stats()["requests_served"] == 1
    server.shutdown()


def test_lcm_dynamic_batching_production_config(tmp_path):
    """The advertised production pairing — LCM few-step serving under
    dynamic batching: an LCM ServeConfig precompiles, concurrent LCM
    requests coalesce into ONE batched program, and each future matches
    its direct generation (LCM's per-step re-noising must respect
    per-image seed streams through the merge)."""
    pipe = _tiny_pipe(tmp_path)
    server = GenerationServer(pipe, [
        ServeConfig(image_hw=(64, 64), step_count=4, scheduler="LCM",
                    guidance_scale=1.0)], max_batch=4, batch_window_s=1.0)
    server.precompile(batch_sizes=(1, 3))

    def cfg(prompt, seed):
        return PipelineConfiguration(prompt=prompt, seed=seed, step_count=4,
                                     scheduler="LCM", guidance_scale=1.0,
                                     disable_safety=True)

    futs = [server.submit(cfg(p, s), image_hw=(64, 64))
            for p, s in [("a cat", 11), ("a dog", 12), ("a fish", 13)]]
    results = [f.result(timeout=600) for f in futs]
    assert server.batches_run == 1
    assert server.requests_served == 3

    direct = pipe.generate_images(cfg("a dog", 12), image_hw=(64, 64))
    np.testing.assert_allclose(results[1].latents, direct.latents, atol=2e-4)
    server.shutdown()


def test_serve_preset_w8a8_deepcache_batching_compose(tmp_path):
    """The max-throughput serving preset (bench.py bench_serve_preset):
    W8A8 int8 serving + DeepCache interval + dynamic batching all trace
    into ONE merged program and match... themselves deterministically per
    seed, with per-request results finite and batch-coalesced."""
    pipe = _tiny_pipe(tmp_path)
    pipe.enable_w8a8(min_size=1)  # quantize even tiny layers in this fixture
    sc = ServeConfig(image_hw=(64, 64), step_count=4, scheduler="DDIM",
                     deepcache_interval=2)
    server = GenerationServer(pipe, [sc], max_batch=4, batch_window_s=0.2)
    try:
        server.precompile(batch_sizes=(4,))

        def cfg(seed, prompt):
            return PipelineConfiguration(
                prompt=prompt, seed=seed, step_count=4, scheduler="DDIM",
                deepcache_interval=2, disable_safety=True)

        futs = [server.submit(cfg(10 + i, p), image_hw=(64, 64))
                for i, p in enumerate(["a cat", "a dog", "a fox", "a bee"])]
        results = [f.result(timeout=300) for f in futs]
        for r in results:
            assert np.isfinite(r.latents).all()
        assert server.batches_run >= 1  # actually coalesced

        # per-seed reproducibility through the composed path: resubmitting
        # the same request reproduces its latents (the lone resubmission
        # runs as a batch-1 program, so XLA batch-dependent fusion allows
        # float-level differences vs the merged batch-4 program)
        again = server.submit(cfg(10, "a cat"), image_hw=(64, 64)).result(
            timeout=300)
        np.testing.assert_allclose(again.latents, results[0].latents,
                                   rtol=1e-3, atol=1e-3)
    finally:
        server.shutdown()


def test_enable_w8a8_does_not_mutate_caller_tree(tmp_path):
    """enable_w8a8 removes quantized kernels from ITS OWN params tree only:
    a caller-shared tree must keep every kernel (r5 bug: the bench rigs
    share one tree across pipelines; in-place deletion corrupted every
    downstream consumer)."""
    import jax

    from helpers import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae

    model, params = tiny_unet()
    before = {"/".join(str(k.key) for k in p)
              for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    dec, _ = tiny_vae()
    pipe = StableDiffusionPipeline(tokenizer=tiny_tokenizer(tmp_path),
                                   text_encoder=tiny_text_encoder(),
                                   unet=(model, params), vae_decoder=dec)
    pipe.enable_w8a8(min_size=1)
    assert pipe.int8_weights  # something actually quantized
    after = {"/".join(str(k.key) for k in p)
             for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert after == before  # caller's tree untouched
