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
