"""Prompt attention-weight syntax tests: parser, tokenizer alignment,
mean-preserving embedding scaling, pipeline behavior."""

import numpy as np
import pytest

from ml_stable_diffusion_tpu.tokenizer.prompt_weights import (
    parse_prompt_attention,
    weighted_token_rows,
)

from helpers import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae


def test_parser_cases():
    P = parse_prompt_attention
    assert P("a cat") == [("a cat", 1.0)]
    assert P("a (cat)") == [("a ", 1.0), ("cat", 1.1)]
    assert P("((cat))") == [("cat", pytest.approx(1.21))]
    assert P("a (cat:1.5) dog") == [("a ", 1.0), ("cat", 1.5),
                                    (" dog", 1.0)]
    assert P("[cat]") == [("cat", pytest.approx(1 / 1.1))]
    assert P("(a [cat] b)") == [
        ("a ", 1.1), ("cat", pytest.approx(1.0)), (" b", 1.1)]
    assert P(r"\(literal\)") == [("(literal)", 1.0)]
    assert P("(unclosed") == [("unclosed", 1.1)]
    assert P("a:b") == [("a:b", 1.0)]  # bare colon is literal (merged)
    assert P("") == [("", 1.0)]
    # nested explicit weights multiply
    assert P("((cat:1.5):2)") == [("cat", pytest.approx(3.0))]


def test_weighted_token_rows(tmp_path):
    tok = tiny_tokenizer(tmp_path)
    plain, _ = tok.tokenize("a cat sat", max_length=77)
    ids, w, any_w = weighted_token_rows(tok, "a (cat:1.5) sat", 77)
    assert any_w
    np.testing.assert_array_equal(np.asarray(ids), plain)
    w = np.asarray(w)
    cat_ids = tok.encode("cat")
    a_ids = tok.encode("a ")
    lo = 1 + len(a_ids)
    assert (w[lo:lo + len(cat_ids)] == 1.5).all()
    assert w[0] == 1.0 and (w[lo + len(cat_ids):] == 1.0).all()
    # explicit 1.0 weight is recognized as unweighted
    ids2, _, any2 = weighted_token_rows(tok, "a (cat:1.0) sat", 77)
    assert not any2
    np.testing.assert_array_equal(np.asarray(ids2), plain)


def test_apply_prompt_weights_mean_preserved():
    import jax.numpy as jnp

    from ml_stable_diffusion_tpu.pipelines.sd import apply_prompt_weights

    rng = np.random.default_rng(0)
    ctx = rng.normal(size=(2, 8, 6)).astype(np.float32) + 0.3
    w = np.ones((2, 8), np.float32)
    w[0, 2:4] = 1.7
    out = np.asarray(apply_prompt_weights(jnp.asarray(ctx), jnp.asarray(w)))
    # per-row tensor mean preserved
    np.testing.assert_allclose(out.mean(axis=(1, 2)), ctx.mean(axis=(1, 2)),
                               rtol=1e-5)
    # unweighted row is untouched up to the (unit) renorm
    np.testing.assert_allclose(out[1], ctx[1], rtol=1e-5)
    # weighted tokens move
    assert np.abs(out[0, 2] - ctx[0, 2]).max() > 1e-3


def test_pipeline_prompt_weighting(tmp_path):
    from ml_stable_diffusion_tpu.pipelines import (
        PipelineConfiguration,
        StableDiffusionPipeline,
    )

    dec, enc = tiny_vae()
    pipe = StableDiffusionPipeline(
        tokenizer=tiny_tokenizer(tmp_path), text_encoder=tiny_text_encoder(),
        unet=tiny_unet(), vae_decoder=dec, vae_encoder=enc)
    cfg = lambda p: PipelineConfiguration(prompt=p, step_count=2, seed=4,
                                          disable_safety=True)
    base = pipe.generate_images(cfg("a cat sat"), image_hw=(64, 64)).latents
    # explicit-1.0 weights are a bit-exact no-op (no weights input at all)
    one = pipe.generate_images(cfg("a (cat:1.0) sat"),
                               image_hw=(64, 64)).latents
    np.testing.assert_array_equal(base, one)
    up = pipe.generate_images(cfg("a (cat:1.6) sat"),
                              image_hw=(64, 64)).latents
    down = pipe.generate_images(cfg("a [cat] sat"),
                                image_hw=(64, 64)).latents
    assert np.abs(up - base).max() > 1e-6
    assert np.abs(down - base).max() > 1e-6
    assert np.abs(up - down).max() > 1e-6


def test_weighted_token_chunks(tmp_path):
    from ml_stable_diffusion_tpu.tokenizer.prompt_weights import (
        weighted_token_chunks,
        weighted_token_rows,
    )

    tok = tiny_tokenizer(tmp_path)
    # single window: bit-identical to the row form
    ids, w, aw = weighted_token_chunks(tok, "a (cat:1.5) sat", 77)
    row_ids, row_w, row_aw = weighted_token_rows(tok, "a (cat:1.5) sat", 77)
    assert ids.shape == (1, 77)
    np.testing.assert_array_equal(ids[0], row_ids)
    np.testing.assert_array_equal(w[0], row_w)
    assert aw == row_aw
    # long prompt spans windows, each with its own BOS/EOS
    long = " ".join("abcdefghij" for _ in range(20))  # ~200 tokens
    ids, w, _ = weighted_token_chunks(tok, long, 77)
    assert ids.shape[0] >= 2
    assert (ids[:, 0] == tok.bos_id).all()
    for r in ids:
        assert tok.eos_id in r
    # capped at max_chunks windows
    very_long = " ".join("abcdefghij" for _ in range(200))
    ids, _, _ = weighted_token_chunks(tok, very_long, 77, max_chunks=3)
    assert ids.shape[0] == 3


def test_pipeline_long_prompt(tmp_path):
    from ml_stable_diffusion_tpu.pipelines import (
        PipelineConfiguration,
        StableDiffusionPipeline,
    )

    dec, enc = tiny_vae()
    pipe = StableDiffusionPipeline(
        tokenizer=tiny_tokenizer(tmp_path), text_encoder=tiny_text_encoder(),
        unet=tiny_unet(), vae_decoder=dec, vae_encoder=enc)
    cfg = lambda p, **kw: PipelineConfiguration(
        prompt=p, step_count=2, seed=4, disable_safety=True, **kw)
    words = ["cat", "dog", "fox", "owl", "bat", "elk", "hen", "ram"]
    long = " ".join(words[i % len(words)] for i in range(90))  # > 75 tokens
    r = pipe.generate_images(cfg(long), image_hw=(64, 64))
    assert np.isfinite(r.latents).all()
    # the tail beyond 77 tokens actually conditions the image: perturbing
    # only the tail changes the output (a truncating implementation cannot)
    tail_changed = long.rsplit(" ", 8)[0] + " owl owl owl owl owl owl owl owl"
    r2 = pipe.generate_images(cfg(tail_changed), image_hw=(64, 64))
    assert np.abs(r.latents - r2.latents).max() > 1e-6
    # mixed batch: a short negative prompt pads with empty windows
    r3 = pipe.generate_images(cfg(long, negative_prompt="dog"),
                              image_hw=(64, 64))
    assert np.isfinite(r3.latents).all()
    assert np.abs(r3.latents - r.latents).max() > 1e-6


@pytest.mark.slow
def test_sdxl_long_prompt_dual_encoders(tmp_path):
    """Both SDXL encoders run over the same window count; pooled
    conditioning comes from the first window."""
    import jax
    import jax.numpy as jnp

    from ml_stable_diffusion_tpu.models.unet import (
        UNetConfig,
        UNet2DConditionModel,
    )
    from ml_stable_diffusion_tpu.pipelines import (
        PipelineConfiguration,
        StableDiffusionXLPipeline,
    )

    from helpers import CTX_DIM

    (tmp_path / "t1").mkdir()
    (tmp_path / "t2").mkdir()
    cfg_u = UNetConfig(
        block_out_channels=(16, 32),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, transformer_layers_per_block=(1, 1),
        num_attention_heads=(2, 2), cross_attention_dim=2 * CTX_DIM,
        norm_num_groups=8, addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=32 + 6 * 8)
    unet = UNet2DConditionModel(cfg_u)
    added = {"text_embeds": jnp.zeros((1, 32)), "time_ids": jnp.zeros((1, 6))}
    u_p = jax.jit(lambda k: unet.init(
        k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 2 * CTX_DIM)), added_cond=added))(
            jax.random.key(1))["params"]
    dec, enc = tiny_vae()
    pipe = StableDiffusionXLPipeline(
        tokenizer=tiny_tokenizer(tmp_path / "t1"),
        tokenizer2=tiny_tokenizer(tmp_path / "t2"),
        text_encoder=tiny_text_encoder(),
        text_encoder2=tiny_text_encoder(use_projection=True),
        unet=(unet, u_p), vae_decoder=dec, vae_encoder=enc)
    long = " ".join("cat dog fox owl" for _ in range(30))
    r = pipe.generate_images(PipelineConfiguration(
        prompt=long, step_count=2, seed=3, disable_safety=True,
        scheduler="DDIM"), image_hw=(64, 64))
    assert np.isfinite(r.latents).all()
