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
