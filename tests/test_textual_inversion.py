"""Textual-inversion tests: file-format parsing, tokenizer placeholder
expansion, embedding-table extension, and an exact word-equivalence oracle
(a placeholder whose vectors COPY a real word's embedding rows must
generate the identical image)."""

import numpy as np
import pytest

from ml_stable_diffusion_tpu.convert.textual_inversion import (
    extend_token_embedding,
    load_ti_embedding,
)
from ml_stable_diffusion_tpu.convert.native_io import save_file
from ml_stable_diffusion_tpu.pipelines import (
    PipelineConfiguration,
    StableDiffusionPipeline,
)

from helpers import CTX_DIM, tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae

HW = (64, 64)


def test_load_formats(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(3, 48)).astype(np.float32)

    # kohya/a1111 safetensors {"emb_params": ...}
    p = tmp_path / "emb.safetensors"
    save_file({"emb_params": arr}, p)
    data, name = load_ti_embedding(p)
    np.testing.assert_array_equal(data["clip_l"], arr)
    assert name is None

    # SDXL dual {"clip_l", "clip_g"}
    g = rng.normal(size=(3, 64)).astype(np.float32)
    p2 = tmp_path / "dual.safetensors"
    save_file({"clip_l": arr, "clip_g": g}, p2)
    data, _ = load_ti_embedding(p2)
    assert set(data) == {"clip_l", "clip_g"}

    # diffusers single {token: tensor}
    p3 = tmp_path / "diff.safetensors"
    save_file({"<thing>": arr}, p3)
    data, name = load_ti_embedding(p3)
    assert name == "<thing>"
    np.testing.assert_array_equal(data["clip_l"], arr)

    # a1111 .pt pickle
    torch = pytest.importorskip("torch")
    p4 = tmp_path / "a1111.pt"
    torch.save({"string_to_param": {"*": torch.from_numpy(arr)},
                "name": "<style>"}, p4)
    data, name = load_ti_embedding(p4)
    assert name == "<style>"
    np.testing.assert_allclose(data["clip_l"], arr)

    # raw array + 1-d promotion
    data, _ = load_ti_embedding(arr[0])
    assert data["clip_l"].shape == (1, 48)

    # mismatched dual counts rejected
    with pytest.raises(ValueError, match="differ"):
        load_ti_embedding({"clip_l": arr, "clip_g": g[:2]})


def test_tokenizer_placeholder_expansion(tmp_path):
    tok = tiny_tokenizer(tmp_path)
    base = tok.encode("a cat")
    tok.add_placeholder("<thing>", [1000, 1001, 1002])
    ids = tok.encode("a <THING> cat")  # case-insensitive
    assert ids[:1] == base[:1]
    assert [1000, 1001, 1002] == ids[1:4]
    assert ids[4:] == base[1:]
    # unrelated text unchanged
    assert tok.encode("a cat") == base
    # longest-first matching when one placeholder prefixes another
    tok.add_placeholder("<thing>x", [1010])
    assert tok.encode("<thing>x")[:1] == [1010]


def test_extend_token_embedding_shapes():
    model, params = tiny_text_encoder()
    rows = np.random.default_rng(1).normal(size=(2, CTX_DIM)).astype(np.float32)
    m2, p2 = extend_token_embedding(model, params, rows)
    assert m2.config.vocab_size == model.config.vocab_size + 2
    assert (p2["token_embedding"]["embedding"].shape[0]
            == params["token_embedding"]["embedding"].shape[0] + 2)
    with pytest.raises(ValueError, match="hidden size"):
        extend_token_embedding(model, params, rows[:, :10])


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    tok = tiny_tokenizer(tmp_path_factory.mktemp("tok"))
    dec, enc = tiny_vae()
    return StableDiffusionPipeline(
        tokenizer=tok, text_encoder=tiny_text_encoder(), unet=tiny_unet(),
        vae_decoder=dec, vae_encoder=enc)


def _cfg(prompt):
    return PipelineConfiguration(prompt=prompt, step_count=2, seed=9,
                                 disable_safety=True)


def test_pipeline_ti_word_equivalence_oracle(pipe):
    """A placeholder whose vectors copy the embedding rows of the word
    "dog" must produce EXACTLY the same latents as typing "dog"."""
    before = pipe.generate_images(_cfg("a cat"), image_hw=HW).latents
    word_ids = pipe.tokenizer.encode("dog")
    table = np.asarray(pipe.text_encoder_params["token_embedding"]["embedding"])
    rows = table[np.asarray(word_ids)]
    ids = pipe.load_textual_inversion(rows, token="<pup>")
    assert ids == list(range(table.shape[0], table.shape[0] + len(word_ids)))
    assert pipe.textual_inversions == [("<pup>", len(word_ids))]

    a = pipe.generate_images(_cfg("a <pup> on mars"), image_hw=HW).latents
    b = pipe.generate_images(_cfg("a dog on mars"), image_hw=HW).latents
    np.testing.assert_array_equal(a, b)

    # prompts without the placeholder are untouched by the table extension
    after = pipe.generate_images(_cfg("a cat"), image_hw=HW).latents
    np.testing.assert_array_equal(before, after)

    # and the placeholder changes the output vs the base prompt
    assert np.abs(a - pipe.generate_images(_cfg("a on mars"),
                                           image_hw=HW).latents).max() > 1e-6


def test_pipeline_ti_multiple_and_file(pipe, tmp_path):
    rng = np.random.default_rng(2)
    p = tmp_path / "style.safetensors"
    save_file({"emb_params":
               rng.normal(size=(2, CTX_DIM)).astype(np.float32) * 0.02}, p)
    ids = pipe.load_textual_inversion(p)  # token defaults to <style>
    assert ("<style>", 2) in pipe.textual_inversions
    x = pipe.generate_images(_cfg("a <style> cat"), image_hw=HW).latents
    y = pipe.generate_images(_cfg("a cat"), image_hw=HW).latents
    assert np.abs(x - y).max() > 1e-6
    assert ids[0] >= 1000


def test_sdxl_requires_both_encoders(tmp_path):
    from ml_stable_diffusion_tpu.pipelines import StableDiffusionXLPipeline

    dec, enc = tiny_vae()
    (tmp_path / "t1").mkdir()
    (tmp_path / "t2").mkdir()
    xl = StableDiffusionXLPipeline(
        tokenizer=tiny_tokenizer(tmp_path / "t1"),
        tokenizer2=tiny_tokenizer(tmp_path / "t2"),
        text_encoder=tiny_text_encoder(),
        text_encoder2=tiny_text_encoder(use_projection=True),
        unet=tiny_unet(xl=True), vae_decoder=dec, vae_encoder=enc)
    rows = np.zeros((1, CTX_DIM), np.float32)
    with pytest.raises(ValueError, match="clip_g"):
        xl.load_textual_inversion(rows, token="<x>")
    # dual-layout embedding loads into both encoders
    xl.load_textual_inversion({"clip_l": rows, "clip_g": rows},
                              token="<y>")
    assert xl.text_encoder.config.vocab_size == 1001
    assert xl.text_encoder2.config.vocab_size == 1001
    assert "<y>" in xl.tokenizer2.added_placeholders
