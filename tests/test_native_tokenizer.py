"""Native C++ tokenizer parity vs the pure-Python implementation."""

import json

import numpy as np
import pytest

from ml_stable_diffusion_tpu.tokenizer import CLIPTokenizer
from ml_stable_diffusion_tpu.tokenizer.native import (
    NativeCLIPTokenizer,
    build_native,
    load_tokenizer,
)


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocab")
    chars = list("abcdefghijklmnopqrstuvwxyz0123456789!?.,'-")
    tokens = []
    for c in chars:
        tokens.append(c)
        tokens.append(c + "</w>")
    merges = [
        ("h", "e"), ("l", "l"), ("o", "</w>"), ("he", "ll"), ("hell", "o</w>"),
        ("w", "o"), ("r", "l"), ("d", "</w>"), ("rl", "d</w>"), ("wo", "rld</w>"),
        ("c", "a"), ("t", "</w>"), ("ca", "t</w>"),
        ("'", "s"),
    ]
    for a, b in merges:
        tokens.append(a + b)
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))
    return d


@pytest.fixture(scope="module")
def native(vocab_dir):
    if build_native() is None:
        pytest.skip("native toolchain unavailable")
    return NativeCLIPTokenizer(vocab_dir / "vocab.json",
                               vocab_dir / "merges.txt")


PROMPTS = [
    "hello world",
    "a cat's hello",
    "HELLO,   World!!",
    "cat cat cat 123",
    "it's a cat? no - it isn't.",
    "",
    "x" * 200,
]


def test_native_matches_python(vocab_dir, native):
    py = CLIPTokenizer.from_pretrained_dir(vocab_dir)
    for prompt in PROMPTS:
        a, na = py.tokenize(prompt, max_length=77)
        b, nb = native.tokenize(prompt, max_length=77)
        np.testing.assert_array_equal(a, b, err_msg=repr(prompt))
        assert na == nb, prompt


def test_native_byte_level_non_ascii_matches_python(tmp_path):
    """Byte-level BPE parity on non-ASCII prompts (lowercase inputs — the
    native segmenter lowercases ASCII only, a documented divergence)."""
    if build_native() is None:
        pytest.skip("native toolchain unavailable")
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).parent))
    from test_tokenizer import _byte_level_vocab_files

    d = _byte_level_vocab_files(tmp_path)
    py = CLIPTokenizer.from_pretrained_dir(d)
    nat = NativeCLIPTokenizer(d / "vocab.json", d / "merges.txt")
    for prompt in ["héllo wörld", "une chatte élégante", "日本語 テキスト",
                   "emoji 🚀 rocket", "ééé cat", "ærøskøbing"]:
        a, na = py.tokenize(prompt, max_length=77)
        b, nb = nat.tokenize(prompt, max_length=77)
        np.testing.assert_array_equal(a, b, err_msg=repr(prompt))
        assert na == nb, prompt


def test_native_mixed_case_non_ascii_matches_python(tmp_path):
    """MIXED-CASE non-ASCII ("Ä" vs "ä") previously diverged: the C++
    segmenter lowercases ASCII only.  Non-ASCII prompts now route to the
    Python fallback inside NativeCLIPTokenizer, so the native surface is
    bit-identical to Python for every input class (reference contract:
    BPETokenizer.swift:94-98 lowercases Unicode-aware via Foundation)."""
    if build_native() is None:
        pytest.skip("native toolchain unavailable")
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).parent))
    from test_tokenizer import _byte_level_vocab_files

    d = _byte_level_vocab_files(tmp_path)
    py = CLIPTokenizer.from_pretrained_dir(d)
    nat = NativeCLIPTokenizer(d / "vocab.json", d / "merges.txt")
    for prompt in ["Ä cat", "HÉLLO Wörld", "ÆRØSKØBING", "Über Straße",
                   "ÉÉÉ mixed ASCII Tail", "ÇA VA? ça va."]:
        a, na = py.tokenize(prompt, max_length=77)
        b, nb = nat.tokenize(prompt, max_length=77)
        np.testing.assert_array_equal(a, b, err_msg=repr(prompt))
        assert na == nb, prompt
    # pure-ASCII prompts still take the native path (encode agrees and the
    # fallback object is not consulted)
    nat._fallback = None
    a, _ = py.tokenize("Hello WORLD cat", max_length=77)
    b, _ = nat.tokenize("Hello WORLD cat", max_length=77)
    np.testing.assert_array_equal(a, b)


def test_native_truncation(native):
    ids, n = native.tokenize("hello " * 100, max_length=10)
    assert ids.shape == (10,)
    assert n == 10
    assert ids[0] == native.bos_id and ids[-1] == native.eos_id


def test_native_error_on_missing_files(tmp_path):
    if build_native() is None:
        pytest.skip("native toolchain unavailable")
    with pytest.raises(RuntimeError):
        NativeCLIPTokenizer(tmp_path / "nope.json", tmp_path / "nope.txt")


def test_load_tokenizer_factory(vocab_dir):
    tok = load_tokenizer(vocab_dir)
    ids, _ = tok.tokenize("hello world")
    py = CLIPTokenizer.from_pretrained_dir(vocab_dir)
    np.testing.assert_array_equal(ids, py.tokenize("hello world")[0])
    tok_py = load_tokenizer(vocab_dir, prefer_native=False)
    assert isinstance(tok_py, CLIPTokenizer)


def test_native_image_conversion_matches_numpy():
    from ml_stable_diffusion_tpu.tokenizer.native import build_native
    if build_native() is None:
        pytest.skip("native toolchain unavailable")
    from ml_stable_diffusion_tpu.utils.native_image import (
        denormalize_to_uint8_native,
        uint8_to_float_native,
    )

    rng = np.random.RandomState(0)
    x = rng.uniform(-1.5, 1.5, size=(2, 33, 17, 3)).astype(np.float32)
    ref = (np.clip(x / 2.0 + 0.5, 0.0, 1.0) * 255.0).round().astype(np.uint8)
    out = denormalize_to_uint8_native(x)
    np.testing.assert_array_equal(out, ref)

    u = rng.randint(0, 256, size=(7, 5), dtype=np.uint8)
    f = uint8_to_float_native(u, -1.0, 1.0)
    np.testing.assert_allclose(f, u / 255.0 * 2.0 - 1.0, atol=1e-6)


def test_native_placeholder_routes_to_python(vocab_dir):
    """Textual-inversion placeholders route through the Python fallback
    (same pattern as non-ASCII) and expand identically on both paths."""
    if build_native() is None:
        pytest.skip("native toolchain unavailable")
    nat = NativeCLIPTokenizer(vocab_dir / "vocab.json",
                              vocab_dir / "merges.txt")
    py = CLIPTokenizer.from_files(vocab_dir / "vocab.json",
                                  vocab_dir / "merges.txt")
    py.add_placeholder("<thing>", [500, 501])
    nat.add_placeholder("<thing>", [500, 501])
    assert nat.encode("hello <THING> world") == py.encode(
        "hello <THING> world")
    assert [500, 501] == nat.encode("<thing>")
    # placeholder-free prompts still take the native path (parity holds)
    assert nat.encode("hello world") == py.encode("hello world")
