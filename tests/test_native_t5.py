"""Native C++ unigram (T5) tokenizer parity vs the HF fast tokenizer.

The native path must be bit-identical to ``tokenizers`` on everything it
accepts, and must route everything else (non-ASCII, normalizer-sensitive
spacing, embedded special tokens, uncoverable chars) to the HF fallback.
"""

import json

import numpy as np
import pytest

from ml_stable_diffusion_tpu.tokenizer.native import build_native
from ml_stable_diffusion_tpu.tokenizer.t5 import T5Tokenizer, _try_native


def _unigram_json(tmp_path, extra_pieces=(), drop_meta=False):
    vocab = [["<pad>", 0.0], ["</s>", 0.0], ["<unk>", 0.0]]
    pieces = ["▁", "▁the", "▁a", "the", "he", "h", "e", "t", "a", "l", "o",
              "▁hello", "hello", "ll", "lo", "▁cat", "cat", "c", "s", "'",
              "'s", ".", ",", "!", "?", "w", "r", "d", "▁world", "wor",
              "ld", "1", "2", "3", "é", "caf", "i", "n", "g", "ing",
              "▁run", "run", "u", "m", "p", "b", "f", "k", "x", "y", "z",
              "v", "j", "q", "-", ":", ";", "(", ")", "0", "4", "5", "6",
              "7", "8", "9", "▁photo", "▁of", "▁an", "horse", "▁on",
              "mars", "astronaut", "ridi", "ng</x>"]
    pieces += list(extra_pieces)
    if drop_meta:
        pieces.remove("▁")
    for i, p in enumerate(dict.fromkeys(pieces)):
        vocab.append([p, -1.0 - 0.1 * (i % 7) - 0.01 * len(p)])
    spec = {
        "version": "1.0",
        "added_tokens": [
            {"id": 0, "content": "<pad>", "single_word": False,
             "lstrip": False, "rstrip": False, "normalized": False,
             "special": True},
            {"id": 1, "content": "</s>", "single_word": False,
             "lstrip": False, "rstrip": False, "normalized": False,
             "special": True},
            {"id": 2, "content": "<unk>", "single_word": False,
             "lstrip": False, "rstrip": False, "normalized": False,
             "special": True},
        ],
        "normalizer": None,
        "pre_tokenizer": {"type": "Metaspace", "replacement": "▁",
                          "prepend_scheme": "always", "split": True},
        "post_processor": None,
        "decoder": {"type": "Metaspace", "replacement": "▁",
                    "prepend_scheme": "always", "split": True},
        "model": {"type": "Unigram", "unk_id": 2, "vocab": vocab,
                  "byte_fallback": False},
    }
    p = tmp_path / "tokenizer.json"
    p.write_text(json.dumps(spec))
    return p


@pytest.fixture(scope="module")
def tok_path(tmp_path_factory):
    if build_native() is None:
        pytest.skip("native toolchain unavailable")
    return _unigram_json(tmp_path_factory.mktemp("t5tok"))


PROMPTS = [
    "hello world",
    "the cat's hello.",
    "a photo of an astronaut riding a horse on mars",
    "running, jumping! why? (parens) semi;colon: d-a-s-h",
    "123 456 7890",
    "a",
    "",
    "x",
]


def test_native_engages_and_matches_hf(tok_path):
    tok = T5Tokenizer(tok_path)
    assert tok._native is not None, "native unigram should engage"
    from tokenizers import Tokenizer

    hf = Tokenizer.from_file(str(tok_path))
    for text in PROMPTS:
        assert tok._native.eligible(text), text
        got = tok._native.encode(text)
        want = hf.encode(text, add_special_tokens=False).ids
        assert got == want, (text, got, want)


def test_fallback_routing(tok_path):
    tok = T5Tokenizer(tok_path)
    native = tok._native
    # non-ASCII, double spaces, leading/trailing space, special token in
    # text: all normalizer- or added-token-sensitive -> not eligible
    for text in ["café au lait", "double  space", " lead", "trail ",
                 "tab\tchar", "end</s>now"]:
        assert not native.eligible(text), text
    # but encode() still answers (via HF) and matches HF exactly
    from tokenizers import Tokenizer

    hf = Tokenizer.from_file(str(tok_path))
    for text in ["café au lait", "double  space", "end</s>now"]:
        assert tok.encode(text) == hf.encode(
            text, add_special_tokens=False).ids


def test_uncoverable_returns_fallback(tok_path, tmp_path):
    # '~' has no piece: native returns None, T5Tokenizer falls back to HF
    # (which emits unk) — results still match HF bit-for-bit
    tok = T5Tokenizer(tok_path)
    assert tok._native.eligible("~")
    assert tok._native.encode("~") is None
    from tokenizers import Tokenizer

    hf = Tokenizer.from_file(str(tok_path))
    assert tok.encode("a ~ b") == hf.encode(
        "a ~ b", add_special_tokens=False).ids


def test_self_check_disables_on_mismatch(tok_path, monkeypatch):
    # corrupt the native answer: the load-time self-check must refuse it
    from ml_stable_diffusion_tpu.tokenizer import t5 as t5mod

    real_encode = t5mod._NativeUnigram.encode

    def bad_encode(self, text):
        ids = real_encode(self, text)
        return None if ids is None else ids + [0]

    monkeypatch.setattr(t5mod._NativeUnigram, "encode", bad_encode)
    tok = T5Tokenizer(tok_path)
    assert tok._native is None


def test_contract_gate_rejects_other_configs(tmp_path):
    # BPE-model spec -> no native (contract is Unigram+Metaspace only)
    spec = {"model": {"type": "BPE"}, "pre_tokenizer": {"type": "Metaspace"}}
    assert _try_native(spec) is None
    spec = {"model": {"type": "Unigram", "vocab": []},
            "pre_tokenizer": {"type": "Whitespace"}}
    assert _try_native(spec) is None


def test_tokenize_eos_pad_mask(tok_path):
    tok = T5Tokenizer(tok_path)
    ids, mask = tok.tokenize("hello world", max_length=8)
    assert ids.dtype == np.int32 and mask.dtype == np.int32
    n = int(mask.sum())
    assert ids[n - 1] == tok.eos_id
    assert (ids[n:] == tok.pad_id).all()
    # truncation keeps EOS
    ids2, mask2 = tok.tokenize(" ".join(["hello"] * 30), max_length=8)
    assert int(mask2.sum()) == 8 and ids2[-1] == tok.eos_id
