"""T5 tokenizer: HF ``tokenizer.json`` (fast-tokenizer format) with a native
C++ unigram fast path.

Replaces the reference's swift-transformers T5 tokenizer loading
(T5Tokenizer.swift:12-20, TextEncoderT5.swift:83-97: EOS/pad handling +
attention mask construction).  Segmentation itself runs through the native
Viterbi tokenizer (native/unigram/unigram_tokenizer.cpp) for the dominant
plain-ASCII serving case — the same "native where hot, Python where exotic"
posture as the CLIP BPE tokenizer (tokenizer/native.py):

- native-eligible: printable ASCII, single-spaced, no embedded special
  tokens.  On this subset T5's Precompiled (nmt_nfkc) normalizer is the
  identity, so skipping it is exact.
- everything else (non-ASCII needing charsmap normalization, doubled or
  leading/trailing spaces the normalizer would touch, literal "</s>" in the
  prompt, vocab-uncoverable characters) routes to the HF tokenizer for
  bit-identical output.
- at load, the native encoder is self-checked against the HF tokenizer on a
  probe corpus; any mismatch disables the native path for this process.
"""

from __future__ import annotations

import ctypes
import json
import logging
import struct
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = Path(__file__).resolve().parents[2]
_LIB_PATH = _REPO_ROOT / "native" / "build" / "libsdtpu_unigram.so"

_PROBES = (
    "a photo of an astronaut riding a horse on mars",
    "hello world",
    "the quick brown fox jumps over the lazy dog.",
    "8k, highly detailed, trending on artstation!",
    "one, two; three: four-five (six) 'seven'",
    "a",
    "",
    "watercolor? masterpiece... 1girl 4k",
)


def _load_lib():
    from .native import build_native

    if not _LIB_PATH.exists() and build_native() is None:
        raise RuntimeError("native unigram library unavailable")
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.sdtpu_unigram_create.restype = ctypes.c_void_p
    lib.sdtpu_unigram_create.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                         ctypes.c_int32]
    lib.sdtpu_unigram_error.restype = ctypes.c_char_p
    lib.sdtpu_unigram_error.argtypes = [ctypes.c_void_p]
    lib.sdtpu_unigram_destroy.argtypes = [ctypes.c_void_p]
    lib.sdtpu_unigram_encode.restype = ctypes.c_int32
    lib.sdtpu_unigram_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                         ctypes.POINTER(ctypes.c_int32),
                                         ctypes.c_int32]
    return lib


class _NativeUnigram:
    """ctypes wrapper over the C++ Viterbi unigram encoder.

    ``encode`` returns None when the native path cannot produce the
    bit-identical answer (uncoverable chunk) — callers fall back."""

    def __init__(self, vocab: list, special_tokens: list[str]):
        self._lib = _load_lib()
        blob = bytearray()
        for piece, score in vocab:
            raw = piece.encode("utf-8")
            blob += struct.pack("<I", len(raw)) + raw
            blob += struct.pack("<d", float(score))
        self._blob = bytes(blob)  # keep alive
        self._handle = self._lib.sdtpu_unigram_create(
            self._blob, len(self._blob), len(vocab))
        err = self._lib.sdtpu_unigram_error(self._handle)
        if err:
            raise RuntimeError(f"native unigram: {err.decode()}")
        self._specials = tuple(special_tokens)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.sdtpu_unigram_destroy(self._handle)
            self._handle = None

    def eligible(self, text: str) -> bool:
        return (text.isascii()
                and (text == "" or text.isprintable())
                and "  " not in text
                and text == text.strip()
                and not any(s in text for s in self._specials))

    def encode(self, text: str) -> list[int] | None:
        if not text:
            return []  # HF: empty pre-tokenization yields no pieces
        buf = (ctypes.c_int32 * 1024)()
        n = self._lib.sdtpu_unigram_encode(self._handle, text.encode("utf-8"),
                                           buf, 1024)
        if n < 0:
            return None
        return list(buf[:n])


def _try_native(spec: dict) -> _NativeUnigram | None:
    """Build the native encoder iff the tokenizer.json matches the contract
    the C++ implements: Unigram model + Metaspace(U+2581, prepend=always,
    split) pre-tokenizer."""
    model = spec.get("model") or {}
    pre = spec.get("pre_tokenizer") or {}
    if model.get("type") != "Unigram" or model.get("byte_fallback"):
        return None
    scheme = pre.get("prepend_scheme",
                     "always" if pre.get("add_prefix_space", True) else "never")
    if (pre.get("type") != "Metaspace" or pre.get("replacement") != "▁"
            or scheme != "always" or pre.get("split", True) is not True):
        return None
    specials = [t["content"] for t in spec.get("added_tokens", [])]
    try:
        return _NativeUnigram(model["vocab"], specials)
    except (RuntimeError, OSError) as e:
        logger.info("native unigram unavailable: %s", e)
        return None


class T5Tokenizer:
    def __init__(self, tokenizer_json: str | Path, eos_id: int = 1,
                 pad_id: int = 0, prefer_native: bool = True):
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(str(tokenizer_json))
        self.eos_id = eos_id
        self.pad_id = pad_id
        self._native = None
        if prefer_native:
            spec = json.loads(Path(tokenizer_json).read_text())
            native = _try_native(spec)
            if native is not None and self._self_check(native):
                self._native = native

    def _self_check(self, native: _NativeUnigram) -> bool:
        """Disable the native path unless it is bit-identical to the HF
        tokenizer on the probe corpus (guards e.g. score tie-breaking or a
        normalizer that is not the identity on ASCII)."""
        for text in _PROBES:
            got = native.encode(text) if native.eligible(text) else None
            if got is None:
                continue
            want = self._tok.encode(text, add_special_tokens=False).ids
            if got != want:
                logger.warning(
                    "native unigram self-check mismatch on %r (%s != %s); "
                    "using HF tokenizer", text, got, want)
                return False
        return True

    def encode(self, text: str) -> list[int]:
        """Segment (no EOS/padding) — native fast path when eligible."""
        if self._native is not None and self._native.eligible(text):
            ids = self._native.encode(text)
            if ids is not None:
                return ids
        return self._tok.encode(text, add_special_tokens=False).ids

    def tokenize(self, text: str, max_length: int = 77):
        """-> (ids[max_length] int32, attention_mask[max_length] int32).

        Truncates so EOS survives, pads with pad_id, mask covers real tokens
        incl. EOS (reference TextEncoderT5.swift:83-97)."""
        ids = self.encode(text)
        ids = ids[: max_length - 1] + [self.eos_id]
        mask = [1] * len(ids)
        pad = max_length - len(ids)
        ids = ids + [self.pad_id] * pad
        mask = mask + [0] * pad
        return (np.asarray(ids, dtype=np.int32),
                np.asarray(mask, dtype=np.int32))
