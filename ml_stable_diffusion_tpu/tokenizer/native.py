"""ctypes binding for the native C++ BPE tokenizer (native/bpe).

Mirrors the reference's native tokenizer (Swift BPETokenizer.swift) for
high-throughput serving.  ``load_tokenizer`` prefers the native library and
transparently falls back to the pure-Python implementation.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = Path(__file__).resolve().parents[2]
_LIB_PATH = _REPO_ROOT / "native" / "build" / "libsdtpu_bpe.so"


def build_native(force: bool = False) -> Path | None:
    """Build the native library with make; returns its path or None."""
    if _LIB_PATH.exists() and not force:
        return _LIB_PATH
    try:
        subprocess.run(["make", "-C", str(_REPO_ROOT / "native")],
                       check=True, capture_output=True)
        return _LIB_PATH if _LIB_PATH.exists() else None
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native tokenizer build failed: %s", e)
        return None


def _load_lib():
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.sdtpu_bpe_create.restype = ctypes.c_void_p
    lib.sdtpu_bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.sdtpu_bpe_error.restype = ctypes.c_char_p
    lib.sdtpu_bpe_error.argtypes = [ctypes.c_void_p]
    lib.sdtpu_bpe_destroy.argtypes = [ctypes.c_void_p]
    lib.sdtpu_bpe_bos.restype = ctypes.c_int32
    lib.sdtpu_bpe_bos.argtypes = [ctypes.c_void_p]
    lib.sdtpu_bpe_eos.restype = ctypes.c_int32
    lib.sdtpu_bpe_eos.argtypes = [ctypes.c_void_p]
    lib.sdtpu_bpe_encode.restype = ctypes.c_int32
    lib.sdtpu_bpe_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int32),
                                     ctypes.c_int32]
    return lib


class NativeCLIPTokenizer:
    """Same public surface as tokenizer.bpe.CLIPTokenizer (tokenize/encode).

    The C++ path lowercases ASCII only (the reference contract lowercases
    via Unicode-aware Foundation, BPETokenizer.swift:94-98), so any prompt
    containing non-ASCII routes to the Python fallback — bit-identical
    tokenization for e.g. "Ä" vs "ä" at native speed for the (dominant)
    ASCII serving case.  tests/test_native_tokenizer.py pins native/Python
    parity over a mixed-case non-ASCII corpus."""

    def __init__(self, vocab_path, merges_path, pad_token_id: int | None = None,
                 fallback=None):
        if not _LIB_PATH.exists() and build_native() is None:
            raise RuntimeError("native tokenizer library unavailable")
        self._lib = _load_lib()
        self._handle = self._lib.sdtpu_bpe_create(
            str(vocab_path).encode(), str(merges_path).encode())
        err = self._lib.sdtpu_bpe_error(self._handle)
        if err:
            raise RuntimeError(f"native tokenizer: {err.decode()}")
        self.bos_id = self._lib.sdtpu_bpe_bos(self._handle)
        self.eos_id = self._lib.sdtpu_bpe_eos(self._handle)
        self.pad_id = self.eos_id if pad_token_id is None else pad_token_id
        if fallback is None:
            from .bpe import CLIPTokenizer

            fallback = CLIPTokenizer.from_pretrained_dir(
                Path(vocab_path).parent)
        self._fallback = fallback

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.sdtpu_bpe_destroy(self._handle)
            self._handle = None

    def add_placeholder(self, token: str, ids):
        """Textual-inversion placeholder — prompts containing one route to
        the Python tokenizer (same pattern as the non-ASCII fallback)."""
        self._fallback.add_placeholder(token, ids)

    @property
    def added_placeholders(self):
        return self._fallback.added_placeholders

    def encode(self, text: str) -> list[int]:
        if not text.isascii():
            return self._fallback.encode(text)
        placeholders = (self._fallback.added_placeholders
                        if self._fallback is not None else None)
        if placeholders and any(k in text.lower() for k in placeholders):
            return self._fallback.encode(text)
        buf = (ctypes.c_int32 * 512)()
        n = self._lib.sdtpu_bpe_encode(self._handle, text.encode("utf-8"),
                                       buf, 512)
        return list(buf[:n])

    def tokenize(self, text: str, max_length: int = 77,
                 pad_to_max: bool = True):
        ids = [self.bos_id] + self.encode(text)
        ids = ids[: max_length - 1] + [self.eos_id]
        true_len = len(ids)
        if pad_to_max:
            ids = ids + [self.pad_id] * (max_length - len(ids))
        return np.asarray(ids, dtype=np.int32), true_len


def load_tokenizer(directory, pad_token: str = "<|endoftext|>",
                   prefer_native: bool = True):
    """Factory: native C++ tokenizer when available, Python otherwise."""
    from .bpe import CLIPTokenizer

    directory = Path(directory)
    py = CLIPTokenizer.from_pretrained_dir(directory, pad_token=pad_token)
    if not prefer_native:
        return py
    try:
        return NativeCLIPTokenizer(directory / "vocab.json",
                                   directory / "merges.txt",
                                   pad_token_id=py.pad_id, fallback=py)
    except (RuntimeError, OSError) as e:
        logger.info("falling back to Python tokenizer: %s", e)
        return py
