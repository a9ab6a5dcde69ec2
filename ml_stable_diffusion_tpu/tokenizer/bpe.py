"""CLIP byte-pair-encoding tokenizer.

A self-contained implementation of OpenAI CLIP's tokenizer operating on the
standard ``vocab.json`` + ``merges.txt`` artifacts (the same files the
reference downloads and bundles — torch2coreml.py:324-334 — and re-implements
in Swift at BPETokenizer.swift:59-169).

Algorithm: NFC-ish cleanup + lowercase + whitespace collapse, regex word
splitting, per-word greedy lowest-rank pair merging with an end-of-word
``</w>`` marker, then vocabulary lookup with ``<|startoftext|>`` /
``<|endoftext|>`` specials and fixed-length padding (CLIP pads with the
end-of-text token).
"""

from __future__ import annotations

import functools
import gzip
import html
import json
from pathlib import Path

import numpy as np
import regex as re

# CLIP's word-splitting pattern (also matches transformers' CLIPTokenizer).
_PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)

_WHITESPACE = re.compile(r"\s+")


def _clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = _WHITESPACE.sub(" ", text)
    return text.strip().lower()


@functools.lru_cache()
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2/CLIP byte<->unicode table: every UTF-8 byte maps to a printable
    unicode char, so BPE runs over bytes and non-ASCII text tokenizes
    exactly like the ecosystem vocab/merges the reference bundles
    (torch2coreml.py:324-334; HF CLIPTokenizer bytes_to_unicode)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(0xA1, 0xAC + 1)) + list(range(0xAE, 0xFF + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


@functools.lru_cache()
def unicode_to_bytes() -> dict[str, int]:
    return {c: b for b, c in bytes_to_unicode().items()}


def _pairs(word: tuple[str, ...]) -> set[tuple[str, str]]:
    return set(zip(word[:-1], word[1:]))


class CLIPTokenizer:
    """CLIP BPE tokenizer over vocab.json + merges.txt.

    Mirrors the reference Swift tokenizer's public surface
    (BPETokenizer.swift:59-97): ``tokenize`` pads/truncates to a fixed
    length, ``decode`` inverts it.
    """

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]],
                 pad_token: str = "<|endoftext|>"):
        self.vocab = dict(vocab)
        self.decoder = {v: k for k, v in self.vocab.items()}
        self.merge_ranks = {m: i for i, m in enumerate(merges)}
        self.bos_token = "<|startoftext|>"
        self.eos_token = "<|endoftext|>"
        self.bos_id = self.vocab[self.bos_token]
        self.eos_id = self.vocab[self.eos_token]
        self.pad_id = self.vocab[pad_token]
        self._cache: dict[str, list[str]] = {}
        #: textual-inversion placeholders: lowercased token -> expanded ids
        #: (ids index EXTENDED embedding-table rows, not vocab entries)
        self.added_placeholders: dict[str, list[int]] = {}
        self._added_re = None

    # -- construction ---------------------------------------------------------

    @classmethod
    def from_files(cls, vocab_path: str | Path, merges_path: str | Path,
                   pad_token: str = "<|endoftext|>") -> "CLIPTokenizer":
        """Load the standard artifacts.

        merges.txt may have a ``#version`` header line (skipped, matching
        BPETokenizer+Reading.swift:33-48) and may be gzipped.
        """
        vocab_path, merges_path = Path(vocab_path), Path(merges_path)
        vocab = json.loads(vocab_path.read_text())
        opener = gzip.open if merges_path.suffix == ".gz" else open
        with opener(merges_path, "rt") as f:
            lines = f.read().splitlines()
        if lines and lines[0].startswith("#"):
            lines = lines[1:]
        merges = []
        for line in lines:
            parts = line.split()
            if len(parts) == 2:
                merges.append((parts[0], parts[1]))
        return cls(vocab, merges, pad_token=pad_token)

    @classmethod
    def from_pretrained_dir(cls, path: str | Path, **kw) -> "CLIPTokenizer":
        path = Path(path)
        merges = path / "merges.txt"
        if not merges.exists() and (path / "merges.txt.gz").exists():
            merges = path / "merges.txt.gz"
        return cls.from_files(path / "vocab.json", merges, **kw)

    # -- BPE core -------------------------------------------------------------

    def _bpe(self, token: str) -> list[str]:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        if not token:
            return []
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _pairs(word)
        if not pairs:
            return [token + "</w>"]
        while True:
            bigram = min(pairs, key=lambda p: self.merge_ranks.get(p, float("inf")))
            if bigram not in self.merge_ranks:
                break
            first, second = bigram
            new_word: list[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                if j < len(word) - 1 and word[j + 1] == second:
                    new_word.append(first + second)
                    i = j + 2
                else:
                    new_word.append(word[j])
                    i = j + 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _pairs(word)
        out = list(word)
        self._cache[token] = out
        return out

    # -- public API -----------------------------------------------------------

    def add_placeholder(self, token: str, ids: list[int]):
        """Register a textual-inversion placeholder: every occurrence of
        ``token`` (case-insensitive) expands to ``ids`` — row indices of an
        embedding table EXTENDED past the base vocabulary (multi-vector
        embeddings expand to several rows)."""
        self.added_placeholders[token.lower()] = [int(i) for i in ids]
        pat = "|".join(re.escape(k) for k in
                       sorted(self.added_placeholders, key=len, reverse=True))
        self._added_re = re.compile(f"({pat})")

    def encode(self, text: str) -> list[int]:
        """Text -> token ids, without specials or padding.  Words are
        byte-level encoded (bytes_to_unicode) before BPE — identity for
        ASCII, ecosystem-exact for non-ASCII prompts.  Registered
        textual-inversion placeholders expand to their embedding rows."""
        if self._added_re is not None:
            ids: list[int] = []
            for seg in self._added_re.split(_clean(text)):
                if seg in self.added_placeholders:
                    ids += self.added_placeholders[seg]
                elif seg:
                    ids += self._encode_plain(seg)
            return ids
        return self._encode_plain(text)

    def _encode_plain(self, text: str) -> list[int]:
        ids: list[int] = []
        unk = self.eos_id
        b2u = bytes_to_unicode()
        for tok in _PAT.findall(_clean(text)):
            tok = "".join(b2u[b] for b in tok.encode("utf-8"))
            for piece in self._bpe(tok):
                ids.append(self.vocab.get(piece, unk))
        return ids

    def tokenize(self, text: str, max_length: int = 77,
                 pad_to_max: bool = True) -> tuple[np.ndarray, int]:
        """Text -> (ids[max_length] int32, true_length incl. specials).

        BOS + tokens + EOS, truncated so EOS always survives, padded with the
        pad token (reference BPETokenizer.swift:59-73, TextEncoder.swift:52-69).
        """
        ids = [self.bos_id] + self.encode(text)
        ids = ids[: max_length - 1] + [self.eos_id]
        true_len = len(ids)
        if pad_to_max:
            ids = ids + [self.pad_id] * (max_length - len(ids))
        return np.asarray(ids, dtype=np.int32), true_len

    def decode(self, ids) -> str:
        """Token ids -> text (reference BPETokenizer.swift:86-97; byte-level
        inverse per HF CLIPTokenizer.convert_tokens_to_string)."""
        specials = {self.bos_id, self.eos_id, self.pad_id}
        text = "".join(self.decoder.get(int(i), "") for i in ids if int(i) not in specials)
        u2b = unicode_to_bytes()
        raw = bytearray(u2b.get(c, ord("?")) for c in text)
        return (raw.decode("utf-8", errors="replace")
                .replace("</w>", " ").strip())

    @functools.cached_property
    def vocab_size(self) -> int:
        return len(self.vocab)
