"""T5 tokenizer: loads an HF ``tokenizer.json`` (fast-tokenizer format).

Replaces the reference's swift-transformers T5 tokenizer loading
(T5Tokenizer.swift:12-20, TextEncoderT5.swift:83-97: EOS/pad handling +
attention mask construction).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class T5Tokenizer:
    def __init__(self, tokenizer_json: str | Path, eos_id: int = 1,
                 pad_id: int = 0):
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(str(tokenizer_json))
        self.eos_id = eos_id
        self.pad_id = pad_id

    def tokenize(self, text: str, max_length: int = 77):
        """-> (ids[max_length] int32, attention_mask[max_length] int32).

        Truncates so EOS survives, pads with pad_id, mask covers real tokens
        incl. EOS (reference TextEncoderT5.swift:83-97)."""
        ids = self._tok.encode(text, add_special_tokens=False).ids
        ids = ids[: max_length - 1] + [self.eos_id]
        mask = [1] * len(ids)
        pad = max_length - len(ids)
        ids = ids + [self.pad_id] * pad
        mask = mask + [0] * pad
        return (np.asarray(ids, dtype=np.int32),
                np.asarray(mask, dtype=np.int32))
