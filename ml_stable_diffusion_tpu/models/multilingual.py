"""Multilingual text-encoder projection.

The reference projects Apple's OS-provided NLContextualEmbedding (512-dim,
20+ languages) into the text encoder's hidden space via a user-trained linear
layer, converted by multilingual_projection.py:15-45 (output reshaped to the
encoder's layout :29) and consumed by MultilingualTextEncoder.swift:10-135.

The TPU equivalent accepts any external sentence/token embedding source
(e.g. a multilingual encoder checkpoint) and projects it into the
cross-attention space expected by the UNet.  MAX_SEQUENCE_LENGTH/EMBED_DIM
match the reference constants (multilingual_projection.py:11-12).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

MAX_SEQUENCE_LENGTH = 256
EMBED_DIM = 512


class MultilingualProjection(nn.Module):
    """(B, S, EMBED_DIM) external embeddings -> (B, S, hidden_size)."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embeddings):
        return nn.Dense(self.hidden_size, dtype=self.dtype,
                        name="linear")(embeddings.astype(self.dtype))


def port_multilingual_projection(state_dict) -> dict:
    """torch Linear state dict -> Flax params (multilingual_projection.py:23)."""
    import numpy as np

    w = state_dict["weight"]
    if hasattr(w, "detach"):
        w = w.detach().cpu().float().numpy()
    out = {"linear": {"kernel": np.asarray(w, np.float32).T}}
    if "bias" in state_dict:
        b = state_dict["bias"]
        if hasattr(b, "detach"):
            b = b.detach().cpu().float().numpy()
        out["linear"]["bias"] = np.asarray(b, np.float32)
    return out
