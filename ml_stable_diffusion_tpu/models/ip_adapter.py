"""IP-Adapter image projection (beyond the reference).

The base IP-Adapter ("Image Prompt Adapter", h94/IP-Adapter) conditions the
UNet on a reference image: a CLIP image embedding is projected to a few
extra context tokens, and every cross-attention gains a decoupled K/V pair
over those tokens whose attention output is added (scaled) before the
out-projection — see ``models/unet.py Attention``.

This module is the projection head for the BASE adapter variant
(``image_proj.proj/norm`` weights).  The "plus" variants replace it with a
perceiver resampler over patch embeddings; ``convert/ip_adapter.py``
detects and rejects those with a clear error until implemented.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class IPImageProjection(nn.Module):
    """CLIP image embedding (B, E) -> (B, num_tokens, cross_attention_dim)
    context tokens (Linear -> reshape -> LayerNorm)."""

    cross_attention_dim: int
    num_tokens: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds):
        x = nn.Dense(self.num_tokens * self.cross_attention_dim,
                     dtype=self.dtype, name="proj")(image_embeds)
        x = x.reshape(x.shape[0], self.num_tokens, self.cross_attention_dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
