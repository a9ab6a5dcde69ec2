"""IP-Adapter image projection (beyond the reference).

The base IP-Adapter ("Image Prompt Adapter", h94/IP-Adapter) conditions the
UNet on a reference image: a CLIP image embedding is projected to a few
extra context tokens, and every cross-attention gains a decoupled K/V pair
over those tokens whose attention output is added (scaled) before the
out-projection — see ``models/unet.py Attention``.

Two projection heads cover the published variants:

- BASE (``image_proj.proj/norm``): Linear over the pooled/projected CLIP
  image embedding -> a few context tokens (``IPImageProjection``).
- PLUS (``image_proj.latents/proj_in/proj_out/norm_out/layers.*``): a
  perceiver resampler over the PENULTIMATE patch hidden states
  (``IPResampler`` — learned query latents cross-attend to the patch
  tokens through ``depth`` attention+FF blocks; h94/IP-Adapter
  resampler.py structure).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.activations import gelu_erf


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


class _PerceiverAttention(nn.Module):
    """Latents cross-attend to [patch tokens ++ latents] (resampler.py
    PerceiverAttention: pre-LN both streams, q from latents, kv from the
    concatenation, 1/sqrt(dim_head) scaling, residual outside)."""

    dim: int
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        inner = self.heads * self.dim_head
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        latents = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                               name="norm2")(latents)
        B, Lq, _ = latents.shape
        kv_in = jnp.concatenate([x, latents], axis=1)
        Lk = kv_in.shape[1]
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_q")(latents)
        kv = nn.Dense(2 * inner, use_bias=False, dtype=self.dtype,
                      name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(B, Lq, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lk, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lk, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        logits = (q @ k.transpose(0, 1, 3, 2)).astype(jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(self.dim_head))
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, Lq, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        name="to_out")(out)


class IPResampler(nn.Module):
    """ip-adapter-plus image projection: ``num_queries`` learned latents
    resampled against the CLIP penultimate patch states
    (B, tokens, embedding_dim) -> (B, num_queries, output_dim)."""

    output_dim: int          # the UNet's cross-attention dim
    dim: int = 768           # internal width
    depth: int = 4
    heads: int = 12
    dim_head: int = 64
    num_queries: int = 16
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patch_states):
        B = patch_states.shape[0]
        lat0 = self.param("latents", nn.initializers.normal(1.0),
                          (1, self.num_queries, self.dim))
        latents = jnp.broadcast_to(lat0, (B,) + lat0.shape[1:]).astype(
            self.dtype)
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(
            patch_states.astype(self.dtype))
        for i in range(self.depth):
            latents = latents + _PerceiverAttention(
                self.dim, self.heads, self.dim_head, dtype=self.dtype,
                name=f"layers_{i}_attn")(x, latents)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"layers_{i}_ff_norm")(latents)
            h = nn.Dense(self.dim * self.ff_mult, use_bias=False,
                         dtype=self.dtype, name=f"layers_{i}_ff_in")(h)
            h = gelu_erf(h)  # exact GELU at half the erfc-lowering VPU cost
            latents = latents + nn.Dense(self.dim, use_bias=False,
                                         dtype=self.dtype,
                                         name=f"layers_{i}_ff_out")(h)
        out = nn.Dense(self.output_dim, dtype=self.dtype,
                       name="proj_out")(latents)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name="norm_out")(out)
