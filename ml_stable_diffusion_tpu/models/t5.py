"""T5 v1.1 text encoder (Flax) for SD3.

The reference sidesteps implementing T5 by downloading a pre-converted Core ML
model (torch2coreml.py:251-269,1745-1749; Swift wrapper TextEncoderT5.swift).
Here it is a first-class module: RMSNorm pre-norm blocks, unscaled attention
with bucketed relative position bias shared from block 0, gated-GELU FF —
ported from HF ``T5EncoderModel`` checkpoints (convert/t5.py).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6

    @classmethod
    def xxl(cls) -> "T5Config":
        """google/t5-v1_1-xxl — the SD3 text encoder 3."""
        return cls()


class T5LayerNorm(nn.Module):
    """RMS norm without mean subtraction (T5 flavor)."""

    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = (x.astype(jnp.float32) * (var + self.eps) ** -0.5).astype(self.dtype)
        return x * scale.astype(self.dtype)


def relative_position_buckets(qlen: int, klen: int, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """Bidirectional T5 relative position bucketing (static, numpy)."""
    ctx = np.arange(qlen)[:, None]
    mem = np.arange(klen)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(rel.clip(1) / max_exact) / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return buckets + np.where(is_small, rel, large)


class T5Block(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_bias, mask_bias):
        cfg = self.config
        H, Dk = cfg.num_heads, cfg.d_kv
        inner = H * Dk

        y = T5LayerNorm(cfg.d_model, cfg.layer_norm_eps, dtype=self.dtype,
                        name="attn_layer_norm")(x)
        B, S, _ = y.shape
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(y)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(y)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(y)
        q = q.reshape(B, S, H, Dk)
        k = k.reshape(B, S, H, Dk)
        v = v.reshape(B, S, H, Dk)
        # T5: NO 1/sqrt(d) scaling; bias added to raw logits
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + pos_bias[None] + mask_bias
        w = nn.softmax(logits, axis=-1).astype(y.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, v,
                          preferred_element_type=jnp.float32).astype(y.dtype)
        x = x + nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                         name="o")(attn.reshape(B, S, inner))

        y = T5LayerNorm(cfg.d_model, cfg.layer_norm_eps, dtype=self.dtype,
                        name="ff_layer_norm")(x)
        gate = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype,
                        name="wi_0")(y)
        lin = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype,
                       name="wi_1")(y)
        from ..ops.activations import gelu_tanh

        h = gelu_tanh(gate) * lin
        return x + nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                            name="wo")(h)


class T5Encoder(nn.Module):
    """Input: ids (B, S) int32, attention_mask (B, S) {0,1}.
    Output: {"encoder_hidden_states": (B, S, d_model)} (the reference
    wrapper's output name, TextEncoderT5.swift:111)."""

    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                     name="shared")(input_ids)

        S = input_ids.shape[1]
        buckets = relative_position_buckets(
            S, S, cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance)
        bias_table = self.param("relative_attention_bias",
                                nn.initializers.normal(0.02),
                                (cfg.relative_attention_num_buckets,
                                 cfg.num_heads))
        pos_bias = bias_table[jnp.asarray(buckets)].transpose(2, 0, 1)  # (H,S,S)
        pos_bias = pos_bias.astype(jnp.float32)

        if attention_mask is None:
            mask_bias = jnp.zeros((1, 1, 1, S), jnp.float32)
        else:
            mask_bias = jnp.where(attention_mask[:, None, None, :] > 0,
                                  0.0, -1e9).astype(jnp.float32)

        for i in range(cfg.num_layers):
            x = T5Block(cfg, dtype=self.dtype, name=f"block_{i}")(
                x, pos_bias, mask_bias)
        x = T5LayerNorm(cfg.d_model, cfg.layer_norm_eps, dtype=self.dtype,
                        name="final_layer_norm")(x)
        return {"encoder_hidden_states": x}
