"""UNet2DConditionModel (Flax, NHWC, TPU-first).

Covers the reference's UNet capability surface (unet.py:798-1152): SD 1.x/2.x
and SDXL (text_time added conditioning, unet.py:1074-1082), ControlNet
residual injection (unet.py:1009-1022), and the refiner (config-driven).

Deliberate departures from the reference (SURVEY.md section 7):
- NHWC layout + HWIO convs — TPU's native conv layout; the reference's
  BC1S/"Linear as 1x1 conv" contortions (unet.py:74-127) are ANE-specific.
- One fused attention op (ops/attention.py) instead of the reference's three
  ANE-tuned einsum variants (attention.py:24-168).
- Softmax always in fp32 — subsumes diffusers' "upcast_attention".

Parameter tree naming intentionally mirrors the HF-diffusers checkpoint
layout (down_blocks_0/resnets_0/...) so weight porting in convert/unet.py is
a mechanical rename + transpose.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    #: per down-block transformer depth (SDXL: (1, 2, 10))
    transformer_layers_per_block: tuple[int, ...] = (1, 1, 1, 1)
    #: heads per block — matches diffusers' (misnamed) attention_head_dim for
    #: SD-family checkpoints
    num_attention_heads: tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    #: None (SD) or "text_time" (SDXL micro-conditioning)
    addition_embed_type: str | None = None
    addition_time_embed_dim: int = 256
    #: SDXL: 2816 = 1280 pooled + 6*256 time ids; refiner: 2560 (5 ids)
    projection_class_embeddings_input_dim: int = 2816
    #: guidance (w) conditioning input dim for fully-distilled LCM
    #: checkpoints (diffusers ``time_cond_proj_dim``, e.g. 256 for
    #: LCM_Dreamshaper_v7): the guidance scale is EMBEDDED as an extra
    #: timestep-MLP input instead of applied via CFG.  Same MLP pattern as
    #: the reference's TimestepEmbedding (unet.py:630).
    time_cond_proj_dim: int | None = None
    #: serve-time optimization: single fused qkv matmul for self-attention
    #: (params via convert/optimize.fuse_qkv_params)
    fuse_qkv: bool = False
    #: serve-time optimization: fused Pallas GroupNorm+SiLU (ops/groupnorm.py)
    fused_groupnorm: bool = False
    #: GroupNorm stats reduced directly from the compute dtype (no f32
    #: materialization of the tensor + its square — see
    #: ops/groupnorm.group_norm_silu_lowmem)
    lowmem_groupnorm: bool = False
    #: serve-time optimization: sigmoid-approximate GELU in the GEGLU
    #: feed-forwards (x*sigmoid(1.702x), ~1e-2 deviation from exact GELU;
    #: the default is the exact erf form).  Opt-in because it changes the
    #: math slightly vs the reference's F.gelu (unet.py:609).  Measured
    #: 59.4 vs 58.5 iter/s on the SD-2.1 headline (r2, SDTPU_FAST_GELU=1).
    fast_gelu: bool = False
    #: serve-time optimization: upsampler NN-2x+conv3x3 computed as four
    #: parity-aligned 2x2 convs (4/9 the FLOPs, no 2x-res intermediate);
    #: numerics identical — see models/vae.py ParityUpsampleConv.
    #: MEASURED LOSER at 1024^2 VAE decode (XLA-level interleave costs more
    #: than the repeat it saves) — prefer fused_upsample
    parity_upsample: bool = False
    #: upsamplers as ONE lhs-dilated conv (models/vae.py FusedUpsampleConv):
    #: the measured winner at 1024^2 VAE decode (87.8 -> 69.3 ms) and SDXL
    #: 1024 e2e (2.285 -> 2.244 s); SD-512 headline neutral (57.25 vs
    #: 57.36, r5).  Exact same function/params as repeat+conv — DEFAULT ON
    fused_upsample: bool = True

    @classmethod
    def sd15(cls) -> "UNetConfig":
        return cls(cross_attention_dim=768,
                   num_attention_heads=(8, 8, 8, 8))

    @classmethod
    def sd21(cls) -> "UNetConfig":
        return cls()

    @classmethod
    def sdxl(cls) -> "UNetConfig":
        return cls(
            block_out_channels=(320, 640, 1280),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D",
                              "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                            "UpBlock2D"),
            transformer_layers_per_block=(1, 2, 10),
            num_attention_heads=(5, 10, 20),
            cross_attention_dim=2048,
            addition_embed_type="text_time",
            projection_class_embeddings_input_dim=2816,
        )

    @classmethod
    def sdxl_refiner(cls) -> "UNetConfig":
        return cls(
            block_out_channels=(384, 768, 1536, 1536),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D",
                              "CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D",
                            "CrossAttnUpBlock2D", "UpBlock2D"),
            transformer_layers_per_block=(1, 4, 4, 1),
            num_attention_heads=(6, 12, 24, 24),
            cross_attention_dim=1280,
            addition_embed_type="text_time",
            projection_class_embeddings_input_dim=2560,
        )

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


def get_timestep_embedding(timesteps, dim: int, flip_sin_to_cos: bool = True,
                           freq_shift: float = 0.0, max_period: float = 10000.0):
    """Sinusoidal timestep embedding (reference unet.py:703-729 semantics).

    Computed in fp32 regardless of model dtype — the fp16 rounding of the
    exponent table is a known quality trap.
    """
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin], axis=-1) if flip_sin_to_cos else \
        jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


def get_guidance_scale_embedding(w, dim: int):
    """LCM guidance (w) embedding — diffusers
    ``get_guidance_scale_embedding`` semantics: sinusoid of ``w * 1000``
    with denominator ``half - 1`` and [sin, cos] order (NOT the timestep
    embedding's flipped order / ``freq_shift``).  fp32 throughout."""
    w = jnp.asarray(w, jnp.float32) * 1000.0
    half = dim // 2
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                  * (-jnp.log(10000.0) / (half - 1)))
    emb = w[:, None] * emb[None, :]
    out = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """two-layer MLP over the sinusoidal embedding (unet.py:630-662).

    ``cond``: optional conditioning vector added to the sinusoid BEFORE the
    MLP through a bias-free projection (diffusers ``cond_proj`` — the LCM
    guidance-embedding input)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond=None):
        if cond is not None:
            x = x + nn.Dense(x.shape[-1], use_bias=False, dtype=self.dtype,
                             name="cond_proj")(cond.astype(self.dtype))
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(x)


class _GNParams(nn.Module):
    """Registers scale/bias with nn.GroupNorm's exact param layout so the
    fused kernel path shares checkpoints with the standard path."""

    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class _Conv1x1(nn.Module):
    """1x1 convolution emitted as a ``dot_general`` instead of
    ``conv_general_dilated``: the TPU conv emitter ran the up-block shortcut
    convs (K up to 2560 from skip concats) at 58 TFLOP/s vs ~150 for the
    neighbouring matmuls (r2 profile).  Param tree matches ``nn.Conv`` with a
    (1, 1) kernel, so porting/artifacts are unchanged."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.dot_general(
            x.astype(self.dtype), kernel[0, 0].astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())))
        return y + bias.astype(self.dtype)


class ResnetBlock2D(nn.Module):
    """GN->SiLU->conv + time-emb add + GN->SiLU->conv with skip
    (reference ResnetBlock2D unet.py:406-489)."""

    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    fused_gn: bool = False
    lowmem_gn: bool = False
    dtype: jnp.dtype = jnp.float32

    def _gn_silu(self, x, name):
        if self.fused_gn:
            from ..ops.groupnorm import group_norm_silu

            scale, bias = _GNParams(x.shape[-1], name=name)()
            return group_norm_silu(x, scale, bias, self.groups,
                                   self.eps).astype(self.dtype)
        if self.lowmem_gn:
            from ..ops.groupnorm import group_norm_silu_lowmem

            scale, bias = _GNParams(x.shape[-1], name=name)()
            return group_norm_silu_lowmem(
                x.astype(self.dtype), scale, bias, self.groups, self.eps)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name=name)(x)
        return nn.silu(h)

    @nn.compact
    def __call__(self, x, temb):
        h = self._gn_silu(x, "norm1")
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb))
        h = h + t[:, None, None, :]
        h = self._gn_silu(h, "norm2")
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = _Conv1x1(self.out_channels, dtype=self.dtype,
                         name="conv_shortcut")(x)
        return x + h


class Attention(nn.Module):
    """QKV attention with fused TPU kernel dispatch (replaces the reference's
    CrossAttention + 3 einsum variants, unet.py:62-120 / attention.py).

    ``fuse_qkv``: self-attention projects q,k,v in ONE matmul (one read of x
    instead of three — the UNet step is HBM-bandwidth-bound).  Requires
    params transformed by convert/optimize.fuse_qkv_params."""

    query_dim: int
    heads: int
    context_dim: int | None = None
    fuse_qkv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        is_self = context is None
        ip_context, ip_scale = None, 1.0
        if isinstance(context, tuple):
            # IP-Adapter decoupled cross-attention: the image tokens ride
            # with the text context as (text_ctx, ip_tokens, ip_scale)
            context, ip_context, ip_scale = context
        context = x if context is None else context
        inner = self.query_dim
        head_dim = inner // self.heads
        if self.fuse_qkv and is_self:
            qkv = nn.Dense(3 * inner, use_bias=False, dtype=self.dtype,
                           name="to_qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        B, Sq, _ = q.shape
        Sk = k.shape[1]
        q = q.reshape(B, Sq, self.heads, head_dim)
        k = k.reshape(B, Sk, self.heads, head_dim)
        v = v.reshape(B, Sk, self.heads, head_dim)
        out = dot_product_attention(q, k, v)
        if ip_context is not None:
            # separate K/V projections over the image tokens; outputs sum
            # BEFORE the out-projection (IPAttnProcessor semantics)
            S_ip = ip_context.shape[1]
            k_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_k_ip")(ip_context).reshape(
                                B, S_ip, self.heads, head_dim)
            v_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_v_ip")(ip_context).reshape(
                                B, S_ip, self.heads, head_dim)
            out = out + ip_scale * dot_product_attention(q, k_ip, v_ip)
        out = out.reshape(B, Sq, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward (reference unet.py:594-628)."""

    dim: int
    mult: int = 4
    fast_gelu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.activations import gelu_erf, quick_gelu

        gelu = quick_gelu if self.fast_gelu else gelu_erf
        inner = self.dim * self.mult
        proj = nn.Dense(inner * 2, dtype=self.dtype, name="geglu_proj")(x)
        a, gate = jnp.split(proj, 2, axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(
            a * gelu(gate))


class BasicTransformerBlock(nn.Module):
    """self-attn + cross-attn + GEGLU FF, pre-LN (unet.py:566-592)."""

    dim: int
    heads: int
    context_dim: int
    fuse_qkv: bool = False
    fast_gelu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        x = x + Attention(self.dim, self.heads, fuse_qkv=self.fuse_qkv,
                          dtype=self.dtype, name="attn1")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x))
        x = x + Attention(self.dim, self.heads, self.context_dim,
                          dtype=self.dtype, name="attn2")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x), context)
        x = x + FeedForward(self.dim, fast_gelu=self.fast_gelu,
                            dtype=self.dtype, name="ff")(
            nn.LayerNorm(dtype=self.dtype, name="norm3")(x))
        return x


class SpatialTransformer(nn.Module):
    """GN -> project -> N transformer blocks over (B, H*W, C) -> project back
    + residual (reference SpatialTransformer unet.py:513-564; the BCHW->BC1S
    reshape :558 becomes a flatten of NHWC spatial dims)."""

    channels: int
    heads: int
    depth: int
    context_dim: int
    groups: int = 32
    eps: float = 1e-6
    fuse_qkv: bool = False
    fast_gelu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        h = nn.Dense(self.channels, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(self.channels, self.heads,
                                      self.context_dim,
                                      fuse_qkv=self.fuse_qkv,
                                      fast_gelu=self.fast_gelu,
                                      dtype=self.dtype,
                                      name=f"transformer_blocks_{i}")(h, context)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(B, H, W, C) + residual


class Downsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # symmetric padding=1 matches torch Conv2d(stride=2, padding=1)
        return nn.Conv(self.channels, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    parity: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        # explicit parity=True (ablation flag) takes precedence over the
        # fused DEFAULT — see models/vae.py
        if not self.parity and self.fused:
            # one lhs-dilated conv; the measured winner at 1024^2 decode
            # (87.8 -> 69.3 ms, models/vae.py FusedUpsampleConv docstring)
            from .vae import FusedUpsampleConv

            return FusedUpsampleConv(self.channels, dtype=self.dtype,
                                     name="conv")(x)
        if self.parity:
            from .vae import ParityUpsampleConv

            return ParityUpsampleConv(self.channels, dtype=self.dtype,
                                      name="conv")(x)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class UNet2DConditionModel(nn.Module):
    """Denoiser for SD 1.x/2.x and SDXL (reference unet.py:798-1152).

    Inputs (NHWC):
    - sample (B, H, W, C_in), timesteps (B,) float/int,
    - encoder_hidden_states (B, S_text, C_ctx),
    - added_cond: SDXL dict {"text_embeds": (B, 1280), "time_ids": (B, 5|6)}
      (reference unet.py:1074-1082),
    - down_block_residuals / mid_block_residual: ControlNet injection
      (reference unet.py:1009-1022).
    """

    config: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 added_cond: dict | None = None,
                 down_block_residuals: Sequence[jnp.ndarray] | None = None,
                 mid_block_residual: jnp.ndarray | None = None,
                 ip_context: jnp.ndarray | None = None,
                 ip_scale: float = 1.0,
                 timestep_cond: jnp.ndarray | None = None,
                 return_deep_feature: bool = False,
                 deep_feature: jnp.ndarray | None = None):
        """``return_deep_feature`` / ``deep_feature``: DeepCache-style deep
        feature reuse (arXiv 2312.03209 / 2312.09608 family).  The "deep
        feature" is the tensor ENTERING the last up block (the output of
        up_blocks[-2]'s upsampler, full latent resolution,
        ``reversed(block_out_channels)[-2]`` channels).

        - ``return_deep_feature=True``: also return that tensor (full pass).
        - ``deep_feature=...``: SHALLOW pass — compute only conv_in + down
          block 0 (its resnets/attentions feed the last up block's skip
          connections; the downsampler and everything deeper is skipped),
          substitute the given tensor for the deep trunk, and run the last
          up block + out head.  With a feature captured from a full pass on
          the SAME (sample, t, context) this is bit-identical to the full
          forward; reused across nearby timesteps it is the DeepCache
          approximation.  ControlNet down-residuals still apply to the
          shallow skips (the deeper residuals ride the cached trunk);
          ``mid_block_residual`` is part of the skipped trunk.
        """
        cfg = self.config
        shallow = deep_feature is not None
        assert not (shallow and return_deep_feature)
        if shallow or return_deep_feature:
            assert len(cfg.up_block_types) >= 2, cfg.up_block_types
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        if cfg.time_cond_proj_dim is not None and timestep_cond is None:
            raise ValueError(
                "this UNet is guidance-embedded (time_cond_proj_dim="
                f"{cfg.time_cond_proj_dim}); pass timestep_cond "
                "(get_guidance_scale_embedding(w, dim))")

        # --- time + added embeddings (fp32) ---
        t_emb = get_timestep_embedding(timesteps, cfg.block_out_channels[0],
                                       cfg.flip_sin_to_cos, cfg.freq_shift)
        emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                name="time_embedding")(
            t_emb.astype(self.dtype),
            cond=(timestep_cond if cfg.time_cond_proj_dim is not None
                  else None))
        if cfg.addition_embed_type == "text_time":
            assert added_cond is not None, "SDXL requires added_cond"
            time_ids = added_cond["time_ids"].reshape(-1)
            id_emb = get_timestep_embedding(time_ids, cfg.addition_time_embed_dim,
                                            cfg.flip_sin_to_cos, cfg.freq_shift)
            id_emb = id_emb.reshape(sample.shape[0], -1)
            add = jnp.concatenate(
                [added_cond["text_embeds"].astype(jnp.float32), id_emb], axis=-1)
            emb = emb + TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                          name="add_embedding")(add.astype(self.dtype))

        sample = sample.astype(self.dtype)
        encoder_hidden_states = encoder_hidden_states.astype(self.dtype)
        if ip_context is not None:
            # IP-Adapter image tokens ride with the text context into every
            # cross-attention (unpacked in Attention)
            encoder_hidden_states = (encoder_hidden_states,
                                     ip_context.astype(self.dtype), ip_scale)

        # --- down ---
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(sample)
        residuals = [h]
        down_blocks = (list(enumerate(cfg.down_block_types))[:1] if shallow
                       else list(enumerate(cfg.down_block_types)))
        for bi, btype in down_blocks:
            out_ch = cfg.block_out_channels[bi]
            is_final = bi == len(cfg.down_block_types) - 1
            for li in range(cfg.layers_per_block):
                h = ResnetBlock2D(out_ch, cfg.norm_num_groups, cfg.norm_eps,
                                  fused_gn=cfg.fused_groupnorm,
                                  lowmem_gn=cfg.lowmem_groupnorm,
                                  dtype=self.dtype,
                                  name=f"down_blocks_{bi}_resnets_{li}")(h, emb)
                if btype == "CrossAttnDownBlock2D":
                    h = SpatialTransformer(
                        out_ch, cfg.num_attention_heads[bi],
                        cfg.transformer_layers_per_block[bi],
                        cfg.cross_attention_dim, cfg.norm_num_groups,
                        fuse_qkv=cfg.fuse_qkv, fast_gelu=cfg.fast_gelu,
                        dtype=self.dtype,
                        name=f"down_blocks_{bi}_attentions_{li}")(h, encoder_hidden_states)
                residuals.append(h)
            if not is_final and not shallow:
                h = Downsample2D(out_ch, dtype=self.dtype,
                                 name=f"down_blocks_{bi}_downsamplers_0")(h)
                residuals.append(h)

        # --- mid (skipped on the shallow deep-feature path) ---
        if not shallow:
            mid_ch = cfg.block_out_channels[-1]
            h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, cfg.norm_eps,
                              fused_gn=cfg.fused_groupnorm,
                              lowmem_gn=cfg.lowmem_groupnorm,
                              dtype=self.dtype, name="mid_block_resnets_0")(h, emb)
            h = SpatialTransformer(mid_ch, cfg.num_attention_heads[-1],
                                   cfg.transformer_layers_per_block[-1],
                                   cfg.cross_attention_dim, cfg.norm_num_groups,
                                   fuse_qkv=cfg.fuse_qkv, fast_gelu=cfg.fast_gelu,
                                   dtype=self.dtype,
                                   name="mid_block_attentions_0")(h, encoder_hidden_states)
            h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, cfg.norm_eps,
                              fused_gn=cfg.fused_groupnorm,
                              lowmem_gn=cfg.lowmem_groupnorm,
                              dtype=self.dtype, name="mid_block_resnets_1")(h, emb)

        # --- ControlNet residual injection (unet.py:1009-1022); on the
        # shallow path zip truncates to the shallow skips (conv_in + down
        # block 0), whose order matches the residual list's head ---
        if down_block_residuals is not None:
            residuals = [r + c.astype(r.dtype)
                         for r, c in zip(residuals, down_block_residuals)]
        if mid_block_residual is not None and not shallow:
            h = h + mid_block_residual.astype(h.dtype)

        # --- up ---
        rev_channels = list(reversed(cfg.block_out_channels))
        deep_out = None
        up_blocks = list(enumerate(cfg.up_block_types))
        if shallow:
            up_blocks = up_blocks[-1:]
            h = deep_feature.astype(self.dtype)
        for bi, btype in up_blocks:
            out_ch = rev_channels[bi]
            is_final = bi == len(cfg.up_block_types) - 1
            if is_final and return_deep_feature:
                deep_out = h
            for li in range(cfg.layers_per_block + 1):
                res = residuals.pop()
                h = jnp.concatenate([h, res.astype(h.dtype)], axis=-1)
                h = ResnetBlock2D(out_ch, cfg.norm_num_groups, cfg.norm_eps,
                                  fused_gn=cfg.fused_groupnorm,
                                  lowmem_gn=cfg.lowmem_groupnorm,
                                  dtype=self.dtype,
                                  name=f"up_blocks_{bi}_resnets_{li}")(h, emb)
                if btype == "CrossAttnUpBlock2D":
                    # heads indexed by mirrored down-block position
                    down_bi = len(cfg.block_out_channels) - 1 - bi
                    h = SpatialTransformer(
                        out_ch, cfg.num_attention_heads[down_bi],
                        cfg.transformer_layers_per_block[down_bi],
                        cfg.cross_attention_dim, cfg.norm_num_groups,
                        fuse_qkv=cfg.fuse_qkv, fast_gelu=cfg.fast_gelu,
                        dtype=self.dtype,
                        name=f"up_blocks_{bi}_attentions_{li}")(h, encoder_hidden_states)
            if not is_final:
                h = Upsample2D(out_ch, dtype=self.dtype,
                               parity=cfg.parity_upsample,
                               fused=cfg.fused_upsample,
                               name=f"up_blocks_{bi}_upsamplers_0")(h)

        # --- out ---
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps,
                         dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        if return_deep_feature:
            return h.astype(jnp.float32), deep_out
        return h.astype(jnp.float32)
