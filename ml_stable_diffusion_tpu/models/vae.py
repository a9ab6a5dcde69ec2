"""VAE (AutoencoderKL) encoder/decoder in Flax, NHWC.

TPU-native replacement for the reference's converted VAE models
(torch2coreml.py convert_vae_decoder :548-698 / convert_vae_encoder
:700-797; Swift wrappers Decoder.swift / Encoder.swift).  Config-driven to
cover the 4-channel SD/SDXL VAE and the 16-channel SD3 VAE
(convert_vae_decoder_sd3 torch2coreml.py:644).

The reference forces the SDXL VAE to fp32 because fp16 overflows
(torch2coreml.py:570-574); on TPU bf16 has fp32's exponent range so the
default policy is safe, but decoding in fp32 stays one config flag away
(utils.dtypes.VAE_POLICY).

Latent scale/shift factors are pipeline-level constants (reference
main.swift:119-139) and intentionally not baked in here.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    #: SD/SDXL have 1x1 quant/post_quant convs; SD3's 16-ch VAE does not
    use_quant_conv: bool = True

    @classmethod
    def sd(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def sd3(cls) -> "VAEConfig":
        return cls(latent_channels=16, use_quant_conv=False)


class VAEResnetBlock(nn.Module):
    """Resnet block without time conditioning (VAE flavor)."""

    out_channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttentionBlock(nn.Module):
    """Single-head full self-attention over spatial positions (VAE mid)."""

    channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        # single head of width C=512 through the shared dispatch: on TPU the
        # flash kernel streams KV tiles instead of materializing the
        # (HW, HW) fp32 logits tensor — 1 GiB at 1024x1024 decode (HW=16384),
        # and the difference between decoding and OOMing beyond ~1536x1536
        h = dot_product_attention(q[:, :, None, :], k[:, :, None, :],
                                  v[:, :, None, :])[:, :, 0, :]
        h = nn.Dense(C, dtype=self.dtype, name="to_out_0")(h)
        return x + h.reshape(B, H, W, C)


class VAEMidBlock(nn.Module):
    channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = VAEResnetBlock(self.channels, self.groups, self.eps,
                           dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttentionBlock(self.channels, self.groups, self.eps,
                              dtype=self.dtype, name="attentions_0")(x)
        return VAEResnetBlock(self.channels, self.groups, self.eps,
                              dtype=self.dtype, name="resnets_1")(x)


class VAEEncoder(nn.Module):
    """image -> Gaussian moments (2 * latent_channels)."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = x.astype(self.dtype)
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        for bi, out_ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                h = VAEResnetBlock(out_ch, cfg.norm_num_groups, cfg.norm_eps,
                                   dtype=self.dtype,
                                   name=f"down_blocks_{bi}_resnets_{li}")(h)
            if bi < len(cfg.block_out_channels) - 1:
                # torch pads (0,1,0,1) before the stride-2 valid conv
                h = nn.Conv(out_ch, (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)), dtype=self.dtype,
                            name=f"down_blocks_{bi}_downsamplers_0_conv")(h)
        h = VAEMidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups,
                        cfg.norm_eps, dtype=self.dtype, name="mid_block")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps,
                         dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                    dtype=self.dtype, name="conv_out")(h)
        if cfg.use_quant_conv:
            h = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype,
                        name="quant_conv")(h)
        return h.astype(jnp.float32)


class ParityUpsampleConv(nn.Module):
    """2x nearest-neighbor upsample + 3x3 SAME conv, computed WITHOUT
    materializing the upsampled tensor.

    Algebraic identity: conv3x3(NN2x(x)) decomposes by output-pixel parity
    (a, b) = (row % 2, col % 2) into four 2x2 convs on the LOW-res input —
    each output pixel's 3x3 window covers only a 2x2 patch of distinct
    input pixels (with multiplicity), so the 3x3 kernel W collapses to
    parity kernels built from tap sums:

      rows, a=0 (window rows 2i-1..2i+1 -> x rows i-1, i, i):
          [W0, W1+W2] over x rows (i-1, i)
      rows, a=1 (window rows 2i..2i+2   -> x rows i, i, i+1):
          [W0+W1, W2] over x rows (i, i+1)

    (same combination along columns).  Cost: 4 * (2*2) = 16 HWCO MACs vs
    the naive 4HW * 9 * CO = 36 HWCO — 4/9 the FLOPs — and the 2x-res
    intermediate (up to 512 MB at 1024^2 decode) never exists.  Zero-pad
    edge behavior matches SAME padding on the upsampled image exactly
    (boundary taps fall on the same zeros).

    Param structure is identical to ``nn.Conv`` (kernel (3,3,C,O) HWIO +
    bias), so checkpoints port/load unchanged.
    """

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax

        B, H, W_, C = x.shape
        O = self.out_channels
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, C, O),
            jnp.float32).astype(self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (O,),
                          jnp.float32).astype(self.dtype)
        x = x.astype(self.dtype)

        # parity kernels: combine taps along rows then columns
        rows = {0: jnp.stack([kernel[0], kernel[1] + kernel[2]]),   # (2,3,C,O)
                1: jnp.stack([kernel[0] + kernel[1], kernel[2]])}
        pad = {0: (1, 0), 1: (0, 1)}  # offsets (-1,0) vs (0,+1)
        dn = jax.lax.conv_dimension_numbers(x.shape, (2, 2, C, O),
                                            ("NHWC", "HWIO", "NHWC"))

        def parity(a, b):
            k = rows[a]
            k = (jnp.stack([k[:, 0], k[:, 1] + k[:, 2]], axis=1) if b == 0
                 else jnp.stack([k[:, 0] + k[:, 1], k[:, 2]], axis=1))
            return jax.lax.conv_general_dilated(
                x, k, window_strides=(1, 1), padding=(pad[a], pad[b]),
                dimension_numbers=dn,
                preferred_element_type=self.dtype) + bias

        row0 = jnp.stack([parity(0, 0), parity(0, 1)], axis=3)  # (B,H,W,2,O)
        row1 = jnp.stack([parity(1, 0), parity(1, 1)], axis=3)
        out = jnp.stack([row0, row1], axis=2)                   # (B,H,2,W,2,O)
        return out.reshape(B, 2 * H, 2 * W_, O)


class FusedUpsampleConv(nn.Module):
    """2x nearest-neighbor upsample + 3x3 SAME conv as ONE lhs-dilated
    (transposed) conv.

    Identity: NN2x = conv_transpose(x, ones(2,2), stride 2), so
    conv3x3(NN2x(x)) = one conv with kernel K4 = W full-correlated with
    ones(2,2) per spatial axis (K4[u] = W[u] + W[u-1], u in 0..3), over the
    2x-lhs-dilated input with padding (2,2) — output phases are interleaved
    by the conv emitter itself.  This is the follow-up to the two measured
    1024^2-decode ablations (r5): plain repeat+conv costs 7.7 ms in the
    repeat broadcast (vae.py:248 attribution); ParityUpsampleConv removes
    it but its XLA-level stack/reshape interleave explodes data-formatting
    5.6 -> 23.4 ms (decode 87.8 -> 109.1 ms).  Here the interleave is the
    emitter's job and no 2x-res pre-conv intermediate exists.

    Param structure matches ``nn.Conv`` (kernel (3,3,C,O) HWIO + bias), so
    checkpoints port/load unchanged.
    """

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax

        B, H, W_, C = x.shape
        O = self.out_channels
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, C, O),
            jnp.float32).astype(self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (O,),
                          jnp.float32).astype(self.dtype)
        x = x.astype(self.dtype)

        def corr_ones2(k, axis):
            pad_hi = [(0, 0)] * 4
            pad_lo = [(0, 0)] * 4
            pad_hi[axis] = (0, 1)
            pad_lo[axis] = (1, 0)
            return jnp.pad(k, pad_hi) + jnp.pad(k, pad_lo)

        k4 = corr_ones2(corr_ones2(kernel, 0), 1)  # (4, 4, C, O)
        dn = jax.lax.conv_dimension_numbers(x.shape, (4, 4, C, O),
                                            ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            x, k4, window_strides=(1, 1), padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2), dimension_numbers=dn,
            preferred_element_type=self.dtype)
        return out + bias


class VAEDecoder(nn.Module):
    """latents -> image in [-1, 1]."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    #: compute upsampler convs via the parity decomposition (4/9 FLOPs,
    #: no 2x-res intermediate); numerics identical to repeat+conv
    parity_upsample: bool = False
    #: compute upsampler convs as one lhs-dilated conv (FusedUpsampleConv):
    #: the measured winner at 1024^2 decode (87.8 -> 69.3 ms, r5); exact
    #: same function/params as repeat+conv — DEFAULT ON
    fused_upsample: bool = True

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        z = z.astype(self.dtype)
        if cfg.use_quant_conv:
            z = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype,
                        name="post_quant_conv")(z)
        rev = tuple(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        h = VAEMidBlock(rev[0], cfg.norm_num_groups, cfg.norm_eps,
                        dtype=self.dtype, name="mid_block")(h)
        for bi, out_ch in enumerate(rev):
            for li in range(cfg.layers_per_block + 1):
                h = VAEResnetBlock(out_ch, cfg.norm_num_groups, cfg.norm_eps,
                                   dtype=self.dtype,
                                   name=f"up_blocks_{bi}_resnets_{li}")(h)
            if bi < len(rev) - 1:
                name = f"up_blocks_{bi}_upsamplers_0_conv"
                # explicit parity_upsample=True (an ablation flag) takes
                # precedence over the fused DEFAULT — otherwise the parity
                # ablation silently measures the fused path
                if self.parity_upsample:
                    h = ParityUpsampleConv(out_ch, dtype=self.dtype,
                                           name=name)(h)
                elif self.fused_upsample:
                    h = FusedUpsampleConv(out_ch, dtype=self.dtype,
                                          name=name)(h)
                else:
                    h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                    h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                                name=name)(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps,
                         dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h).astype(jnp.float32)


def sample_diagonal_gaussian(moments, noise):
    """moments (B,H,W,2C) + standard normal noise (B,H,W,C) -> latent sample.

    logvar clamped to [-30, 20] (reference Encoder.swift:70-73).
    """
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return mean + jnp.exp(0.5 * logvar) * noise
