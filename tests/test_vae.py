"""VAE tests: block-level torch parity, tiny encoder/decoder shape tests,
diagonal-Gaussian sampling semantics (reference Encoder.swift:69-83)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ml_stable_diffusion_tpu.convert.report import report_correctness
from ml_stable_diffusion_tpu.convert.vae import (
    _vae_attention,
    _vae_resnet,
    port_vae_decoder,
    port_vae_encoder,
)
from ml_stable_diffusion_tpu.models.vae import (
    VAEAttentionBlock,
    VAEConfig,
    VAEDecoder,
    VAEEncoder,
    VAEResnetBlock,
    sample_diagonal_gaussian,
)

TINY = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                 norm_num_groups=8, latent_channels=4)


class _TorchVAEResnet(torch.nn.Module):
    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = torch.nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (torch.nn.Conv2d(cin, cout, 1)
                              if cin != cout else torch.nn.Identity())

    def forward(self, x):
        h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
        h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
        return self.conv_shortcut(x) + h


def test_vae_resnet_parity():
    torch.manual_seed(0)
    tm = _TorchVAEResnet(16, 32, 8).eval()
    params = _vae_resnet(tm.state_dict(), "")
    x = torch.randn(2, 16, 8, 8)
    with torch.no_grad():
        ref = tm(x).numpy()
    out = VAEResnetBlock(out_channels=32, groups=8).apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    report_correctness(np.asarray(out).transpose(0, 3, 1, 2), ref, "vae_resnet")


class _TorchVAEAttention(torch.nn.Module):
    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = torch.nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = torch.nn.Linear(c, c)
        self.to_k = torch.nn.Linear(c, c)
        self.to_v = torch.nn.Linear(c, c)
        self.to_out = torch.nn.ModuleList([torch.nn.Linear(c, c)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).flatten(2).transpose(1, 2)  # B, HW, C
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        w = torch.softmax(q @ k.transpose(1, 2) * C ** -0.5, dim=-1)
        h = self.to_out[0](w @ v)
        return x + h.transpose(1, 2).view(B, C, H, W)


def test_vae_attention_parity():
    torch.manual_seed(1)
    tm = _TorchVAEAttention(32, 8).eval()
    sd = {k.replace("to_out.0", "to_out.0"): v for k, v in tm.state_dict().items()}
    params = _vae_attention(sd, "")
    x = torch.randn(1, 32, 6, 6)
    with torch.no_grad():
        ref = tm(x).numpy()
    out = VAEAttentionBlock(channels=32, groups=8).apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    report_correctness(np.asarray(out).transpose(0, 3, 1, 2), ref, "vae_attn")


def test_encoder_decoder_shapes_and_roundtrip():
    enc = VAEEncoder(TINY)
    dec = VAEDecoder(TINY)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    ep = enc.init(jax.random.key(0), x)
    moments = enc.apply(ep, x)
    # one downsample (2 blocks) -> 16x16, 2*latent channels
    assert moments.shape == (1, 16, 16, 8)
    z = sample_diagonal_gaussian(moments, jnp.zeros((1, 16, 16, 4)))
    dp = dec.init(jax.random.key(1), z)
    img = dec.apply(dp, z)
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_sd3_16ch_config():
    cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                    norm_num_groups=8, latent_channels=16, use_quant_conv=False)
    enc = VAEEncoder(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    ep = enc.init(jax.random.key(0), x)
    assert enc.apply(ep, x).shape == (1, 8, 8, 32)
    assert "quant_conv" not in ep["params"]


def test_diagonal_gaussian_clamp():
    moments = jnp.concatenate([
        jnp.zeros((1, 2, 2, 4)),                 # mean 0
        jnp.full((1, 2, 2, 4), 100.0),           # logvar huge -> clamp to 20
    ], axis=-1)
    z = sample_diagonal_gaussian(moments, jnp.ones((1, 2, 2, 4)))
    np.testing.assert_allclose(np.asarray(z), np.exp(10.0), rtol=1e-5)
    # zero noise -> mean exactly
    z0 = sample_diagonal_gaussian(moments, jnp.zeros((1, 2, 2, 4)))
    np.testing.assert_allclose(np.asarray(z0), 0.0)


def test_vae_port_roundtrip():
    """flax init -> synthetic diffusers state dict -> port -> exact match."""
    enc = VAEEncoder(TINY)
    x = jnp.zeros((1, 16, 16, 3))
    params = enc.init(jax.random.key(0), x)["params"]

    torch_sd = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [p.key for p in path]
        mod = "/".join(keys[:-1])
        dname = ("encoder." + mod) if not mod.startswith("quant_conv") else mod
        dname = (dname
                 .replace("down_blocks_", "down_blocks.")
                 .replace("_resnets_", ".resnets.")
                 .replace("_downsamplers_0_conv", ".downsamplers.0.conv")
                 .replace("mid_block/resnets_", "mid_block/resnets.")
                 .replace("mid_block/attentions_0", "mid_block/attentions.0")
                 .replace("to_out_0", "to_out.0")
                 .replace("/", "."))
        if dname == "encoder.quant_conv":
            dname = "quant_conv"
        leafname = keys[-1]
        v = np.asarray(leaf)
        if leafname == "kernel":
            torch_sd[dname + ".weight"] = (v.transpose(3, 2, 0, 1)
                                           if v.ndim == 4 else v.T)
        elif leafname == "scale":
            torch_sd[dname + ".weight"] = v
        else:
            torch_sd[dname + ".bias"] = v

    ported = port_vae_encoder(torch_sd, TINY)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(ported)}
    for p, v in jax.tree_util.tree_leaves_with_path(params):
        key = jax.tree_util.keystr(p)
        assert key in flat_b, key
        np.testing.assert_array_equal(np.asarray(v), flat_b[key], err_msg=key)


def test_vae_resnet_parity_structured():
    """Structured weights (distinct per-tensor means + ramps) — catches
    swapped norm scale/shift or transposed convs that random weights mask."""
    from helpers import structure_torch_module

    tm = structure_torch_module(_TorchVAEResnet(16, 32, 8).eval())
    params = _vae_resnet(tm.state_dict(), "")
    x = torch.randn(2, 16, 8, 8) * 0.5
    with torch.no_grad():
        ref = tm(x).numpy()
    out = VAEResnetBlock(out_channels=32, groups=8).apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    report_correctness(np.asarray(out).transpose(0, 3, 1, 2), ref,
                       "vae_resnet.structured")


def test_vae_attention_parity_structured():
    from helpers import structure_torch_module

    tm = structure_torch_module(_TorchVAEAttention(32, 8).eval())
    params = _vae_attention(dict(tm.state_dict()), "")
    x = torch.randn(1, 32, 6, 6) * 0.5
    with torch.no_grad():
        ref = tm(x).numpy()
    out = VAEAttentionBlock(channels=32, groups=8).apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    report_correctness(np.asarray(out).transpose(0, 3, 1, 2), ref,
                       "vae_attn.structured")


def test_parity_upsample_matches_repeat_conv():
    """ParityUpsampleConv (4 parity-aligned 2x2 convs, no 2x intermediate)
    is the same function as repeat(2,2) + SAME conv3x3 — identical param
    tree, identical output, including odd spatial dims (edge-pad taps)."""
    cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                    norm_num_groups=4)
    dec = VAEDecoder(cfg, fused_upsample=False)  # explicit repeat+conv ref
    fast = VAEDecoder(cfg, parity_upsample=True, fused_upsample=False)
    z = jnp.asarray(np.random.RandomState(0).randn(2, 6, 5, 4), np.float32)
    params = jax.jit(dec.init)(jax.random.key(0), z)["params"]
    ref = jax.jit(lambda p, z: dec.apply({"params": p}, z))(params, z)
    out = jax.jit(lambda p, z: fast.apply({"params": p}, z))(params, z)
    assert out.shape == ref.shape == (2, 48, 40, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_parity_flag_overrides_fused_default():
    """An explicit parity_upsample=True must actually run the parity path
    even though fused_upsample defaults True (review r5: the fused branch
    shadowed it, so the parity ABLATION silently measured the fused path).
    The parity decomposition traces 4 convs per upsampler vs 1 fused —
    distinguishable in the jaxpr."""
    cfg = VAEConfig(block_out_channels=(8, 8), layers_per_block=1,
                    norm_num_groups=4)
    z = jnp.zeros((1, 6, 5, 4), np.float32)

    def n_convs(dec):
        params = jax.eval_shape(
            lambda k: dec.init(k, z), jax.random.key(0))["params"]
        jaxpr = jax.make_jaxpr(
            lambda p, z: dec.apply({"params": p}, z))(params, z)
        return str(jaxpr).count("conv_general_dilated")

    fused = n_convs(VAEDecoder(cfg))  # fused default on
    parity = n_convs(VAEDecoder(cfg, parity_upsample=True))
    assert parity == fused + 3  # 4 parity convs replace the 1 fused conv


def test_fused_upsample_matches_repeat_conv():
    """FusedUpsampleConv (one lhs-dilated conv with the W*ones(2,2)
    composed 4x4 kernel) is the same function as repeat(2,2) + SAME
    conv3x3 — identical param tree, identical output, odd dims included."""
    cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                    norm_num_groups=4)
    dec = VAEDecoder(cfg, fused_upsample=False)  # explicit repeat+conv ref
    fast = VAEDecoder(cfg, fused_upsample=True)
    z = jnp.asarray(np.random.RandomState(1).randn(2, 6, 5, 4), np.float32)
    params = jax.jit(dec.init)(jax.random.key(0), z)["params"]
    ref = jax.jit(lambda p, z: dec.apply({"params": p}, z))(params, z)
    out = jax.jit(lambda p, z: fast.apply({"params": p}, z))(params, z)
    assert out.shape == ref.shape == (2, 48, 40, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
