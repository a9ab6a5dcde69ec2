"""Sharding / multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from ml_stable_diffusion_tpu.parallel import (
    batch_sharding,
    make_mesh,
    make_train_step,
    param_sharding_rules,
    shard_params,
)

from helpers import tiny_unet

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"dp": 1, "tp": 8}
    mesh = make_mesh(8, dp=2)
    assert dict(mesh.shape) == {"dp": 2, "tp": 4}
    with pytest.raises(ValueError):
        make_mesh(8, dp=3)


def test_param_sharding_rules_pick_axes():
    mesh = make_mesh(8, dp=2)  # tp=4
    params = {
        "attn1": {"to_q": {"kernel": jnp.zeros((64, 64))},
                  "to_out_0": {"kernel": jnp.zeros((64, 64))}},
        "norm1": {"scale": jnp.zeros((64,))},
        "conv1": {"kernel": jnp.zeros((3, 3, 64, 64))},
    }
    sh = param_sharding_rules(params, mesh)
    assert sh["attn1"]["to_q"]["kernel"].spec == P(None, "tp")
    assert sh["attn1"]["to_out_0"]["kernel"].spec == P("tp", None)
    assert sh["norm1"]["scale"].spec == P()
    assert sh["conv1"]["kernel"].spec == P(None, None, None, "tp")


def test_sharded_unet_forward_matches_single_device():
    """Tensor-parallel execution must be numerically identical (within fp
    tolerance) to single-device execution."""
    model, params = tiny_unet()
    mesh = make_mesh(4, dp=1)
    sample = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4), jnp.float32)
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 77, 48), jnp.float32)
    t = jnp.ones((2,))

    ref = model.apply({"params": params}, sample, t, ctx)

    sharded = shard_params(params, mesh)
    out = jax.jit(lambda p, s, t, c: model.apply({"params": p}, s, t, c))(
        sharded, sample, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_train_step_remat_matches():
    """remat=True must compute the same loss (only memory behavior differs)."""
    model, params = tiny_unet()
    mesh = make_mesh(2, dp=1)
    batch = {
        "latents": jax.device_put(jnp.zeros((2, 8, 8, 4)),
                                  batch_sharding(mesh, 4)),
        "context": jax.device_put(jnp.zeros((2, 77, 48)),
                                  batch_sharding(mesh, 3)),
        "rng": jax.random.key(0),
    }
    losses = []
    for remat in (False, True):
        init_fn, step_fn = make_train_step(model, optax.sgd(1e-3), mesh,
                                           remat=remat)
        _, loss = step_fn(init_fn(params), dict(batch))
        losses.append(float(loss))
    assert np.isclose(losses[0], losses[1], rtol=1e-5)


@pytest.mark.slow
def test_spatial_sharded_forward_matches_single_device():
    """Spatial (sequence) parallelism: latent H sharded over 'tp'; GSPMD's
    conv halo exchanges + attention gathers must reproduce the unsharded
    output."""
    from ml_stable_diffusion_tpu.parallel import make_spatial_sharded_forward

    model, params = tiny_unet()
    mesh = make_mesh(8, dp=2)
    sample = jnp.asarray(np.random.RandomState(0).randn(2, 16, 8, 4),
                         jnp.float32)
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 77, 48), jnp.float32)
    t = jnp.ones((2,))

    ref = model.apply({"params": params}, sample, t, ctx)
    fwd = make_spatial_sharded_forward(model, mesh)
    out = fwd(params, sample, t, ctx)
    assert out.sharding.spec == P("dp", "tp", None, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_tensor_sharded_forward_matches_single_device():
    from ml_stable_diffusion_tpu.parallel import make_tensor_sharded_forward

    model, params = tiny_unet()
    mesh = make_mesh(4, dp=1)
    sample = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4),
                         jnp.float32)
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 77, 48), jnp.float32)
    t = jnp.ones((2,))

    ref = model.apply({"params": params}, sample, t, ctx)
    placed, fwd = make_tensor_sharded_forward(model, mesh, params)
    out = fwd(placed, sample, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_mmdit_sharding_rules_are_not_noops():
    """Regression for the silent no-op the r2 review flagged: every large
    MMDiT/T5 projection must receive a non-replicated spec (name-matching
    the actual module names, not the UNet's)."""
    from ml_stable_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
    from ml_stable_diffusion_tpu.models.t5 import T5Config, T5Encoder

    mesh = make_mesh(4, dp=1)
    cfg = MMDiTConfig(patch_size=2, in_channels=4, out_channels=4, depth=2,
                      hidden_size=32, num_heads=4, context_dim=64,
                      pooled_dim=32, pos_embed_max_size=8)
    mm = MMDiT(cfg)
    p = jax.jit(mm.init)(jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
                         jnp.zeros((1,)), jnp.zeros((1, 6, 64)),
                         jnp.zeros((1, 32)))["params"]
    sh = param_sharding_rules(p, mesh)
    blk = sh["blocks_0"]
    for col in ("to_q", "add_q_proj", "ff_proj", "ff_context_proj",
                "norm1_linear", "norm1_context_linear"):
        assert blk[col]["kernel"].spec == P(None, "tp"), col
    for row in ("to_out_0", "to_add_out", "ff_out", "ff_context_out"):
        assert blk[row]["kernel"].spec == P("tp", None), row
    assert sh["context_embedder"]["kernel"].spec == P(None, "tp")
    assert sh["norm_out_linear"]["kernel"].spec == P(None, "tp")
    assert sh["pos_embed"].spec == P(None, None, "tp")

    t5cfg = T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64,
                     num_layers=2, num_heads=4)
    t5 = T5Encoder(t5cfg)
    tp = jax.jit(t5.init)(jax.random.key(0),
                          jnp.zeros((1, 8), jnp.int32))["params"]
    tsh = param_sharding_rules(tp, mesh)
    b = tsh["block_0"]
    for col in ("q", "k", "v", "wi_0", "wi_1"):
        assert b[col]["kernel"].spec == P(None, "tp"), col
    for row in ("o", "wo"):
        assert b[row]["kernel"].spec == P("tp", None), row
    assert tsh["shared"]["embedding"].spec == P(None, "tp")


def test_sharded_mmdit_forward_matches_single_device():
    from ml_stable_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig

    cfg = MMDiTConfig(patch_size=2, in_channels=4, out_channels=4, depth=2,
                      hidden_size=32, num_heads=4, context_dim=64,
                      pooled_dim=32, pos_embed_max_size=8)
    mm = MMDiT(cfg)
    lat = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4), jnp.float32)
    t = jnp.full((2,), 500.0)
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 6, 64), jnp.float32)
    pooled = jnp.asarray(np.random.RandomState(2).randn(2, 32), jnp.float32)
    params = jax.jit(mm.init)(jax.random.key(0), lat, t, ctx, pooled)["params"]

    ref = mm.apply({"params": params}, lat, t, ctx, pooled)
    mesh = make_mesh(4, dp=1)
    sharded = shard_params(params, mesh)
    out = jax.jit(lambda p, *a: mm.apply({"params": p}, *a))(
        sharded, lat, t, ctx, pooled)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_sharded_t5_forward_matches_single_device():
    from ml_stable_diffusion_tpu.models.t5 import T5Config, T5Encoder

    cfg = T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64,
                   num_layers=2, num_heads=4)
    t5 = T5Encoder(cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(3, 90, (2, 8)))
    mask = jnp.asarray([[1] * 8, [1] * 5 + [0] * 3])
    params = jax.jit(t5.init)(jax.random.key(0), ids, mask)["params"]

    ref = t5.apply({"params": params}, ids, mask)["encoder_hidden_states"]
    mesh = make_mesh(4, dp=1)
    sharded = shard_params(params, mesh)
    out = jax.jit(lambda p, i, m: t5.apply(
        {"params": p}, i, m)["encoder_hidden_states"])(sharded, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_sharded_pipeline_generate_matches_single_device(tmp_path):
    """pipe.shard(mesh): the FULL generation program (encode -> denoise scan
    -> decode) runs under GSPMD and reproduces single-device latents."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from helpers import tiny_tokenizer, tiny_text_encoder, tiny_unet, tiny_vae
    from ml_stable_diffusion_tpu.pipelines import PipelineConfiguration
    from ml_stable_diffusion_tpu.pipelines.sd import StableDiffusionPipeline

    (dec, dec_params), _ = tiny_vae()
    pipe = StableDiffusionPipeline(
        tokenizer=tiny_tokenizer(tmp_path),
        text_encoder=tiny_text_encoder(),
        unet=tiny_unet(), vae_decoder=(dec, dec_params))
    gen = PipelineConfiguration(prompt="a cat", step_count=2, seed=3,
                                disable_safety=True)
    ref = pipe.generate_images(gen, image_hw=(64, 64)).latents
    pipe.shard(make_mesh(4, dp=1))
    out = pipe.generate_images(gen, image_hw=(64, 64)).latents
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_train_step_runs_and_reduces_loss():
    model, params = tiny_unet()
    mesh = make_mesh(8, dp=2)
    init_fn, step_fn = make_train_step(model, optax.adamw(1e-3), mesh)
    state = init_fn(params)
    batch = {
        "latents": jax.device_put(
            jnp.zeros((4, 8, 8, 4)), batch_sharding(mesh, 4)),
        "context": jax.device_put(
            jnp.zeros((4, 77, 48)), batch_sharding(mesh, 3)),
        "rng": jax.random.key(0),
    }
    losses = []
    for i in range(3):
        batch["rng"] = jax.random.key(0)  # same noise draw each step
        state, loss = step_fn(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # optimizing the same batch must descend
    assert int(state.step) == 3


@pytest.mark.slow
def test_sharded_sdxl_pipeline_generate_matches_single_device(tmp_path):
    """SDXL family under GSPMD: dual encoders, text_time micro-conditioning,
    refiner handoff — pipe.shard(mesh) must reproduce single-device latents
    (the MMDiT/T5/XL sharding rules also execute in dryrun_multichip)."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from helpers import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae
    from ml_stable_diffusion_tpu.pipelines import PipelineConfiguration
    from ml_stable_diffusion_tpu.pipelines.sdxl import (
        StableDiffusionXLPipeline,
    )

    (dec, dec_params), _ = tiny_vae()
    pipe = StableDiffusionXLPipeline(
        tokenizer=tiny_tokenizer(tmp_path), tokenizer2=tiny_tokenizer(tmp_path),
        text_encoder=tiny_text_encoder(),
        text_encoder2=tiny_text_encoder(use_projection=True),
        unet=tiny_unet(cross_dim=96, xl=True),
        vae_decoder=(dec, dec_params))
    gen = PipelineConfiguration(prompt="a cat", step_count=2, seed=3,
                                disable_safety=True, scheduler="DDIM")
    ref = pipe.generate_images(gen, image_hw=(64, 64)).latents
    pipe.shard(make_mesh(4, dp=1))
    out = pipe.generate_images(gen, image_hw=(64, 64)).latents
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_sharded_sd3_pipeline_generate_matches_single_device(tmp_path):
    """SD3 family under GSPMD (VERDICT r4 #5): triple-encoder concat +
    context zero-pad + pooled concat, 16-ch VAE, flow scheduler — the full
    end-to-end program runs under the mesh and reproduces single-device
    latents (previously only the TP MMDiT/T5 *forwards* were exercised)."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from helpers import tiny_text_encoder, tiny_tokenizer
    from ml_stable_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
    from ml_stable_diffusion_tpu.models.t5 import T5Config, T5Encoder
    from ml_stable_diffusion_tpu.models.vae import VAEConfig, VAEDecoder
    from ml_stable_diffusion_tpu.pipelines import PipelineConfiguration
    from ml_stable_diffusion_tpu.pipelines.sd3 import StableDiffusion3Pipeline

    class _T5Tok:
        def tokenize(self, text, max_length=8):
            ids = [(ord(c) % 90) + 3 for c in text][: max_length - 1] + [1]
            mask = [1] * len(ids) + [0] * (max_length - len(ids))
            return (np.asarray(ids + [0] * (max_length - len(ids)),
                               np.int32), np.asarray(mask, np.int32))

    # context = concat(CLIP hidden 48+48) zero-padded to 128 = T5 d_model
    te = tiny_text_encoder(use_projection=True)
    v16 = VAEConfig(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                    norm_num_groups=4, latent_channels=16,
                    use_quant_conv=False)
    dec16 = VAEDecoder(v16)
    dec16_params = jax.jit(dec16.init)(
        jax.random.key(6), jnp.zeros((1, 8, 8, 16)))["params"]
    proj_dim = te[0].config.projection_dim
    mcfg = MMDiTConfig(patch_size=2, in_channels=16, out_channels=16,
                       depth=2, hidden_size=32, num_heads=4,
                       context_dim=128, pooled_dim=2 * proj_dim,
                       pos_embed_max_size=8)
    mm = MMDiT(mcfg)
    mm_params = jax.jit(mm.init)(
        jax.random.key(7), jnp.zeros((1, 8, 8, 16)), jnp.zeros((1,)),
        jnp.zeros((1, 10, 128)), jnp.zeros((1, 2 * proj_dim)))["params"]
    t5 = T5Encoder(T5Config(vocab_size=96, d_model=128, d_kv=8, d_ff=64,
                            num_layers=2, num_heads=4))
    t5_params = jax.jit(t5.init)(
        jax.random.key(8), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32))["params"]
    pipe = StableDiffusion3Pipeline(
        tokenizer=tiny_tokenizer(tmp_path), tokenizer2=tiny_tokenizer(tmp_path),
        t5_tokenizer=_T5Tok(), text_encoder=te, text_encoder2=te,
        t5_encoder=(t5, t5_params), mmdit=(mm, mm_params),
        vae_decoder=(dec16, dec16_params), t5_sequence_length=8)
    gen = PipelineConfiguration(prompt="a fox", step_count=2, seed=9,
                                disable_safety=True)
    ref = pipe.generate_images(gen, image_hw=(64, 64)).latents
    pipe.shard(make_mesh(4, dp=1))
    out = pipe.generate_images(gen, image_hw=(64, 64)).latents
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
