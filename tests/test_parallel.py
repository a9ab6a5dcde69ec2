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
