"""Sharded diffusion training step (epsilon-prediction MSE).

The reference ships no training at all; this provides the standard
fine-tuning objective (DDPM epsilon MSE) as a single pjit-compiled step over
a (dp, tp) mesh: grads all-reduce over dp, tensor-parallel params stay
sharded over tp.  XLA inserts all collectives from the sharding annotations.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..schedulers.base import SchedulerConfig
from .sharding import batch_sharding, param_sharding_rules


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


jax.tree_util.register_dataclass(TrainState,
                                 data_fields=["params", "opt_state", "step"],
                                 meta_fields=[])


def make_train_step(model, optimizer: optax.GradientTransformation,
                    mesh, scheduler_config: SchedulerConfig | None = None,
                    added_cond_fn: Callable | None = None,
                    remat: bool = False):
    """Returns (init_fn, step_fn), both jit-compiled against the mesh.

    ``step_fn(state, batch)`` with batch = {latents (B,H,W,C) clean latents,
    context (B,S,C_ctx), rng (key)}; samples timesteps + noise, computes
    eps-MSE loss, applies one optimizer update.

    ``remat=True`` rematerializes the denoiser forward in the backward pass
    (jax.checkpoint) — trades ~1/3 more FLOPs for dropping activation
    storage, the standard HBM lever for larger per-chip batch.
    """
    cfg = scheduler_config or SchedulerConfig()
    acp = jnp.asarray(cfg.alphas_cumprod(), jnp.float32)

    apply_fn = lambda p, *a, **kw: model.apply({"params": p}, *a, **kw)  # noqa: E731
    if remat:
        apply_fn = jax.checkpoint(apply_fn,
                                  policy=jax.checkpoint_policies.nothing_saveable)

    def loss_fn(params, batch):
        latents = batch["latents"]
        B = latents.shape[0]
        k1, k2 = jax.random.split(batch["rng"])
        t = jax.random.randint(k1, (B,), 0, cfg.num_train_timesteps)
        noise = jax.random.normal(k2, latents.shape, jnp.float32)
        a = acp[t][:, None, None, None]
        noisy = jnp.sqrt(a) * latents + jnp.sqrt(1 - a) * noise
        kwargs = {}
        if added_cond_fn is not None:
            kwargs["added_cond"] = added_cond_fn(B)
        pred = apply_fn(params, noisy, t.astype(jnp.float32),
                        batch["context"], **kwargs)
        return jnp.mean((pred - noise) ** 2)

    def step_fn(state: TrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def init_fn(params):
        from jax.sharding import NamedSharding, PartitionSpec

        shardings = param_sharding_rules(params, mesh)
        # copy before placing: device_put may zero-copy-alias host buffers,
        # and step_fn's donation would then delete the caller's arrays
        params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        params = jax.tree.map(jax.device_put, params, shardings)
        opt_state = optimizer.init(params)
        # pin optimizer scalars (adam counts etc.) to the mesh so every
        # TrainState leaf has a fully-specified mesh sharding (required for
        # checkpoint restore round trips)
        replicated = NamedSharding(mesh, PartitionSpec())

        def place(x):
            if hasattr(x, "sharding") and getattr(x.sharding, "mesh", None) is mesh:
                return x
            return jax.device_put(x, replicated)

        opt_state = jax.tree.map(place, opt_state)
        step = jax.device_put(jnp.zeros((), jnp.int32), replicated)
        return TrainState(params, opt_state, step)

    return init_fn, jax.jit(step_fn, donate_argnums=0)
