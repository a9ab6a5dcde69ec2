"""DDIM (eta=0 deterministic sampler).

The reference exposes diffusers' DDIMScheduler through its Python pipeline
(pipeline.py:592-604).  Per-step alpha products are precomputed host-side;
the update is a two-FMA elementwise op that fuses into the scan body.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import (
    Scheduler,
    SchedulerPlan,
    TimestepSpacing,
    pred_original_sample,
    spaced_timesteps,
    strength_slice,
    to_epsilon,
)


class DDIMScheduler(Scheduler):
    def set_timesteps(self, num_inference_steps: int, strength: float = 1.0) -> SchedulerPlan:
        cfg = self.config
        ts = spaced_timesteps(cfg.num_train_timesteps, num_inference_steps,
                              cfg.timestep_spacing, cfg.steps_offset)
        acp = cfg.alphas_cumprod()
        idx = ts.astype(np.int64)
        prev_idx = idx - cfg.num_train_timesteps // num_inference_steps
        alpha_t = acp[idx]
        alpha_prev = np.where(prev_idx >= 0, acp[np.clip(prev_idx, 0, None)], 1.0)

        start = strength_slice(num_inference_steps, strength)
        ts, alpha_t, alpha_prev = ts[start:], alpha_t[start:], alpha_prev[start:]

        tables = {
            "sqrt_alpha_t": jnp.asarray(np.sqrt(alpha_t), jnp.float32),
            "sqrt_one_minus_alpha_t": jnp.asarray(np.sqrt(1 - alpha_t), jnp.float32),
            "sqrt_alpha_prev": jnp.asarray(np.sqrt(alpha_prev), jnp.float32),
            "sqrt_one_minus_alpha_prev": jnp.asarray(np.sqrt(1 - alpha_prev), jnp.float32),
        }
        return SchedulerPlan(
            timesteps=jnp.asarray(ts, jnp.float32),
            num_steps=len(ts),
            init_noise_sigma=1.0,
            tables=tables,
        )

    def step(self, plan: SchedulerPlan, state, model_output, i, sample, noise=None):
        a_t = plan.table("sqrt_alpha_t")[i]
        s_t = plan.table("sqrt_one_minus_alpha_t")[i]
        a_p = plan.table("sqrt_alpha_prev")[i]
        s_p = plan.table("sqrt_one_minus_alpha_prev")[i]
        x0 = pred_original_sample(sample, model_output, a_t, s_t, self.config.prediction_type)
        eps = to_epsilon(sample, model_output, a_t, s_t, self.config.prediction_type)
        prev = a_p * x0 + s_p * eps
        return state, prev

    def add_noise(self, plan: SchedulerPlan, original, noise, i=0):
        a_t = plan.table("sqrt_alpha_t")[i]
        s_t = plan.table("sqrt_one_minus_alpha_t")[i]
        return a_t * original + s_t * noise
