"""Euler ancestral scheduler (stochastic; consumes one noise draw per step).

Noise is supplied by the pipeline (host-parity RNG streams or in-scan
`jax.random`), matching the reference's RandomSource plumbing.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import SchedulerPlan
from .euler import EulerScheduler, _euler_pred_x0


class EulerAncestralScheduler(EulerScheduler):
    needs_noise = True

    def set_timesteps(self, num_inference_steps: int, strength: float = 1.0) -> SchedulerPlan:
        ts, sigmas, init_noise_sigma = self._plan_tables(num_inference_steps, strength)
        # precompute ancestral up/down sigmas per step
        s_from = sigmas[:-1]
        s_to = sigmas[1:]
        with np.errstate(divide="ignore", invalid="ignore"):
            sigma_up = np.sqrt(np.clip(s_to**2 * (s_from**2 - s_to**2) / s_from**2, 0, None))
        sigma_down = np.sqrt(np.clip(s_to**2 - sigma_up**2, 0, None))
        return SchedulerPlan(
            timesteps=jnp.asarray(ts, jnp.float32),
            num_steps=len(ts),
            init_noise_sigma=init_noise_sigma,
            tables={
                "sigmas": jnp.asarray(sigmas, jnp.float32),
                "sigma_up": jnp.asarray(sigma_up, jnp.float32),
                "sigma_down": jnp.asarray(sigma_down, jnp.float32),
            },
        )

    def step(self, plan, state, model_output, i, sample, noise=None):
        if noise is None:
            raise ValueError("EulerAncestralScheduler.step requires noise")
        sigma = plan.table("sigmas")[i]
        sigma_up = plan.table("sigma_up")[i]
        sigma_down = plan.table("sigma_down")[i]
        x0 = _euler_pred_x0(sample, model_output, sigma, self.config.prediction_type)
        derivative = (sample - x0) / sigma
        prev = sample + derivative * (sigma_down - sigma) + noise * sigma_up
        return state, prev
