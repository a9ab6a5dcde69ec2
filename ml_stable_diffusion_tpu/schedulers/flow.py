"""Discrete flow (rectified-flow) scheduler for SD3.

Shifted sigma schedule sigma' = shift*sigma / (1 + (shift-1)*sigma) and an
Euler velocity step — the reference's DiscreteFlowScheduler.swift:47-118 with
float timesteps (:82).  The denoiser (MMDiT) predicts velocity; the step is
x_{next} = x + (sigma_next - sigma) * v.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import Scheduler, SchedulerConfig, SchedulerPlan, strength_slice


class DiscreteFlowScheduler(Scheduler):
    float_timesteps = True

    def __init__(self, config: SchedulerConfig | None = None, shift: float = 3.0, **overrides):
        super().__init__(config, **overrides)
        self.shift = float(shift)

    def set_timesteps(self, num_inference_steps: int, strength: float = 1.0) -> SchedulerPlan:
        S = num_inference_steps
        T = self.config.num_train_timesteps
        # descending sigma grid 1 -> 1/S, then the terminal 0
        t = np.linspace(1.0, 1.0 / S, S)
        sigmas = self.shift * t / (1.0 + (self.shift - 1.0) * t)
        sigmas = np.concatenate([sigmas, [0.0]])
        ts = sigmas[:-1] * T

        start = strength_slice(S, strength)
        ts, sigmas = ts[start:], sigmas[start:]

        return SchedulerPlan(
            timesteps=jnp.asarray(ts, jnp.float32),
            num_steps=len(ts),
            init_noise_sigma=1.0,
            tables={"sigmas": jnp.asarray(sigmas, jnp.float32)},
        )

    def step(self, plan, state, model_output, i, sample, noise=None):
        sigmas = plan.table("sigmas")
        prev = sample + (sigmas[i + 1] - sigmas[i]) * model_output
        return state, prev

    def add_noise(self, plan, original, noise, i=0):
        sigma = plan.table("sigmas")[i]
        return (1.0 - sigma) * original + sigma * noise

    def pred_x0(self, plan, state, model_output, i, sample):
        # denoised = x - sigma*v (reference DiscreteFlowScheduler.swift:102-118
        # with v = (x - denoised)/sigma)
        return sample - plan.table("sigmas")[i] * model_output

    def __hash__(self):
        return hash((type(self), self.config, self.shift))

    def __eq__(self, other):
        return (type(self) is type(other) and self.config == other.config
                and self.shift == other.shift)
