"""Euler discrete scheduler (k-diffusion style), diffusers-compatible.

Exposed by the reference Python pipeline's scheduler map (pipeline.py:592-604).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import (
    PredictionType,
    Scheduler,
    SchedulerPlan,
    TimestepSpacing,
    karras_sigma_ramp,
    sigma_to_timestep,
    spaced_timesteps,
    strength_slice,
)


def _ratio_sigmas(config, timesteps: np.ndarray) -> np.ndarray:
    """k-diffusion sigmas sigma = sqrt((1-acp)/acp) interpolated at (possibly
    fractional) training timesteps."""
    acp = config.alphas_cumprod()
    all_sigmas = np.sqrt((1 - acp) / acp)
    return np.interp(timesteps, np.arange(len(all_sigmas)), all_sigmas)


def _euler_pred_x0(sample, model_output, sigma, prediction_type):
    if prediction_type == PredictionType.EPSILON:
        return sample - sigma * model_output
    if prediction_type == PredictionType.V_PREDICTION:
        return model_output * (-sigma / jnp.sqrt(sigma**2 + 1)) + sample / (sigma**2 + 1)
    return model_output


class EulerScheduler(Scheduler):
    def _plan_tables(self, num_inference_steps: int, strength: float):
        cfg = self.config
        if cfg.timestep_spacing == TimestepSpacing.KARRAS:
            # diffusers use_karras_sigmas: Karras-ramped sigmas mapped back
            # to (fractional) training timesteps — same construction the
            # DPM++ scheduler uses (dpm_solver.py / reference DPMSolver
            # sigmaToTimestep :247-267)
            acp = cfg.alphas_cumprod()
            all_sigmas = np.sqrt((1 - acp) / acp)
            sigmas = karras_sigma_ramp(float(all_sigmas.min()),
                                       float(all_sigmas.max()),
                                       num_inference_steps)
            ts = sigma_to_timestep(sigmas, all_sigmas)
        else:
            ts = spaced_timesteps(cfg.num_train_timesteps,
                                  num_inference_steps,
                                  cfg.timestep_spacing, cfg.steps_offset)
            sigmas = _ratio_sigmas(cfg, ts)
        sigmas = np.concatenate([sigmas, [0.0]])
        start = strength_slice(num_inference_steps, strength)
        ts = ts[start:]
        sigmas = sigmas[start:]
        if cfg.timestep_spacing == TimestepSpacing.LEADING:
            init_noise_sigma = float(np.sqrt(sigmas.max() ** 2 + 1))
        else:  # linspace/trailing/karras (diffusers parity)
            init_noise_sigma = float(sigmas.max())
        return ts, sigmas, init_noise_sigma

    def set_timesteps(self, num_inference_steps: int, strength: float = 1.0) -> SchedulerPlan:
        ts, sigmas, init_noise_sigma = self._plan_tables(num_inference_steps, strength)
        return SchedulerPlan(
            timesteps=jnp.asarray(ts, jnp.float32),
            num_steps=len(ts),
            init_noise_sigma=init_noise_sigma,
            tables={"sigmas": jnp.asarray(sigmas, jnp.float32)},
        )

    def scale_model_input(self, plan, state, sample, i):
        sigma = plan.table("sigmas")[i]
        return sample / jnp.sqrt(sigma**2 + 1)

    def step(self, plan, state, model_output, i, sample, noise=None):
        sigmas = plan.table("sigmas")
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        x0 = _euler_pred_x0(sample, model_output, sigma, self.config.prediction_type)
        derivative = (sample - x0) / sigma
        prev = sample + derivative * (sigma_next - sigma)
        return state, prev

    def add_noise(self, plan, original, noise, i=0):
        return original + noise * plan.table("sigmas")[i]

    def pred_x0(self, plan, state, model_output, i, sample):
        # sigma-space convention x = x0 + sigma*eps (k-diffusion)
        return _euler_pred_x0(sample, model_output, plan.table("sigmas")[i],
                              self.config.prediction_type)
