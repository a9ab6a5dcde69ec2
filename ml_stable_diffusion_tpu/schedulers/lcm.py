"""Latent Consistency Model scheduler (beyond the reference).

LCM / LCM-LoRA distilled models generate in 1-8 steps: each step predicts
the CLEAN latent through the consistency parameterization
``denoised = c_out * pred_x0 + c_skip * sample`` (boundary-condition
scalings from the distillation's sigma_data = 0.5, timestep_scaling = 10),
then — except on the final step — re-noises the denoised latent to the next
timestep with FRESH noise (diffusers LCMScheduler semantics).

Timesteps subsample the distillation's ``original_inference_steps`` (50)
DDIM grid: k = T // 50, origin ts = (1..50)*k - 1, then every
``len//num_steps``-th from the end.  Pairs with ``apply_lora`` on an
LCM-LoRA for few-step serving of any base checkpoint (guidance_scale <= 1
— LCM models embed guidance during distillation).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import (
    Scheduler,
    SchedulerPlan,
    pred_original_sample,
    strength_slice,
)

#: distillation constants (diffusers LCMScheduler defaults)
ORIGINAL_INFERENCE_STEPS = 50
SIGMA_DATA = 0.5
TIMESTEP_SCALING = 10.0


class LCMScheduler(Scheduler):
    needs_noise = True  # re-noise to the next timestep each non-final step

    def set_timesteps(self, num_inference_steps: int, strength: float = 1.0,
                      original_inference_steps: int = ORIGINAL_INFERENCE_STEPS
                      ) -> SchedulerPlan:
        cfg = self.config
        T = cfg.num_train_timesteps
        if num_inference_steps > original_inference_steps:
            raise ValueError(
                f"LCM supports at most {original_inference_steps} steps "
                f"(the distillation grid); got {num_inference_steps}")
        k = T // original_inference_steps
        origin = np.arange(1, original_inference_steps + 1) * k - 1  # asc
        skip = len(origin) // num_inference_steps
        ts = origin[::-skip][:num_inference_steps].astype(np.float64)  # desc

        acp = cfg.alphas_cumprod()
        ti = ts.astype(int)
        prev_ti = np.concatenate([ti[1:], [0]])  # final step: full denoise
        scaled = ts * TIMESTEP_SCALING
        c_skip = SIGMA_DATA**2 / (scaled**2 + SIGMA_DATA**2)
        c_out = scaled / np.sqrt(scaled**2 + SIGMA_DATA**2)

        start = strength_slice(num_inference_steps, strength)
        sl = slice(start, None)
        is_last = np.zeros(len(ts), bool)
        is_last[-1] = True
        tables = {
            "sqrt_alpha_t": jnp.asarray(np.sqrt(acp[ti]), jnp.float32)[sl],
            "sqrt_one_minus_alpha_t": jnp.asarray(
                np.sqrt(1 - acp[ti]), jnp.float32)[sl],
            "sqrt_alpha_prev": jnp.asarray(
                np.sqrt(acp[prev_ti]), jnp.float32)[sl],
            "sqrt_one_minus_alpha_prev": jnp.asarray(
                np.sqrt(1 - acp[prev_ti]), jnp.float32)[sl],
            "c_skip": jnp.asarray(c_skip, jnp.float32)[sl],
            "c_out": jnp.asarray(c_out, jnp.float32)[sl],
            "is_last": jnp.asarray(is_last)[sl],
        }
        return SchedulerPlan(timesteps=jnp.asarray(ts, jnp.float32)[sl],
                             num_steps=len(ts) - start,
                             init_noise_sigma=1.0, tables=tables)

    def step(self, plan, state, model_output, i, sample, noise=None):
        a_t = plan.table("sqrt_alpha_t")[i]
        s_t = plan.table("sqrt_one_minus_alpha_t")[i]
        x0 = pred_original_sample(sample, model_output, a_t, s_t,
                                  self.config.prediction_type)
        denoised = (plan.table("c_out")[i] * x0
                    + plan.table("c_skip")[i] * sample)
        renoised = (plan.table("sqrt_alpha_prev")[i] * denoised
                    + plan.table("sqrt_one_minus_alpha_prev")[i] * noise)
        prev = jnp.where(plan.table("is_last")[i], denoised, renoised)
        return state, prev

    def add_noise(self, plan, original, noise, i=0):
        a_t = plan.table("sqrt_alpha_t")[i]
        s_t = plan.table("sqrt_one_minus_alpha_t")[i]
        return a_t * original + s_t * noise

    def pred_x0(self, plan, state, model_output, i, sample):
        a_t = plan.table("sqrt_alpha_t")[i]
        s_t = plan.table("sqrt_one_minus_alpha_t")[i]
        x0 = pred_original_sample(sample, model_output, a_t, s_t,
                                  self.config.prediction_type)
        return (plan.table("c_out")[i] * x0
                + plan.table("c_skip")[i] * sample)
