"""DPM-Solver++(2M) multistep scheduler.

Second-order midpoint variant with data prediction, linspace/leading/karras
timestep spacing, and lower-order fallback for the first and (when the step
count is small) final steps — the capability set of the reference's Swift
implementation (DPMSolverMultistepScheduler.swift:98-267, lower-order logic
:220-222) re-derived from the DPM-Solver++ paper as pure scan-compatible math.

Multistep history is one slot of the previous predicted x0 in the scan carry;
everything else (alpha/sigma/lambda and the per-step order switch) is a
precomputed static table.
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

#: Below this step count the final step drops to first order for stability
#: (reference DPMSolverMultistepScheduler.swift:220-222).
LOWER_ORDER_FINAL_MAX_STEPS = 15


class DPMSolverMultistepScheduler(Scheduler):
    def set_timesteps(self, num_inference_steps: int, strength: float = 1.0) -> SchedulerPlan:
        cfg = self.config
        acp = cfg.alphas_cumprod()
        all_ratio_sigmas = np.sqrt((1 - acp) / acp)

        if cfg.timestep_spacing == TimestepSpacing.KARRAS:
            sig = karras_sigma_ramp(float(all_ratio_sigmas.min()),
                                    float(all_ratio_sigmas.max()),
                                    num_inference_steps)
            ts = sigma_to_timestep(sig, all_ratio_sigmas)
            ratio_sigmas = sig
        else:
            ts = spaced_timesteps(cfg.num_train_timesteps, num_inference_steps,
                                  cfg.timestep_spacing, cfg.steps_offset)
            ratio_sigmas = np.interp(ts, np.arange(len(all_ratio_sigmas)), all_ratio_sigmas)

        # S+1 trajectory points: the S sampling sigmas plus the terminal point
        # at training timestep 0.
        ratio_sigmas = np.concatenate([ratio_sigmas, [all_ratio_sigmas[0]]])
        alpha_t = 1.0 / np.sqrt(1.0 + ratio_sigmas**2)
        sigma_t = ratio_sigmas * alpha_t
        lam = np.log(alpha_t / sigma_t)

        start = strength_slice(num_inference_steps, strength)
        ts = ts[start:]
        alpha_t, sigma_t, lam = alpha_t[start:], sigma_t[start:], lam[start:]
        S = len(ts)

        first_order = np.zeros(S, dtype=bool)
        first_order[0] = True
        if S < LOWER_ORDER_FINAL_MAX_STEPS:
            first_order[-1] = True

        tables = {
            "alpha": jnp.asarray(alpha_t, jnp.float32),
            "sigma": jnp.asarray(sigma_t, jnp.float32),
            "lambda": jnp.asarray(lam, jnp.float32),
            "first_order": jnp.asarray(first_order),
        }
        return SchedulerPlan(
            timesteps=jnp.asarray(ts, jnp.float32),
            num_steps=S,
            init_noise_sigma=1.0,
            tables=tables,
        )

    def initial_state(self, plan, shape, dtype=jnp.float32):
        return {"prev_x0": jnp.zeros(shape, dtype)}

    def pred_x0(self, plan, state, model_output, i, sample):
        return self._pred_x0(sample, model_output, plan.table("alpha")[i],
                             plan.table("sigma")[i])

    def _pred_x0(self, sample, model_output, alpha, sigma):
        pt = self.config.prediction_type
        if pt == PredictionType.EPSILON:
            return (sample - sigma * model_output) / alpha
        if pt == PredictionType.V_PREDICTION:
            return alpha * sample - sigma * model_output
        return model_output

    def step(self, plan, state, model_output, i, sample, noise=None):
        alpha = plan.table("alpha")
        sigma = plan.table("sigma")
        lam = plan.table("lambda")
        a_s, a_t = alpha[i], alpha[i + 1]
        s_s, s_t = sigma[i], sigma[i + 1]
        l_s, l_t = lam[i], lam[i + 1]

        x0 = self._pred_x0(sample, model_output, a_s, s_s)

        h = l_t - l_s
        ratio = s_t / s_s
        phi = jnp.expm1(-h)

        first = ratio * sample - a_t * phi * x0

        # 2M midpoint: D1 = (x0 - prev_x0)/r0, r0 = h_prev/h
        l_prev = lam[jnp.maximum(i - 1, 0)]
        h_prev = l_s - l_prev
        r0 = h_prev / h
        d1 = (x0 - state["prev_x0"]) / r0
        second = first - 0.5 * a_t * phi * d1

        use_first = plan.table("first_order")[i]
        prev = jnp.where(use_first, first, second)
        return {"prev_x0": x0}, prev

    def add_noise(self, plan, original, noise, i=0):
        a = plan.table("alpha")[i]
        s = plan.table("sigma")[i]
        return a * original + s * noise
