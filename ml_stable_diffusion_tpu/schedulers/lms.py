"""LMS (linear multistep) scheduler, k-diffusion style, order 4.

The Adams–Bashforth coefficients are integrals of Lagrange basis polynomials
over each sigma interval — functions of the sigma schedule only, so the full
(S, 4) coefficient table is integrated host-side at plan time and the in-scan
update is four FMAs over a derivative ring buffer.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy import integrate

from .base import Scheduler, SchedulerPlan
from .euler import EulerScheduler, _euler_pred_x0

ORDER = 4


def _lms_coefficient_table(sigmas: np.ndarray, order: int = ORDER) -> np.ndarray:
    """coeffs[i, j] = integral over [sigma_i, sigma_{i+1}] of the j-th
    Lagrange basis over the last min(i+1, order) sigmas."""
    S = len(sigmas) - 1
    coeffs = np.zeros((S, order))
    for i in range(S):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            def poly(tau):
                prod = 1.0
                for k in range(cur_order):
                    if k == j:
                        continue
                    prod *= (tau - sigmas[i - k]) / (sigmas[i - j] - sigmas[i - k])
                return prod

            coeffs[i, j] = integrate.quad(poly, sigmas[i], sigmas[i + 1], epsrel=1e-4)[0]
    return coeffs


class LMSScheduler(EulerScheduler):
    def set_timesteps(self, num_inference_steps: int, strength: float = 1.0) -> SchedulerPlan:
        ts, sigmas, init_noise_sigma = self._plan_tables(num_inference_steps, strength)
        coeffs = _lms_coefficient_table(sigmas)
        return SchedulerPlan(
            timesteps=jnp.asarray(ts, jnp.float32),
            num_steps=len(ts),
            init_noise_sigma=init_noise_sigma,
            tables={
                "sigmas": jnp.asarray(sigmas, jnp.float32),
                "coeffs": jnp.asarray(coeffs, jnp.float32),
            },
        )

    def initial_state(self, plan, shape, dtype=jnp.float32):
        return {"derivs": jnp.zeros((ORDER, *shape), dtype)}

    def step(self, plan, state, model_output, i, sample, noise=None):
        sigma = plan.table("sigmas")[i]
        x0 = _euler_pred_x0(sample, model_output, sigma, self.config.prediction_type)
        derivative = (sample - x0) / sigma
        derivs = state["derivs"].at[i % ORDER].set(derivative)
        coeffs = plan.table("coeffs")[i]
        prev = sample
        for j in range(ORDER):
            prev = prev + coeffs[j] * derivs[(i - j) % ORDER]
        return {"derivs": derivs}, prev
