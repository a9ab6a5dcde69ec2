"""Shared scheduler math and the scan-compatible scheduler interface.

The reference steps its schedulers on the host between device calls
(pipeline.py:565-569; Scheduler.swift:218 uses BLAS on CPU).  TPU-first
design instead precomputes every per-step constant into static tables at
plan time (host, float64 numpy for accuracy) and runs the per-step update
inside the jitted scan.  Scheduler *classes* are static configuration;
``SchedulerPlan`` carries the tables; mutable multistep history is a small
pytree threaded through the scan carry.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any

import jax.numpy as jnp
import numpy as np


class BetaSchedule(str, enum.Enum):
    """Reference Scheduler.swift:121-126."""

    LINEAR = "linear"
    SCALED_LINEAR = "scaledLinear"


class PredictionType(str, enum.Enum):
    EPSILON = "epsilon"
    V_PREDICTION = "v_prediction"
    SAMPLE = "sample"


class TimestepSpacing(str, enum.Enum):
    """Reference DPMSolverMultistepScheduler.swift:8-12."""

    LINSPACE = "linspace"
    LEADING = "leading"
    TRAILING = "trailing"
    KARRAS = "karras"


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """Training-time diffusion process constants (defaults = SD 1.x/2.x)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: BetaSchedule = BetaSchedule.SCALED_LINEAR
    prediction_type: PredictionType = PredictionType.EPSILON
    steps_offset: int = 1
    timestep_spacing: TimestepSpacing = TimestepSpacing.LEADING

    def betas(self) -> np.ndarray:
        T = self.num_train_timesteps
        if self.beta_schedule == BetaSchedule.LINEAR:
            return np.linspace(self.beta_start, self.beta_end, T, dtype=np.float64)
        # scaledLinear: linspace in sqrt-space (Scheduler.swift:170-178)
        return np.linspace(self.beta_start ** 0.5, self.beta_end ** 0.5, T,
                           dtype=np.float64) ** 2

    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(1.0 - self.betas())


@dataclasses.dataclass
class SchedulerPlan:
    """Precomputed per-run tables.

    ``timesteps`` is what the denoiser is called with (float32 — SD3 uses
    genuinely fractional timesteps, DiscreteFlowScheduler.swift:82).
    ``tables`` holds per-scheduler coefficient arrays, all indexed by the
    scan step ``i``.  ``num_steps`` is the scan length (may exceed the
    user-facing step count, e.g. PNDM's duplicated step).
    """

    timesteps: jnp.ndarray
    num_steps: int
    init_noise_sigma: float
    tables: dict[str, jnp.ndarray]

    def table(self, name: str) -> jnp.ndarray:
        return self.tables[name]


def spaced_timesteps(num_train_timesteps: int, num_inference_steps: int,
                     spacing: TimestepSpacing, steps_offset: int) -> np.ndarray:
    """Descending integer timesteps per the given spacing rule (diffusers /
    reference DPMSolverMultistepScheduler.swift:98-122 semantics)."""
    T, S = num_train_timesteps, num_inference_steps
    if spacing == TimestepSpacing.LINSPACE:
        ts = np.linspace(0, T - 1, S).round()[::-1]
    elif spacing == TimestepSpacing.LEADING:
        ratio = T // S
        ts = (np.arange(S) * ratio).round()[::-1] + steps_offset
    elif spacing == TimestepSpacing.TRAILING:
        ratio = T / S
        ts = np.arange(T, 0, -ratio).round() - 1
    else:
        raise ValueError(f"unsupported spacing {spacing}")
    return ts.astype(np.float64)


def karras_sigma_ramp(sigma_min: float, sigma_max: float, n: int,
                      rho: float = 7.0) -> np.ndarray:
    """Karras et al. (2022) sigma schedule (reference DPMSolver:98-110)."""
    ramp = np.linspace(0, 1, n)
    min_inv = sigma_min ** (1 / rho)
    max_inv = sigma_max ** (1 / rho)
    return (max_inv + ramp * (min_inv - max_inv)) ** rho


def sigma_to_timestep(sigmas: np.ndarray, all_sigmas: np.ndarray) -> np.ndarray:
    """Invert sigma(t) by piecewise-linear interpolation over the training
    schedule (reference DPMSolver sigmaToTimestep :247-267)."""
    log_sigmas = np.log(all_sigmas)
    log_q = np.log(sigmas)
    ts = np.empty_like(sigmas)
    for k, lq in enumerate(log_q):
        dists = lq - log_sigmas
        low_idx = int(np.clip((dists >= 0).cumsum().argmax(), 0, len(log_sigmas) - 2))
        high_idx = low_idx + 1
        low, high = log_sigmas[low_idx], log_sigmas[high_idx]
        w = np.clip((low - lq) / (low - high), 0.0, 1.0)
        ts[k] = (1 - w) * low_idx + w * high_idx
    return ts


def strength_slice(num_inference_steps: int, strength: float) -> int:
    """Starting step index for img2img (reference Scheduler.swift:109-114:
    tEnc = min(S, int(S*strength)); loop runs the last tEnc steps)."""
    t_enc = min(num_inference_steps, max(1, int(num_inference_steps * strength)))
    return num_inference_steps - t_enc


def pred_original_sample(sample, model_output, alpha_t, sigma_t,
                         prediction_type: PredictionType):
    """Convert a model output into a predicted x0.

    ``alpha_t`` = sqrt(alphas_cumprod[t]); ``sigma_t`` = sqrt(1-alphas_cumprod[t]).
    """
    if prediction_type == PredictionType.EPSILON:
        return (sample - sigma_t * model_output) / alpha_t
    if prediction_type == PredictionType.V_PREDICTION:
        return alpha_t * sample - sigma_t * model_output
    return model_output  # SAMPLE


def to_epsilon(sample, model_output, alpha_t, sigma_t,
               prediction_type: PredictionType):
    """Convert a model output into an epsilon prediction."""
    if prediction_type == PredictionType.EPSILON:
        return model_output
    if prediction_type == PredictionType.V_PREDICTION:
        return sigma_t * sample + alpha_t * model_output
    return (sample - alpha_t * model_output) / sigma_t  # SAMPLE


class Scheduler:
    """Base class.  Subclasses are static (hashable) config objects safe to
    close over in jit; all per-run data lives in the plan/state pytrees."""

    #: True if `step` consumes a fresh noise tensor each call.
    needs_noise: bool = False
    #: True if the denoiser timestep input is fractional (flow matching).
    float_timesteps: bool = False

    def __init__(self, config: SchedulerConfig | None = None, **overrides):
        if config is None:
            config = SchedulerConfig(**overrides)
        elif overrides:
            config = dataclasses.replace(config, **overrides)
        self.config = config

    # -- interface -------------------------------------------------------------

    def set_timesteps(self, num_inference_steps: int, strength: float = 1.0) -> SchedulerPlan:
        raise NotImplementedError

    def initial_state(self, plan: SchedulerPlan, shape, dtype=jnp.float32) -> dict[str, Any]:
        return {}

    def scale_model_input(self, plan: SchedulerPlan, state, sample, i):
        return sample

    def step(self, plan: SchedulerPlan, state, model_output, i, sample, noise=None):
        raise NotImplementedError

    def add_noise(self, plan: SchedulerPlan, original, noise, i=0):
        """Noise a clean latent to the noise level of trajectory step ``i``
        (``i=0``: img2img start, reference Scheduler.swift:83-102; traced
        ``i``: per-step re-noising of the known region for inpainting)."""
        raise NotImplementedError

    def pred_x0(self, plan: SchedulerPlan, state, model_output, i, sample):
        """Predicted clean latent at step ``i`` (denoised previews —
        reference useDenoisedIntermediates, Configuration.swift:44 /
        StableDiffusionPipeline.swift:424).  Default: DDPM scaling at the
        integer training timestep; sigma-space schedulers override."""
        acp = jnp.asarray(self.config.alphas_cumprod(), jnp.float32)
        t = jnp.clip(plan.timesteps[i].astype(jnp.int32), 0, acp.shape[0] - 1)
        alpha_t = jnp.sqrt(acp[t])
        sigma_t = jnp.sqrt(1.0 - acp[t])
        return pred_original_sample(sample, model_output, alpha_t, sigma_t,
                                    self.config.prediction_type)

    # -- helpers ---------------------------------------------------------------

    def _alpha_sigma(self) -> tuple[np.ndarray, np.ndarray]:
        acp = self.config.alphas_cumprod()
        return np.sqrt(acp), np.sqrt(1.0 - acp)

    def __hash__(self):
        return hash((type(self), self.config))

    def __eq__(self, other):
        return type(self) is type(other) and self.config == other.config
