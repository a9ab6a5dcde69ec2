"""Scan-compatible diffusion schedulers.

Every scheduler is a pure-function pair designed to live inside a single
jitted `lax.scan` denoise loop (no host math per step, unlike the reference
which steps schedulers on-host every iteration — pipeline.py:565-569,
Scheduler.swift:218):

- ``init(...) -> SchedulerPlan``: host-side (numpy) precomputation of all
  per-step constants (timesteps, sigmas, multistep coefficients) as static
  tables indexed by the scan step.
- ``scale_model_input(plan, state, x, i)``: input pre-scaling.
- ``step(plan, state, model_output, i, sample) -> (state, prev_sample)``:
  one denoise update.  Multistep history (PNDM's ets, DPM++'s model-output
  buffer) lives in fixed-size ring buffers inside ``state`` so the whole
  trajectory compiles to one XLA while-loop.

Scheduler map mirrors the reference surface (pipeline.py:592-604 +
Scheduler.swift / DPMSolverMultistepScheduler.swift / DiscreteFlowScheduler.swift).
"""

from .base import SchedulerConfig, SchedulerPlan, BetaSchedule, PredictionType
from .ddim import DDIMScheduler
from .euler import EulerScheduler
from .euler_ancestral import EulerAncestralScheduler
from .dpm_solver import DPMSolverMultistepScheduler
from .pndm import PNDMScheduler
from .lms import LMSScheduler
from .flow import DiscreteFlowScheduler
from .lcm import LCMScheduler

SCHEDULER_MAP = {
    "DDIM": DDIMScheduler,
    "Euler": EulerScheduler,
    "EulerAncestral": EulerAncestralScheduler,
    "DPMSolverMultistep": DPMSolverMultistepScheduler,
    "PNDM": PNDMScheduler,
    "LMS": LMSScheduler,
    "DiscreteFlow": DiscreteFlowScheduler,
    "LCM": LCMScheduler,
}


def get_available_schedulers():
    return dict(SCHEDULER_MAP)


__all__ = [
    "SchedulerConfig",
    "SchedulerPlan",
    "BetaSchedule",
    "PredictionType",
    "DDIMScheduler",
    "EulerScheduler",
    "EulerAncestralScheduler",
    "DPMSolverMultistepScheduler",
    "PNDMScheduler",
    "LMSScheduler",
    "DiscreteFlowScheduler",
    "LCMScheduler",
    "SCHEDULER_MAP",
    "get_available_schedulers",
]
