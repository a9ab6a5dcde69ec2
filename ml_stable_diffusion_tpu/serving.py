"""Production serving facade.

The reference targets on-device apps (its Swift pipeline IS the serving
layer); the TPU framework targets fleet serving, so this adds the pieces an
app server needs around a pipeline:

- ``precompile``: warm every (size, step-count, scheduler) configuration up
  front, so the first user request never pays XLA compilation (compile
  through this environment's TPU tunnel can take minutes).
- thread-safe request execution: one request executes at a time per chip
  (JAX dispatch itself is async; the lock orders whole generations the way
  the reference's per-model serial DispatchQueue orders predictions,
  ManagedMLModel.swift:23-50).
- rolling latency statistics (the SampleTimer pattern, SampleTimer.swift).
"""

from __future__ import annotations

import dataclasses
import logging
import threading

from .pipelines.config import PipelineConfiguration
from .pipelines.sd import GenerationResult
from .utils.timer import SampleTimer

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    """A compiled-shape bucket: requests are served from the nearest one."""

    image_hw: tuple[int, int] = (512, 512)
    step_count: int = 20
    scheduler: str = "DPMSolverMultistep"
    image_count: int = 1
    guidance_scale: float = 7.5


class GenerationServer:
    def __init__(self, pipeline, configs: list[ServeConfig] | None = None):
        self.pipeline = pipeline
        self.configs = configs or [ServeConfig()]
        self._lock = threading.Lock()
        self.timer = SampleTimer()
        self.requests_served = 0

    def precompile(self):
        """Trace+compile every configured shape with a dummy prompt."""
        for sc in self.configs:
            cfg = PipelineConfiguration(
                prompt="warmup", step_count=sc.step_count,
                scheduler=sc.scheduler, image_count=sc.image_count,
                guidance_scale=sc.guidance_scale, disable_safety=True)
            logger.info("precompiling %s", sc)
            self.pipeline.generate_images(cfg, image_hw=sc.image_hw)
        logger.info("precompiled %d configurations", len(self.configs))

    def generate(self, cfg: PipelineConfiguration,
                 image_hw: tuple[int, int] = (512, 512)) -> GenerationResult:
        with self._lock:
            with self.timer:
                result = self.pipeline.generate_images(cfg, image_hw=image_hw)
            self.requests_served += 1
            return result

    def stats(self) -> dict:
        t = self.timer
        return {
            "requests_served": self.requests_served,
            "e2e_latency_mean_s": round(t.mean, 4) if t.samples else None,
            "e2e_latency_median_s": round(t.median, 4) if t.samples else None,
            "e2e_latency_stdev_s": round(t.stdev, 4) if t.samples else None,
        }
