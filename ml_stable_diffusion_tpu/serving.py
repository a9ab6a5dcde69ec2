"""Production serving facade.

The reference targets on-device apps (its Swift pipeline IS the serving
layer); the TPU framework targets fleet serving, so this adds the pieces an
app server needs around a pipeline:

- ``precompile``: warm every (size, step-count, scheduler) configuration up
  front, so the first user request never pays XLA compilation (compile
  through this environment's TPU tunnel can take minutes).
- thread-safe request execution: one program executes at a time per chip
  (JAX dispatch itself is async; the lock orders whole generations the way
  the reference's per-model serial DispatchQueue orders predictions,
  ManagedMLModel.swift:23-50).
- ``submit``: DYNAMIC BATCHING — concurrent single-image requests with
  compatible compiled shapes coalesce into one batched program call
  (per-image prompts and seeds ride the pipeline's multi-prompt/multi-seed
  support), multiplying throughput under load without recompilation: the
  UNet step at batch 1 is far from saturating the MXU, so a batch of B
  independent requests costs much less than B serial generations.
- rolling latency statistics (the SampleTimer pattern, SampleTimer.swift).
"""

from __future__ import annotations

import dataclasses
import logging
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor

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
    #: DeepCache acceleration for this bucket (PipelineConfiguration
    #: .deepcache_interval); 1 = exact
    deepcache_interval: int = 1


@dataclasses.dataclass
class _Pending:
    cfg: PipelineConfiguration
    image_hw: tuple[int, int]
    future: Future


class GenerationServer:
    def __init__(self, pipeline, configs: list[ServeConfig] | None = None,
                 max_batch: int = 4, batch_window_s: float = 0.010):
        # max_batch default = the measured v5e saturation point (BENCH r4):
        # a merged batch of 4 runs 4x20 steps in 1.06 s (1.35x over serial)
        # but a batch of 8 takes 2.21 s — WORSE than two batch-4 merges
        # (2.12 s).  The SD-2.1 UNet step at CFG batch 8 is past MXU
        # saturation, so bigger merges only add latency.
        self.pipeline = pipeline
        self.configs = configs or [ServeConfig()]
        self.max_batch = max_batch
        self.batch_window_s = batch_window_s
        self._lock = threading.Lock()
        self.timer = SampleTimer()
        self.requests_served = 0
        self.batches_run = 0
        self._queue: list[_Pending] = []
        self._cv = threading.Condition()
        self._batcher: threading.Thread | None = None
        self._closed = False
        #: executes non-batchable submissions (img2img / controlnet /
        #: multi-image) off the caller's thread; generation order is still
        #: serialized by self._lock inside generate()
        self._direct_pool = ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="sdtpu-direct")

    def precompile(self, batch_sizes: tuple[int, ...] = (1,)):
        """Trace+compile every configured shape with a dummy prompt.
        ``batch_sizes`` beyond (1,) also warms the dynamic-batching shapes
        (each distinct merged batch size is its own compiled program)."""
        for sc in self.configs:
            for b in batch_sizes:
                n = sc.image_count * b
                cfg = PipelineConfiguration(
                    prompt=["warmup"] * n if b > 1 else "warmup",
                    seed=list(range(n)) if b > 1 else 0,
                    step_count=sc.step_count,
                    scheduler=sc.scheduler, image_count=n,
                    guidance_scale=sc.guidance_scale, disable_safety=True,
                    deepcache_interval=sc.deepcache_interval)
                logger.info("precompiling %s batch=%d", sc, b)
                self.pipeline.generate_images(cfg, image_hw=sc.image_hw)
        logger.info("precompiled %d configurations", len(self.configs))

    def generate(self, cfg: PipelineConfiguration,
                 image_hw: tuple[int, int] = (512, 512)) -> GenerationResult:
        with self._lock:
            with self.timer:
                result = self.pipeline.generate_images(cfg, image_hw=image_hw)
            self.requests_served += 1
            return result

    # -- dynamic batching ---------------------------------------------------------

    @staticmethod
    def _batchable(cfg: PipelineConfiguration) -> bool:
        """Mergeable requests: single image, txt2img, no per-request side
        inputs.  Everything else falls back to a direct (unbatched) call."""
        return (cfg.image_count == 1
                and cfg.starting_image is None
                and cfg.ip_adapter_image is None  # per-request image conds
                and not cfg.controlnet_inputs
                and not isinstance(cfg.prompt, (list, tuple)))

    @staticmethod
    def _batch_key(p: _Pending):
        """Everything that selects or parametrizes the compiled program
        (pipelines.sd generate_images cache key) except prompt/seed."""
        c = p.cfg
        return (p.image_hw, c.step_count, c.scheduler, c.timestep_spacing,
                c.timestep_shift, c.guidance_scale, c.rng, c.unet_batch_one,
                c.attention_implementation, c.disable_safety,
                c.original_size, c.target_size, c.crops_coords_top_left,
                c.aesthetic_score, c.negative_aesthetic_score,
                round(c.refiner_start, 4), c.deepcache_interval)

    def submit(self, cfg: PipelineConfiguration,
               image_hw: tuple[int, int] = (512, 512)) -> Future:
        """Enqueue a request; returns a Future[GenerationResult].

        Compatible requests arriving within ``batch_window_s`` run as ONE
        batched program (up to ``max_batch``).  Non-batchable requests
        (img2img / controlnet / multi-image) dispatch through a worker pool
        instead of the caller's thread, so ``submit`` never blocks for a
        full generation."""
        if self._closed:
            raise RuntimeError("server is shut down")
        if not self._batchable(cfg):
            # side inputs / multi-image: direct path, still lock-ordered
            return self._direct_pool.submit(self.generate, cfg,
                                            tuple(image_hw))
        fut: Future = Future()
        p = _Pending(cfg, tuple(image_hw), fut)
        with self._cv:
            if self._closed:
                raise RuntimeError("server is shut down")
            self._queue.append(p)
            if self._batcher is None:
                self._batcher = threading.Thread(target=self._batch_loop,
                                                 daemon=True)
                self._batcher.start()
            self._cv.notify()
        return fut

    def shutdown(self, timeout: float | None = 10.0):
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        if self._batcher is not None:
            self._batcher.join(timeout)
        self._direct_pool.shutdown(wait=True)

    def _take_batch(self) -> list[_Pending]:
        """Wait for work, then collect up to max_batch key-compatible
        requests within the batching window."""
        with self._cv:
            while not self._queue and not self._closed:
                self._cv.wait(0.1)
            if not self._queue:
                return []
            head_key = self._batch_key(self._queue[0])
            deadline = time.monotonic() + self.batch_window_s
            while (len([p for p in self._queue
                        if self._batch_key(p) == head_key]) < self.max_batch):
                remaining = deadline - time.monotonic()
                if remaining <= 0 or self._closed:
                    break
                self._cv.wait(remaining)
            batch, rest = [], []
            for p in self._queue:
                if self._batch_key(p) == head_key and len(batch) < self.max_batch:
                    batch.append(p)
                else:
                    rest.append(p)
            self._queue[:] = rest
            return batch

    def _batch_loop(self):
        while True:
            batch = self._take_batch()
            if not batch:
                if self._closed:
                    return
                continue
            try:
                result = self._run_batch(batch)
            except Exception as e:
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(e)
                continue
            for i, p in enumerate(batch):
                p.future.set_result(GenerationResult(
                    images=[result.images[i]],
                    latents=result.latents[i:i + 1],
                    nsfw_flags=[result.nsfw_flags[i]],
                    seconds_per_step=result.seconds_per_step))

    def _run_batch(self, batch: list[_Pending]) -> GenerationResult:
        first = batch[0]
        if len(batch) == 1:
            return self.generate(first.cfg, first.image_hw)
        merged = dataclasses.replace(
            first.cfg,
            prompt=[p.cfg.prompt for p in batch],
            negative_prompt=[p.cfg.negative_prompt for p in batch],
            seed=[p.cfg.seed for p in batch],
            image_count=len(batch))
        with self._lock:
            with self.timer:
                result = self.pipeline.generate_images(
                    merged, image_hw=first.image_hw)
            self.requests_served += len(batch)
            self.batches_run += 1
        logger.info("batched %d requests into one program call", len(batch))
        return result

    def stats(self) -> dict:
        t = self.timer
        return {
            "requests_served": self.requests_served,
            "batches_run": self.batches_run,
            "e2e_latency_mean_s": round(t.mean, 4) if t.samples else None,
            "e2e_latency_median_s": round(t.median, 4) if t.samples else None,
            "e2e_latency_stdev_s": round(t.stdev, 4) if t.samples else None,
        }
