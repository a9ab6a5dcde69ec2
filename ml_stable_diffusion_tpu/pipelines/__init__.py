from .config import PipelineConfiguration
from .sd import StableDiffusionPipeline, PipelineProgress

__all__ = ["PipelineConfiguration", "StableDiffusionPipeline", "PipelineProgress"]
