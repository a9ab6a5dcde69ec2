from .config import PipelineConfiguration
from .sd import StableDiffusionPipeline, PipelineProgress, GenerationResult
from .sdxl import StableDiffusionXLPipeline
from .sd3 import StableDiffusion3Pipeline

__all__ = [
    "PipelineConfiguration",
    "StableDiffusionPipeline",
    "StableDiffusionXLPipeline",
    "StableDiffusion3Pipeline",
    "PipelineProgress",
    "GenerationResult",
]
