from .dtypes import Policy, DEFAULT_POLICY, VAE_POLICY
from .rng import (
    RandomSource,
    JaxRandomSource,
    NumpyRandomSource,
    TorchRandomSource,
    PhiloxRandomSource,
    make_random_source,
)
from .timer import SampleTimer

__all__ = [
    "Policy",
    "DEFAULT_POLICY",
    "VAE_POLICY",
    "RandomSource",
    "JaxRandomSource",
    "NumpyRandomSource",
    "TorchRandomSource",
    "PhiloxRandomSource",
    "make_random_source",
    "SampleTimer",
]
