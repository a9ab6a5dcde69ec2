"""RNG parity tests (pattern: reference StableDiffusionTests.swift:51-62,
which pins golden values of the numpy MT19937 stream)."""

import numpy as np
import pytest

from ml_stable_diffusion_tpu.utils.rng import (
    JaxRandomSource,
    NumpyRandomSource,
    PhiloxRandomSource,
    TorchRandomSource,
    make_random_source,
)


def test_numpy_source_matches_randomstate():
    src = NumpyRandomSource(93)
    ref = np.random.RandomState(93).standard_normal((2, 4, 8, 8)).astype(np.float32)
    np.testing.assert_array_equal(src.normal((2, 4, 8, 8)), ref)


def test_numpy_source_golden_values():
    # Mirrors the reference Swift test: seed 12345, 10_000 samples, check tail.
    src = NumpyRandomSource(12345)
    vals = src.normal((10_000,))
    ref_tail = np.random.RandomState(12345).standard_normal(10_000)[-5:]
    np.testing.assert_allclose(vals[-5:], ref_tail.astype(np.float32))


def test_torch_source_matches_torch():
    torch = pytest.importorskip("torch")
    src = TorchRandomSource(93)
    gen = torch.Generator().manual_seed(93)
    ref = torch.randn((1, 4, 8, 8), generator=gen).numpy()
    np.testing.assert_array_equal(src.normal((1, 4, 8, 8)), ref)


def test_philox_deterministic_and_distributed():
    a = PhiloxRandomSource(93).normal((4, 64, 64))
    b = PhiloxRandomSource(93).normal((4, 64, 64))
    np.testing.assert_array_equal(a, b)
    c = PhiloxRandomSource(94).normal((4, 64, 64))
    assert np.abs(a - c).max() > 0
    # distribution sanity
    assert abs(a.mean()) < 0.05
    assert abs(a.std() - 1.0) < 0.05


def test_philox_per_call_offset_advances():
    src = PhiloxRandomSource(7)
    a = src.normal((128,))
    b = src.normal((128,))
    assert np.abs(a - b).max() > 0


def test_jax_source():
    a = JaxRandomSource(0).normal((2, 3))
    b = JaxRandomSource(0).normal((2, 3))
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.float32


def test_factory():
    assert isinstance(make_random_source("numpy", 1), NumpyRandomSource)
    assert isinstance(make_random_source("nvidia", 1), PhiloxRandomSource)
    with pytest.raises(ValueError):
        make_random_source("bogus", 1)
