import numpy as np
import pytest

from ml_stable_diffusion_tpu.utils import image as img


def test_denormalize_clamps():
    x = np.array([[[[-2.0, 0.0, 2.0]]]], dtype=np.float32)
    u8 = img.denormalize_to_uint8(x)
    assert u8.tolist() == [[[[0, 128, 255]]]]


def test_pil_roundtrip():
    pytest.importorskip("PIL")
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32)
    pils = img.tensor_to_pil(x)
    back = img.pil_to_tensor(pils)
    assert back.shape == (2, 16, 16, 3)
    # uint8 quantization error only
    assert np.abs(back - x).max() < (2.0 / 255.0) + 1e-6


def test_pil_to_tensor_resize_and_range():
    pytest.importorskip("PIL")
    from PIL import Image

    im = Image.new("RGB", (10, 20), color=(255, 0, 0))
    t = img.pil_to_tensor(im, size=(8, 8), value_range=(0.0, 1.0))
    assert t.shape == (1, 8, 8, 3)
    assert t.max() <= 1.0 and t.min() >= 0.0
    np.testing.assert_allclose(t[0, :, :, 0], 1.0)


def test_alpha_masking():
    pytest.importorskip("PIL")
    from PIL import Image

    im = Image.new("RGBA", (4, 4), color=(255, 255, 255, 0))
    t = img.pil_to_tensor(im, value_range=(0.0, 1.0), mask_alpha=True)
    np.testing.assert_allclose(t, 0.0)


def test_layout_transposes():
    x = np.zeros((1, 3, 8, 9), dtype=np.float32)
    assert img.nchw_to_nhwc(x).shape == (1, 8, 9, 3)
    assert img.nhwc_to_nchw(img.nchw_to_nhwc(x)).shape == x.shape
