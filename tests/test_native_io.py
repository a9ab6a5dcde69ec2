"""Native safetensors IO: C++ header parser + zero-copy mmap reader +
pure-Python writer (convert/native_io) — the framework's own artifact
deserializer (the role the closed Core ML runtime's native loader plays for
the reference's .mlmodelc bundles, coreml_model.py:65-84)."""

import json
import struct

import numpy as np
import pytest

from ml_stable_diffusion_tpu.convert import native_io


def _sample_tensors():
    import ml_dtypes

    rng = np.random.RandomState(0)
    return {
        "a/kernel": rng.randn(3, 5).astype(np.float32),
        "a/bias": rng.randn(7).astype(np.float16),
        "b/idx": rng.randint(0, 255, size=(11,)).astype(np.uint8),
        "b/counts": rng.randint(-9, 9, size=(2, 3)).astype(np.int64),
        "c/bf": rng.randn(4, 4).astype(ml_dtypes.bfloat16),
        "c/flag": np.asarray([True, False, True]),
        "d/scalar": np.asarray(2.5, np.float32),
        "d/empty": np.zeros((0, 4), np.float32),
    }


@pytest.fixture(scope="module")
def native_available():
    return native_io.build_native() is not None


def test_roundtrip_native_and_python(tmp_path, native_available):
    tensors = _sample_tensors()
    path = tmp_path / "m.safetensors"
    native_io.save_file(tensors, path, metadata={"fmt": "test"})
    for native in ([True] if native_available else []) + [False]:
        out = native_io.load_file(path, native=native)
        assert set(out) == set(tensors)
        for k in tensors:
            assert out[k].dtype == tensors[k].dtype, k
            np.testing.assert_array_equal(
                np.asarray(out[k]), np.asarray(tensors[k]), err_msg=k)


def test_views_are_zero_copy_readonly(tmp_path):
    path = tmp_path / "m.safetensors"
    native_io.save_file(_sample_tensors(), path)
    out = native_io.load_file(path)
    arr = out["a/kernel"]
    assert not arr.flags.writeable
    # every tensor offset is aligned to its own itemsize (layout invariant)
    for k, v in out.items():
        iface = v.__array_interface__["data"][0]
        assert iface % max(v.dtype.itemsize, 1) == 0, k


def test_compatible_with_ecosystem_reader_and_writer(tmp_path):
    """Byte-compatibility both ways with the HF safetensors package."""
    st = pytest.importorskip("safetensors.numpy")
    tensors = _sample_tensors()
    path = tmp_path / "ours.safetensors"
    native_io.save_file(tensors, path)
    theirs = st.load_file(str(path))
    for k in tensors:
        if tensors[k].dtype == np.dtype("bool"):
            continue  # HF numpy reader maps BOOL differently across versions
        np.testing.assert_array_equal(np.asarray(theirs[k]),
                                      np.asarray(tensors[k]), err_msg=k)

    path2 = tmp_path / "theirs.safetensors"
    st.save_file({k: v for k, v in tensors.items()
                  if v.dtype != np.dtype("bool")}, str(path2))
    ours = native_io.load_file(path2)
    for k, v in ours.items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(tensors[k]),
                                      err_msg=k)


def _write_raw(path, header: dict, data: bytes):
    blob = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(blob)))
        f.write(blob)
        f.write(data)


@pytest.mark.parametrize("native", [True, False])
def test_rejects_out_of_bounds_offsets(tmp_path, native, native_available):
    if native and not native_available:
        pytest.skip("native io unavailable")
    path = tmp_path / "bad.safetensors"
    _write_raw(path, {"x": {"dtype": "F32", "shape": [4],
                            "data_offsets": [0, 16]}}, b"\0" * 8)
    with pytest.raises(ValueError, match="out of bounds"):
        native_io.load_file(path, native=native)


@pytest.mark.parametrize("native", [True, False])
def test_rejects_span_shape_mismatch(tmp_path, native, native_available):
    if native and not native_available:
        pytest.skip("native io unavailable")
    path = tmp_path / "bad.safetensors"
    _write_raw(path, {"x": {"dtype": "F32", "shape": [4],
                            "data_offsets": [0, 12]}}, b"\0" * 12)
    with pytest.raises(ValueError, match="span"):
        native_io.load_file(path, native=native)


def test_rejects_truncated_file(tmp_path, native_available):
    path = tmp_path / "tiny.safetensors"
    path.write_bytes(b"\x01\x02")
    for native in ([True] if native_available else []) + [False]:
        with pytest.raises(ValueError, match="too small|out of bounds"):
            native_io.load_file(path, native=native)


def test_metadata_and_escapes(tmp_path, native_available):
    """__metadata__ is skipped; escaped tensor names parse correctly."""
    if not native_available:
        pytest.skip("native io unavailable")
    path = tmp_path / "m.safetensors"
    header = {"__metadata__": {"note": 'quo"te\\slash'},
              'we/ird "name"é': {"dtype": "U8", "shape": [3],
                                      "data_offsets": [0, 3]}}
    _write_raw(path, header, b"abc")
    out = native_io.load_file(path, native=True)
    assert list(out) == ['we/ird "name"é']
    np.testing.assert_array_equal(out['we/ird "name"é'],
                                  np.frombuffer(b"abc", np.uint8))


def test_artifact_store_uses_native_io(tmp_path):
    """save_module/load_module round-trip through the owned IO layer."""
    from ml_stable_diffusion_tpu.convert.artifacts import (load_module,
                                                           save_module)

    params = {"layer": {"kernel": np.ones((2, 2), np.float32),
                        "bias": np.zeros((2,), np.float32)}}
    save_module(tmp_path, params, name="M")
    tree, manifest = load_module(tmp_path, name="M")
    np.testing.assert_array_equal(tree["layer"]["kernel"],
                                  params["layer"]["kernel"])
    assert manifest["tensors"]["layer/kernel"]["shape"] == [2, 2]
