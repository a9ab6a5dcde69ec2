"""Native artifact IO: own safetensors reader/writer.

The reference's artifacts (.mlmodelc) are deserialized by the closed-source
Core ML runtime's native loader.  This framework's artifact format is
safetensors (convert/artifacts.py); here it OWNS that format end-to-end
instead of depending on an external parser (SURVEY.md §2.5: load-bearing
deps must be owned or replaced):

- ``load_file``: the native C++ header parser (native/io) validates the
  tensor table (every byte span bounds-checked against the file), then each
  tensor is a ZERO-COPY numpy view over one shared ``mmap`` — model loads
  page lazily and never memcpy on the host.  Falls back to the pure-Python
  parser below if the native build is unavailable.
- ``save_file``: pure-Python spec-compliant writer (8-byte LE header length
  + JSON table + contiguous data), byte-compatible with the ecosystem's
  readers.
"""

from __future__ import annotations

import ctypes
import json
import logging
import mmap
import struct
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = Path(__file__).resolve().parents[2]
_LIB_PATH = _REPO_ROOT / "native" / "build" / "libsdtpu_io.so"

_ALIGN = 8  # spec requires no alignment; 8 keeps views cheap for all dtypes


def _np_dtypes():
    import ml_dtypes  # ships with jax

    return {
        "F64": np.dtype(np.float64), "F32": np.dtype(np.float32),
        "F16": np.dtype(np.float16), "BF16": np.dtype(ml_dtypes.bfloat16),
        "I64": np.dtype(np.int64), "I32": np.dtype(np.int32),
        "I16": np.dtype(np.int16), "I8": np.dtype(np.int8),
        "U64": np.dtype(np.uint64), "U32": np.dtype(np.uint32),
        "U16": np.dtype(np.uint16), "U8": np.dtype(np.uint8),
        "BOOL": np.dtype(np.bool_),
        "F8_E4M3": np.dtype(ml_dtypes.float8_e4m3fn),
        "F8_E5M2": np.dtype(ml_dtypes.float8_e5m2),
    }


def _st_dtype(dt: np.dtype) -> str:
    for name, npdt in _np_dtypes().items():
        if dt == npdt:
            return name
    raise ValueError(f"unsupported dtype {dt}")


def build_native(force: bool = False) -> Path | None:
    if _LIB_PATH.exists() and not force:
        return _LIB_PATH
    try:
        subprocess.run(["make", "-C", str(_REPO_ROOT / "native")],
                       check=True, capture_output=True)
        return _LIB_PATH if _LIB_PATH.exists() else None
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native io build failed: %s", e)
        return None


_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and build_native() is None:
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.sdtpu_st_parse.restype = ctypes.c_void_p
    lib.sdtpu_st_parse.argtypes = [ctypes.c_char_p]
    lib.sdtpu_st_errmsg.restype = ctypes.c_char_p
    lib.sdtpu_st_errmsg.argtypes = [ctypes.c_void_p]
    for name, res in (("count", ctypes.c_int64),
                      ("data_offset", ctypes.c_int64),
                      ("ndim", ctypes.c_int32),
                      ("begin", ctypes.c_int64), ("end", ctypes.c_int64)):
        fn = getattr(lib, f"sdtpu_st_{name}")
        fn.restype = res
        fn.argtypes = ([ctypes.c_void_p] if name in ("count", "data_offset")
                       else [ctypes.c_void_p, ctypes.c_int64])
    for name in ("name", "dtype"):
        fn = getattr(lib, f"sdtpu_st_{name}")
        fn.restype = ctypes.c_char_p
        fn.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.sdtpu_st_shape.restype = None
    lib.sdtpu_st_shape.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.POINTER(ctypes.c_int64)]
    lib.sdtpu_st_free.restype = None
    lib.sdtpu_st_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _parse_table_native(path: Path):
    """-> (data_offset, [(name, dtype_str, shape, begin, end)]) or None."""
    lib = _load_lib()
    if lib is None:
        return None
    h = lib.sdtpu_st_parse(str(path).encode())
    try:
        err = lib.sdtpu_st_errmsg(h)
        if err:
            raise ValueError(f"{path}: {err.decode()}")
        table = []
        for i in range(lib.sdtpu_st_count(h)):
            nd = lib.sdtpu_st_ndim(h, i)
            shape = (ctypes.c_int64 * max(nd, 1))()
            lib.sdtpu_st_shape(h, i, shape)
            table.append((lib.sdtpu_st_name(h, i).decode(),
                          lib.sdtpu_st_dtype(h, i).decode(),
                          tuple(shape[:nd]),
                          lib.sdtpu_st_begin(h, i), lib.sdtpu_st_end(h, i)))
        return lib.sdtpu_st_data_offset(h), table
    finally:
        lib.sdtpu_st_free(h)


def _parse_table_python(path: Path):
    """Pure-Python fallback parser (same validation as the native one)."""
    size = path.stat().st_size
    with open(path, "rb") as f:
        if size < 8:
            raise ValueError(f"{path}: file too small for safetensors header")
        (header_len,) = struct.unpack("<Q", f.read(8))
        if header_len > size - 8:
            raise ValueError(f"{path}: header length out of bounds")
        header = json.loads(f.read(header_len))
    data_offset = 8 + header_len
    dtypes = _np_dtypes()
    table = []
    for name, info in header.items():
        if name == "__metadata__":
            continue
        dt, shape = info["dtype"], tuple(info["shape"])
        begin, end = info["data_offsets"]
        if dt not in dtypes:
            raise ValueError(f"{path}: unknown dtype {dt} for {name}")
        nbytes = int(np.prod(shape, dtype=np.int64)) * dtypes[dt].itemsize
        if not (0 <= begin <= end <= size - data_offset):
            raise ValueError(f"{path}: data_offsets out of bounds for {name}")
        if end - begin != nbytes:
            raise ValueError(f"{path}: byte span mismatch for {name}")
        table.append((name, dt, shape, begin, end))
    return data_offset, table


def load_file(path: str | Path, native: bool | None = None
              ) -> dict[str, np.ndarray]:
    """Read a safetensors file -> {name: array}.

    Arrays are READ-ONLY zero-copy views over one shared mmap (numpy keeps
    the mapping alive via ``.base``); copy before in-place mutation.  jax
    ``device_put`` reads straight from the mapping.
    """
    path = Path(path)
    parsed = _parse_table_native(path) if native in (None, True) else None
    if parsed is None:
        if native is True:
            raise RuntimeError("native io library unavailable")
        parsed = _parse_table_python(path)
    data_offset, table = parsed
    dtypes = _np_dtypes()
    out = {}
    with open(path, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    for name, dt, shape, begin, end in table:
        npdt = dtypes[dt]
        arr = np.frombuffer(mm, dtype=npdt,
                            count=(end - begin) // npdt.itemsize,
                            offset=data_offset + begin)
        out[name] = arr.reshape(shape)
    return out


def save_file(tensors: dict[str, np.ndarray], path: str | Path,
              metadata: dict[str, str] | None = None) -> None:
    """Write a spec-compliant safetensors file.

    The spec forbids holes in the data buffer, so alignment comes from
    layout instead of padding: tensors are laid out in descending-itemsize
    order, which keeps every tensor's offset a multiple of its own itemsize
    (the data section itself starts 8-aligned via header padding) — zero-copy
    views on load are always aligned."""
    path = Path(path)
    header: dict = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    arrays = {n: np.ascontiguousarray(t) for n, t in tensors.items()}
    order = sorted(arrays, key=lambda n: (-arrays[n].dtype.itemsize, n))
    offset = 0
    for name in order:
        a = arrays[name]
        header[name] = {"dtype": _st_dtype(a.dtype),
                        "shape": list(a.shape),
                        "data_offsets": [offset, offset + a.nbytes]}
        offset += a.nbytes
    blob = json.dumps(header, separators=(",", ":")).encode()
    blob += b" " * ((-(8 + len(blob))) % _ALIGN)  # 8-align the data section
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(blob)))
        f.write(blob)
        for name in order:
            f.write(arrays[name].tobytes())
