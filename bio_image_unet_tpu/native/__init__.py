"""ctypes bindings for libbiotiff (native/biotiff.cpp) — the multithreaded
C++ TIFF decoder that accelerates the framework's file-per-tile host data
path (SURVEY.md §7.4 "Host I/O pipeline throughput").

The library is compiled on first use with the system g++ (cached next to the
source); everything degrades gracefully to the pure-Python codec in
``bio_image_unet_tpu.data.tiff`` when a compiler or zlib is unavailable, or
for container features the native decoder doesn't parse (big-endian, tiled,
LZW, predictors).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_DTYPES = {
    1: np.uint8, 2: np.uint16, 3: np.uint32,
    4: np.int8, 5: np.int16, 6: np.int32,
    7: np.float16, 8: np.float32, 9: np.float64,
}

_lib = None
_lib_lock = threading.Lock()
_lib_failed = False

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")


def _build() -> Optional[str]:
    src = os.path.join(_SRC_DIR, "biotiff.cpp")
    so = os.path.join(_SRC_DIR, "libbiotiff.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    if not os.path.exists(src):
        return None
    try:
        # compile to a unique temp name and rename atomically: a killed /
        # timed-out / concurrent build must never leave a fresh-mtime
        # corrupt .so that every later process "caches" and fails to load
        tmp = f"{so}.{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", src, "-o", tmp,
             "-lz", "-pthread"],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, so)
        return so
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def get_lib():
    """Load (building if needed) libbiotiff; None when unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _lib_failed:
            return _lib
        so = _build()
        if so is None:
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _lib_failed = True
            return None
        lib.biotiff_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.biotiff_probe.restype = ctypes.c_int
        lib.biotiff_read.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ]
        lib.biotiff_read.restype = ctypes.c_int
        lib.biotiff_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ]
        lib.biotiff_read_batch.restype = ctypes.c_int
        try:
            lib.biotiff_write.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.biotiff_write.restype = ctypes.c_int
        except AttributeError:  # stale .so without the encoder
            pass
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _plausible(path, n, h, w, c, itemsize) -> bool:
    """Bound the probe-reported dimensions BEFORE allocating the output
    array: a corrupt header must not drive np.empty to a ~256 GB request
    (ASan-fuzz finding).  The decoded payload of a real TIFF cannot exceed
    ~1200× the file size (deflate's hard ~1032:1 inflation limit, the only
    supported compression) — anything above is corrupt-header fiction.
    Returning False falls back to the Python codec, which raises its clean
    TiffFormatError."""
    if min(n, h, w, c) <= 0:
        return False
    try:
        fsize = os.path.getsize(path)
    except OSError:
        return False
    return n * h * w * c * itemsize <= 1200 * fsize + (1 << 20)


def imread(path) -> Optional[np.ndarray]:
    """Native read of a (multipage) TIFF → (N,H,W[,C]) / (H,W[,C]) array,
    or None when the native path can't handle the file."""
    lib = get_lib()
    if lib is None:
        return None
    shape = (ctypes.c_int64 * 4)()
    dtype = ctypes.c_int()
    rc = lib.biotiff_probe(str(path).encode(), shape, ctypes.byref(dtype))
    if rc != 0 or dtype.value not in _DTYPES:
        return None
    np_dtype = np.dtype(_DTYPES[dtype.value])
    n, h, w, c = (int(shape[i]) for i in range(4))
    if not _plausible(path, n, h, w, c, np_dtype.itemsize):
        return None
    out = np.empty(n * h * w * c, dtype=np_dtype)
    rc = lib.biotiff_read(str(path).encode(),
                          out.ctypes.data_as(ctypes.c_void_p),
                          out.nbytes, shape, ctypes.byref(dtype))
    if rc != 0:
        return None
    arr = out.reshape(n, h, w, c)
    if c == 1:
        arr = arr[..., 0]
    if n == 1:
        arr = arr[0]
    return arr


def imread_batch(paths: List[str], n_threads: int = 0) -> Optional[np.ndarray]:
    """Decode equal-shaped TIFFs in parallel → one stacked array
    (N_files, ...), or None when unavailable/heterogeneous."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    shape = (ctypes.c_int64 * 4)()
    dtype = ctypes.c_int()
    rc = lib.biotiff_probe(str(paths[0]).encode(), shape, ctypes.byref(dtype))
    if rc != 0 or dtype.value not in _DTYPES:
        return None
    np_dtype = np.dtype(_DTYPES[dtype.value])
    n, h, w, c = (int(shape[i]) for i in range(4))
    if not _plausible(paths[0], n, h, w, c, np_dtype.itemsize):
        return None
    item_bytes = n * h * w * c * np_dtype.itemsize
    out = np.empty(len(paths) * n * h * w * c, dtype=np_dtype)
    c_paths = (ctypes.c_char_p * len(paths))(*[str(p).encode() for p in paths])
    rc = lib.biotiff_read_batch(c_paths, len(paths),
                                out.ctypes.data_as(ctypes.c_void_p),
                                item_bytes,
                                n_threads or min(os.cpu_count() or 4, 16),
                                shape, dtype.value)  # every file must match
                                # file 0's probe — a smaller page would fill
                                # only part of its slot (silent corruption)
    if rc != 0:
        return None
    arr = out.reshape((len(paths), n, h, w, c))
    if c == 1:
        arr = arr[..., 0]
    if n == 1:
        arr = arr[:, 0]
    return arr


_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


def imwrite(path, data: np.ndarray, compress: Optional[int] = None,
            rows_per_strip: int = 64, n_threads: int = 0,
            bigtiff: bool = False) -> bool:
    """Native multithreaded TIFF write of a (N,H,W[,C]) / (H,W[,C]) array.

    Pages are split into ``rows_per_strip`` bands and deflate-compressed in
    parallel (the win over the pure-Python writer: zlib is single-threaded
    there).  Returns False when the native library is unavailable or the
    dtype is unsupported — callers fall back to the Python writer."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "biotiff_write"):
        return False
    data = np.ascontiguousarray(data)
    if data.dtype == np.dtype(bool):
        data = data.astype(np.uint8) * 255
    code = _DTYPE_CODES.get(data.dtype)
    if code is None:
        return False
    if data.ndim == 2:
        n, h, w, c = 1, data.shape[0], data.shape[1], 1
    elif data.ndim == 3 and data.shape[-1] <= 8:
        n, (h, w, c) = 1, data.shape
    elif data.ndim == 3:
        (n, h, w), c = data.shape, 1
    elif data.ndim == 4 and data.shape[-1] <= 8:
        n, h, w, c = data.shape
    elif data.ndim == 4:
        # channels-first page stacks (e.g. multi-output (N, C, H, W)
        # results): flatten to N·C grayscale pages — the exact layout the
        # Python TiffWriter produces for the same array, so the file format
        # never depends on which encoder was picked
        data = data.reshape(-1, data.shape[2], data.shape[3])
        (n, h, w), c = data.shape, 1
    else:
        return False
    level = 0 if not compress else (6 if compress is True else int(compress))
    # containers often under-report cpu_count while the cgroup quota allows
    # more; oversubscription is harmless (measured faster even at nproc=1)
    rc = lib.biotiff_write(str(path).encode(),
                           data.ctypes.data_as(ctypes.c_void_p), code,
                           n, h, w, c, level, rows_per_strip,
                           n_threads or min(max(os.cpu_count() or 4, 8), 16),
                           1 if bigtiff else 0)
    return rc == 0
