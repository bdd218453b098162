"""Torch-free reader for zip-serialized PyTorch checkpoints (SURVEY.md §7.4).

The reference's whole deployment story is a ``torch.save``'d dict
(`/root/reference/bio_image_unet/unet/train.py:174-188`) that its Predict
loads back (`unet/predict.py:83`).  Migrating such a checkpoint must not
require torch, so this module parses the format directly:

``torch.save`` (torch ≥ 1.6, the zipfile serialization) writes::

    <archive>/data.pkl      pickle of the object graph; tensors appear as
                            persistent-ID references into ...
    <archive>/data/<key>    ... raw little-endian storage buffers
    <archive>/version

The pickle's persistent IDs are ``('storage', StorageType, key, location,
numel)``.  A **restricted** unpickler maps the storage classes to numpy
dtypes, rebuilds tensors as strided numpy views over the raw buffers, and
refuses every global outside a small allowlist — loading a checkpoint can
never execute arbitrary code (unlike ``torch.load(weights_only=False)``).
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict

import numpy as np


def _bfloat16_dtype():
    import ml_dtypes  # ships with jax

    return np.dtype(ml_dtypes.bfloat16)


_STORAGE_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
    "ComplexFloatStorage": np.dtype(np.complex64),
    "ComplexDoubleStorage": np.dtype(np.complex128),
}


class _StorageSentinel:
    """Stands in for a ``torch.<X>Storage`` class inside the pickle."""

    __slots__ = ("dtype",)

    def __init__(self, dtype):
        self.dtype = dtype


class _Storage:
    """A lazily-read raw buffer from the checkpoint archive."""

    __slots__ = ("reader", "dtype", "key", "numel")

    def __init__(self, reader, dtype, key, numel):
        self.reader, self.dtype, self.key, self.numel = reader, dtype, key, numel

    def as_array(self) -> np.ndarray:
        raw = self.reader.read_record(f"data/{self.key}")
        return np.frombuffer(raw, dtype=self.dtype, count=self.numel)


def _rebuild_tensor_v2(storage: _Storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None) -> np.ndarray:
    """``torch._utils._rebuild_tensor_v2`` equivalent → contiguous ndarray.

    ``size``/``stride``/``storage_offset`` come from the (untrusted) pickle,
    and ``np.lib.stride_tricks.as_strided`` does **no** bounds checking — so
    every element the strided view could touch is validated against the
    storage extent first; a crafted checkpoint must not read out-of-bounds
    process memory."""
    flat = storage.as_array()
    storage_offset = int(storage_offset)
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    if storage_offset < 0 or len(stride) != len(size) or any(s < 0 for s in size):
        raise ValueError(
            f"corrupt tensor metadata: offset={storage_offset} size={size} "
            f"stride={stride}")
    if not size:  # 0-d tensor
        if storage_offset >= flat.size:
            raise ValueError("corrupt tensor metadata: storage_offset beyond "
                             f"storage ({storage_offset} >= {flat.size})")
        return flat[storage_offset].copy()
    if 0 in size:  # empty tensor: no storage is touched
        return np.empty(size, dtype=flat.dtype)
    # extreme flat indices the view can reach (torch checkpoints only ever
    # hold non-negative strides, but bound both directions anyway)
    lo = hi = storage_offset
    for n, st in zip(size, stride):
        span = (n - 1) * st
        if span >= 0:
            hi += span
        else:
            lo += span
    if lo < 0 or hi >= flat.size:
        raise ValueError(
            "corrupt or malicious tensor metadata: strided view spans flat "
            f"indices [{lo}, {hi}] outside storage of {flat.size} elements")
    itemsize = flat.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=size,
        strides=tuple(s * itemsize for s in stride),
    )
    return np.ascontiguousarray(view)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


# (module, name) → replacement object.  Everything else is refused.
def _allowed_globals():
    import collections

    try:  # numpy ≥ 2 moved the private module
        from numpy._core import multiarray as np_ma
    except ImportError:  # pragma: no cover
        from numpy.core import multiarray as np_ma

    table = {
        ("collections", "OrderedDict"): collections.OrderedDict,
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
        ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
        # numpy objects occasionally end up in reference hyperparam dicts;
        # pickles reference either namespace depending on the writer's numpy
        ("numpy", "ndarray"): np.ndarray,
        ("numpy", "dtype"): np.dtype,
        ("numpy.core.multiarray", "_reconstruct"): np_ma._reconstruct,
        ("numpy.core.multiarray", "scalar"): np_ma.scalar,
        ("numpy._core.multiarray", "_reconstruct"): np_ma._reconstruct,
        ("numpy._core.multiarray", "scalar"): np_ma.scalar,
    }
    for name, dtype in _STORAGE_DTYPES.items():
        table[("torch", name)] = _StorageSentinel(dtype)
    table[("torch", "BFloat16Storage")] = _StorageSentinel(None)  # resolved lazily
    return table


class _ZipReader:
    def __init__(self, zf: zipfile.ZipFile):
        self.zf = zf
        # the top-level archive directory name varies (usually the file stem
        # or "archive"); locate it from the data.pkl entry
        pkl = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl:
            raise ValueError("no data.pkl in archive — not a torch zip checkpoint")
        self.prefix = pkl[0][: -len("data.pkl")]

    def read_record(self, name: str) -> bytes:
        return self.zf.read(self.prefix + name)


class _LazyTensor:
    """Shape/dtype-only stand-in produced by metadata reads — the weight
    bytes are never pulled from the archive."""

    __slots__ = ("shape", "dtype")

    def __init__(self, shape, dtype):
        self.shape, self.dtype = tuple(int(s) for s in shape), dtype


def _rebuild_tensor_lazy(storage: _Storage, storage_offset, size, stride,
                         requires_grad=False, backward_hooks=None,
                         metadata=None) -> _LazyTensor:
    return _LazyTensor(size, storage.dtype)


class DisallowedGlobalError(pickle.UnpicklingError):
    """A pickle global outside the torch-checkpoint allowlist — a deliberate
    SECURITY refusal, not a parse failure.  Callers must never respond to
    this by retrying with an unrestricted unpickler (torch.load
    weights_only=False executes pickled code)."""


class _RestrictedUnpickler(pickle.Unpickler):
    def __init__(self, data: bytes, reader: _ZipReader, lazy: bool = False):
        super().__init__(io.BytesIO(data))
        self._reader = reader
        self._globals = _allowed_globals()
        if lazy:  # metadata-only read: skip every tensor-record decode
            self._globals[("torch._utils", "_rebuild_tensor_v2")] = (
                _rebuild_tensor_lazy)

    def find_class(self, module, name):
        try:
            return self._globals[(module, name)]
        except KeyError:
            raise DisallowedGlobalError(
                f"global '{module}.{name}' is not allowed in torch checkpoints "
                "(torch-free restricted reader)"
            ) from None

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id: {pid!r}")
        _, storage_cls, key, _location, numel = pid
        dtype = storage_cls.dtype if isinstance(storage_cls, _StorageSentinel) else None
        if dtype is None:
            dtype = _bfloat16_dtype()
        return _Storage(self._reader, dtype, key, int(numel))


def read_pt(path) -> Dict[str, Any]:
    """Load a ``torch.save``'d object without torch.  Tensors come back as
    numpy arrays; everything else (dicts, scalars, strings) as plain Python.
    Raises ``ValueError`` for the pre-1.6 legacy (non-zip) format and for
    corrupt archives; :class:`DisallowedGlobalError` for pickles outside
    the allowlist (a security refusal — see the class docstring)."""
    if not zipfile.is_zipfile(path):
        raise ValueError(
            f"{path} is not a zip-serialized torch checkpoint (pre-torch-1.6 "
            "legacy format — re-save it with a modern torch, or install torch)"
        )
    try:
        with zipfile.ZipFile(path) as zf:
            reader = _ZipReader(zf)
            return _RestrictedUnpickler(reader.read_record("data.pkl"),
                                        reader).load()
    except (ValueError, pickle.UnpicklingError):
        raise
    except Exception as err:
        # zipfile/pickle internals (BadZipFile, CRC RuntimeError, …) must
        # not leak as their own types — a corrupt container is ONE error
        # class for callers (fuzz-tested)
        raise ValueError(f"corrupt torch checkpoint {path!r}: {err}") from err


def read_pt_meta(path) -> Dict[str, Any]:
    """Like :func:`read_pt` but metadata-only: tensors come back as
    :class:`_LazyTensor` shape/dtype stubs and no weight bytes are read —
    cheap hyperparameter inspection of arbitrarily large checkpoints
    (used by ``checkpoint.peek`` and the CLI's family autodetection)."""
    if not zipfile.is_zipfile(path):
        raise ValueError(
            f"{path} is not a zip-serialized torch checkpoint (pre-torch-1.6 "
            "legacy format — re-save it with a modern torch, or install torch)"
        )
    try:
        with zipfile.ZipFile(path) as zf:
            reader = _ZipReader(zf)
            return _RestrictedUnpickler(reader.read_record("data.pkl"),
                                        reader, lazy=True).load()
    except (ValueError, pickle.UnpicklingError):
        raise
    except Exception as err:
        raise ValueError(f"corrupt torch checkpoint {path!r}: {err}") from err
