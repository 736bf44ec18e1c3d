"""Torch-free reader for .pth checkpoint files.

The DanSpeech zoo ships torch-serialized packages (reference
model.py:599-624 ``DeepSpeech.load_model`` via ``torch.load``). To keep the
TPU framework free of a torch dependency we parse the formats directly:

- the zip-based format (torch >= 1.6): a zip archive holding
  ``<name>/data.pkl`` plus one raw little-endian buffer per storage under
  ``<name>/data/<key>``;
- the legacy format (torch < 1.6): a sequence of pickles (magic number,
  protocol, sys_info, the object graph with persistent ids, the list of
  storage keys) followed by raw storage payloads each prefixed with an
  int64 element count.

Tensor rebuilds are captured lazily during unpickling and materialized as
numpy arrays once storage payloads are read, via the (offset, size, stride)
metadata of ``_rebuild_tensor_v2``. No arbitrary code is executed — the
unpickler resolves only a small allowlist of globals.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any

import numpy as np

_MAGIC_NUMBER = 0x1950A86A20F9469CFC6C
_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # decoded specially to float32
}


class _Storage:
    """A raw 1-D buffer of a given scalar dtype, filled after unpickling."""

    def __init__(self, dtype_name: str, nelems: int | None):
        self.dtype_name = dtype_name
        self.nelems = nelems
        self.data: np.ndarray | None = None

    def itemsize(self) -> int:
        if self.dtype_name == "BFloat16Storage":
            return 2
        return np.dtype(_DTYPES[self.dtype_name]).itemsize

    def fill(self, raw: bytes):
        if self.dtype_name == "BFloat16Storage":
            u16 = np.frombuffer(raw, dtype="<u2")
            self.data = (u16.astype(np.uint32) << 16).view(np.float32).copy()
        else:
            dtype = _DTYPES[self.dtype_name]
            self.data = np.frombuffer(
                raw, dtype=np.dtype(dtype).newbyteorder("<")
            ).copy()


class _LazyTensor:
    """Deferred tensor view: resolves once its storage has data."""

    def __init__(self, storage: _Storage, offset: int, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = tuple(size)
        self.stride = tuple(stride)

    def resolve(self) -> np.ndarray:
        base = self.storage.data
        if base is None:
            raise ValueError("Storage payload missing for tensor rebuild")
        itemsize = base.dtype.itemsize
        return np.lib.stride_tricks.as_strided(
            base[self.offset :],
            shape=self.size,
            strides=tuple(s * itemsize for s in self.stride),
        ).copy()


def _rebuild_tensor_v2(
    storage, storage_offset, size, stride, requires_grad=False,
    backward_hooks=None, metadata=None,
):
    return _LazyTensor(storage, storage_offset, size, stride)


class _TorchType:
    """Stand-in for torch dtype/class globals referenced by pickles."""

    def __init__(self, name):
        self.name = name


class _Unpickler(pickle.Unpickler):
    """Restricted unpickler: only storage/tensor rebuild machinery resolves."""

    def __init__(self, file, storages: dict[str, _Storage]):
        super().__init__(file, encoding="utf-8")
        self._storages = storages

    def find_class(self, module, name):
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        if module == "torch._utils" and name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
            if name == "_rebuild_tensor":
                return lambda st, off, size, stride: _LazyTensor(st, off, size, stride)
            return _rebuild_tensor_v2
        if module == "torch" and (name in _DTYPES or name.endswith("dtype") or name == "Size"):
            return tuple if name == "Size" else _TorchType(name)
        raise pickle.UnpicklingError(
            f"Checkpoint references disallowed global {module}.{name}"
        )

    def persistent_load(self, pid):
        if not isinstance(pid, tuple) or pid[0] != "storage":
            raise pickle.UnpicklingError(f"Unsupported persistent id: {pid!r}")
        _, storage_type, key, _location, *rest = pid
        type_name = (
            storage_type.name
            if isinstance(storage_type, _TorchType)
            else str(storage_type)
        )
        if key not in self._storages:
            nelems = rest[0] if rest else None
            self._storages[key] = _Storage(type_name, nelems)
        return self._storages[key]


def _resolve(obj):
    """Replace _LazyTensor nodes with numpy arrays throughout containers."""
    if isinstance(obj, _LazyTensor):
        return obj.resolve()
    if isinstance(obj, dict):
        return type(obj)((k, _resolve(v)) for k, v in obj.items())
    if isinstance(obj, (list, tuple)):
        return type(obj)(_resolve(v) for v in obj)
    return obj


def _load_zip(data: bytes) -> Any:
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]
        storages: dict[str, _Storage] = {}
        up = _Unpickler(io.BytesIO(zf.read(pkl_name)), storages)
        obj = up.load()
        for key, storage in storages.items():
            storage.fill(zf.read(f"{prefix}data/{key}"))
    return _resolve(obj)


def _load_legacy(raw: bytes) -> Any:
    # EVERY pickle in the stream goes through the restricted unpickler —
    # the magic/protocol/sys_info/key_order pickles run before or after
    # the object graph and an unrestricted pickle.load on any of them
    # would defeat the module's no-code-execution guarantee
    f = io.BytesIO(raw)
    storages: dict[str, _Storage] = {}

    def load_restricted():
        return _Unpickler(f, storages).load()

    magic = load_restricted()
    if magic != _MAGIC_NUMBER:
        raise ValueError("Not a legacy torch checkpoint (bad magic number)")
    _protocol = load_restricted()
    _sys_info = load_restricted()
    obj = load_restricted()
    key_order = load_restricted()
    for key in key_order:
        storage = storages[key]
        (nelems,) = struct.unpack("<q", f.read(8))
        storage.fill(f.read(nelems * storage.itemsize()))
    return _resolve(obj)


def torch_load(path) -> Any:
    """Load a .pth checkpoint into plain python/numpy objects.

    Dispatches between the zip and legacy serialization formats (reference
    usage: model.py:607 ``torch.load(path, map_location=cpu)``).
    """
    if isinstance(path, bytes):
        raw = path
    else:
        with open(path, "rb") as f:
            raw = f.read()
    if raw[:2] == b"PK":
        return _load_zip(raw)
    return _load_legacy(raw)
