"""Torch-free reader for PyTorch ``.pt``/``.pth`` checkpoint files.

Fairseq checkpoints — the reference's interchange format
(/root/reference/audio8/wav2vec2.py:171-186 ``torch.load``;
convert_wav2vec2_checkpoint.py) — are ZIP archives holding a pickle
(``archive/data.pkl``) whose tensors are persistent-ID references into raw
little-endian storage blobs (``archive/data/<key>``). A TPU host has no
reason to carry a multi-GB torch install just to read that container, so
this module parses it directly into numpy arrays:

- a restricted unpickler resolves ``torch.FloatStorage`` & friends to
  dtype tags, rebuilds tensors via the documented
  ``torch._utils._rebuild_tensor_v2`` calling convention, and stubs every
  other global (fairseq blobs embed argparse/omegaconf config objects the
  state-dict consumer never touches);
- storages are materialized from the zip entries with
  ``np.frombuffer`` + ``as_strided`` so non-contiguous saves round-trip.

``load_state_dict`` returns ``{key: np.ndarray}`` for the ``'model'``
entry (or the whole mapping when the blob IS a bare state dict), exactly
what ``models/convert.py`` consumes. Bit-level agreement with
``torch.load`` is asserted in tests/test_fairseq_golden.py.

Only the zip format (torch >= 1.6 default) is supported; the legacy
tar/pickle stream raises with a re-save hint.
"""
from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict

import numpy as np

__all__ = ["load_pt", "load_state_dict"]


def _np_dtype(storage_name: str) -> np.dtype:
    table = {
        "FloatStorage": np.float32,
        "DoubleStorage": np.float64,
        "HalfStorage": np.float16,
        "LongStorage": np.int64,
        "IntStorage": np.int32,
        "ShortStorage": np.int16,
        "CharStorage": np.int8,
        "ByteStorage": np.uint8,
        "BoolStorage": np.bool_,
        "ComplexFloatStorage": np.complex64,
        "ComplexDoubleStorage": np.complex128,
    }
    if storage_name in table:
        return np.dtype(table[storage_name])
    if storage_name == "BFloat16Storage":
        import ml_dtypes  # ships with jax

        return np.dtype(ml_dtypes.bfloat16)
    raise ValueError(f"unsupported torch storage type {storage_name!r}")


class _StorageTag:
    """Marker returned by find_class for ``torch.<T>Storage`` globals."""

    def __init__(self, name: str):
        self.dtype = _np_dtype(name)


class _Stub:
    """Absorbs any non-tensor object in the pickle (argparse.Namespace,
    omegaconf containers, fairseq dataclasses, ...) without executing
    anything: construction, setstate, attribute sets and calls are all
    no-ops. State-dict consumers never look inside these."""

    def __new__(cls, *args, **kwargs):  # NEWOBJ with arbitrary args
        return super().__new__(cls)

    def __init__(self, *args, **kwargs):  # REDUCE with arbitrary args
        pass

    def __setstate__(self, state):  # BUILD with dict/tuple state
        pass

    def __setitem__(self, key, value):  # SETITEMS on reduce results
        pass

    def append(self, item):  # APPENDS on reduce results
        pass

    def extend(self, items):
        pass

    def __call__(self, *args, **kwargs):  # e.g. _reconstruct helpers
        return _Stub()


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *unused):
    """numpy replica of torch._utils._rebuild_tensor_v2 (the serialized
    tensor-from-storage constructor: offset/shape are in elements,
    strides in elements not bytes)."""
    dtype, raw = storage
    flat = np.frombuffer(raw, dtype=dtype)
    if not size:  # 0-dim tensor
        return np.array(flat[storage_offset], dtype=dtype)
    itemsize = flat.dtype.itemsize
    byte_strides = tuple(int(s) * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        flat[int(storage_offset):], shape=tuple(int(d) for d in size),
        strides=byte_strides)
    return np.array(view)  # owning, contiguous copy


_ALLOWED = {
    ("collections", "OrderedDict"): dict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): (
        lambda storage, offset, size, stride: _rebuild_tensor_v2(
            storage, offset, size, stride)),
    ("torch._utils", "_rebuild_parameter"): (
        lambda data, requires_grad=True, hooks=None: data),
    ("torch._utils", "_rebuild_parameter_with_state"): (
        lambda data, requires_grad=True, hooks=None, state=None: data),
    ("torch.serialization", "_get_layout"): lambda name: None,
}


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, storages: Dict[str, bytes]):
        super().__init__(file)
        self._storages = storages

    def find_class(self, module: str, name: str):
        fn = _ALLOWED.get((module, name))
        if fn is not None:
            return fn
        if module == "torch" and name.endswith("Storage"):
            return _StorageTag(name)
        # anything else (Namespace, omegaconf, fairseq cfg, torch.device,
        # torch dtypes...) is opaque config payload: stub it
        return _Stub

    def persistent_load(self, pid):
        # ('storage', storage_type, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        tag, key = pid[1], pid[2]
        if not isinstance(tag, _StorageTag):
            raise pickle.UnpicklingError(
                f"unsupported storage class for key {key!r}")
        raw = self._storages.get(str(key))
        if raw is None:
            raise pickle.UnpicklingError(f"missing storage blob {key!r}")
        return (tag.dtype, raw)


def load_pt(path: str) -> Any:
    """Parse a torch zip-format checkpoint into plain Python objects:
    tensors become numpy arrays, OrderedDicts become dicts, config
    objects become opaque stubs."""
    try:
        zf = zipfile.ZipFile(path)
    except zipfile.BadZipFile:
        with open(path, "rb") as f:
            head = f.read(8)
        raise ValueError(
            f"{path}: not a torch zip-format checkpoint (header "
            f"{head!r}). Legacy torch<1.6 saves are not supported "
            "torch-free — re-save it once with torch.save(torch.load(p), "
            "p) on any machine with torch, or install torch here.")
    with zf:
        names = zf.namelist()
        pkl_names = [n for n in names if n.endswith("/data.pkl")]
        if not pkl_names:
            raise ValueError(
                f"{path}: zip archive without a data.pkl — not a torch "
                "checkpoint")
        prefix = pkl_names[0][: -len("data.pkl")]
        storages = {
            n[len(prefix) + len("data/"):]: zf.read(n)
            for n in names if n.startswith(prefix + "data/")
        }
        byteorder = "little"
        if prefix + "byteorder" in names:
            byteorder = zf.read(prefix + "byteorder").decode().strip()
        if byteorder != "little":
            raise ValueError(f"{path}: {byteorder}-endian save unsupported")
        data = zf.read(pkl_names[0])
    return _Unpickler(io.BytesIO(data), storages).load()


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read the 'model' state dict of a fairseq-style ``.pt`` (or a bare
    saved state dict) as {key: np.ndarray}, torch-free."""
    blob = load_pt(path)
    if isinstance(blob, dict) and isinstance(blob.get("model"), dict):
        blob = blob["model"]
    if not isinstance(blob, dict):
        raise ValueError(
            f"{path}: expected a state dict or a {{'model': ...}} blob, "
            f"got {type(blob).__name__}")
    def _has_stub(v, depth=0):
        # a _Stub can hide inside a container produced by an unknown
        # rebuild helper (list/tuple/dict value), not just at top level —
        # scan containers too, bounded so a pathological deep structure
        # cannot hang the loader (round-4 advisor). A container at the
        # depth bound is treated as POSSIBLY stubbed: the whole point of
        # this check is to fail loudly rather than silently drop a
        # weight, so "too deep to verify" must not become a silent pass.
        if isinstance(v, _Stub):
            return True
        if isinstance(v, (list, tuple, set)):
            return depth >= 4 or any(_has_stub(x, depth + 1) for x in v)
        if isinstance(v, dict):
            return depth >= 4 or any(_has_stub(x, depth + 1)
                                     for x in v.values())
        return False

    out = {}
    stubbed = []
    for k, v in blob.items():
        if isinstance(v, np.ndarray):
            out[k] = v
        elif _has_stub(v):
            # a tensor-position entry whose rebuild helper is not in
            # _ALLOWED got absorbed as an opaque stub — dropping it
            # silently would leave those weights at random init after a
            # warm start (torch.load would have returned them), so fail
            # loudly instead (round-4 review)
            stubbed.append(k)
    if stubbed:
        raise ValueError(
            f"{path}: {len(stubbed)} state-dict entries use a tensor "
            "rebuild helper this torch-free reader does not know "
            f"(first: {stubbed[0]!r}). Re-save the checkpoint once with "
            "torch.save(torch.load(p), p) on any machine with torch, "
            "or install torch here (models/convert.py then loads it "
            "via torch directly).")
    if not out:
        raise ValueError(f"{path}: no tensors found in checkpoint")
    return out
