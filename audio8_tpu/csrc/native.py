"""ctypes bindings for the native library (editdistance, prefix beam
search, FLAC decode). Importing this module raises ImportError when the
library hasn't been built (callers fall back to Python paths)."""
from __future__ import annotations

import ctypes
import os
from typing import List, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libaudio8.so")

if not os.path.exists(_LIB_PATH):
    try:  # attempt a lazy build; tolerate missing toolchain
        from audio8_tpu.csrc.build import build

        build(verbose=False)
    except Exception as e:  # pragma: no cover
        raise ImportError(f"native library not built: {e}") from e

_lib = ctypes.CDLL(_LIB_PATH)

_lib.a8t_edit_distance.restype = ctypes.c_int64
_lib.a8t_edit_distance.argtypes = [
    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
]

_lib.a8t_prefix_beam_search.restype = ctypes.c_int64
_lib.a8t_prefix_beam_search.argtypes = [
    ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ctypes.c_float, ctypes.c_float, ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ctypes.c_int64,
]

_lib.a8t_flac_read.restype = ctypes.c_int64
_lib.a8t_flac_read.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
]


def _intern_pair(a: Sequence, b: Sequence):
    """Map arbitrary hashable tokens to dense ids (exact equality)."""
    table = {}

    def enc(seq):
        out = np.empty(len(seq), np.int64)
        for i, tok in enumerate(seq):
            out[i] = table.setdefault(tok, len(table))
        return out

    return enc(list(a)), enc(list(b))


def edit_distance(a: Sequence, b: Sequence) -> int:
    an, bn = _intern_pair(a, b)
    an = np.ascontiguousarray(an)
    bn = np.ascontiguousarray(bn)
    pa = an.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    pb = bn.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    return int(_lib.a8t_edit_distance(pa, len(an), pb, len(bn)))


def prefix_beam_search(log_probs: np.ndarray, blank: int, beam: int,
                       space_idx: int = -1, alpha: float = 0.0,
                       beta: float = 0.0, n_best: int = 0) -> List[List[int]]:
    """Decode one utterance (T, V) -> n-best id sequences."""
    lp = np.ascontiguousarray(log_probs, np.float32)
    t, v = lp.shape
    if n_best <= 0:
        n_best = beam
    out_ids = np.zeros((n_best, t), np.int64)
    out_lens = np.zeros((n_best,), np.int64)
    n = _lib.a8t_prefix_beam_search(
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t, v,
        blank, beam, space_idx, alpha, beta, n_best,
        out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), t)
    return [out_ids[i, : out_lens[i]].tolist() for i in range(int(n))]


_lib.a8t_lm_load.restype = ctypes.c_void_p
_lib.a8t_lm_load.argtypes = [ctypes.c_char_p]
_lib.a8t_lm_free.argtypes = [ctypes.c_void_p]
_lib.a8t_lm_logp.restype = ctypes.c_float
_lib.a8t_lm_logp.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
_lib.a8t_prefix_beam_search_lm.restype = ctypes.c_int64
_lib.a8t_prefix_beam_search_lm.argtypes = [
    ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ctypes.c_float, ctypes.c_float, ctypes.c_int64,
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_void_p,
    ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ctypes.c_int64,
]


_lib.a8t_lm_load_kenlm.restype = ctypes.c_void_p
_lib.a8t_lm_load_kenlm.argtypes = [ctypes.c_char_p]


class NativeLM:
    """Base handle over the C ABI `Lm*` (csrc/lm_iface.h). Scoring
    interface mirrors ops.lm.ArpaLM; the handle is also accepted
    directly by a8t_prefix_beam_search_lm."""

    _h = None

    def logp(self, word: str, context) -> float:
        ctx = " ".join(context) if not isinstance(context, str) else context
        return float(_lib.a8t_lm_logp(self._h, word.encode(), ctx.encode()))

    def __del__(self):  # pragma: no cover
        try:
            if getattr(self, "_h", None):
                _lib.a8t_lm_free(self._h)
        except Exception:
            pass


class NativeArpaLM(NativeLM):
    """C++ ARPA text LM (csrc/arpa_lm.cc)."""

    def __init__(self, path: str):
        self._h = _lib.a8t_lm_load(path.encode())
        if not self._h:
            raise IOError(f"failed to load ARPA LM {path!r}")


class NativeKenLM(NativeLM):
    """C++ mmap'd KenLM binary LM — PROBING, TRIE and QUANT_TRIE
    (csrc/kenlm_bin.cc). Raises IOError for any file the strict
    structural checks reject (REST_PROBING/array-trie binaries,
    truncated files) — callers fall back to the Python reader whose
    errors name the conversion recipe."""

    def __init__(self, path: str):
        self._h = _lib.a8t_lm_load_kenlm(path.encode())
        if not self._h:
            raise IOError(f"failed to load KenLM binary {path!r}")


def _pack_vocab(vocab: Sequence[str]):
    offsets = np.zeros(len(vocab) + 1, np.int64)
    blobs = []
    for i, piece in enumerate(vocab):
        b = piece.encode()
        blobs.append(b)
        offsets[i + 1] = offsets[i] + len(b)
    return b"".join(blobs), np.ascontiguousarray(offsets)


def prefix_beam_search_lm(log_probs: np.ndarray, blank: int, beam: int,
                          space_idx: int, alpha: float, beta: float,
                          vocab: Sequence[str], lm: "NativeLM | None",
                          n_best: int = 0) -> List[List[int]]:
    """LM-fused decode of one utterance (T, V) -> n-best id sequences."""
    lp = np.ascontiguousarray(log_probs, np.float32)
    t, v = lp.shape
    if n_best <= 0:
        n_best = beam
    buf, offsets = _pack_vocab(vocab)
    out_ids = np.zeros((n_best, t), np.int64)
    out_lens = np.zeros((n_best,), np.int64)
    n = _lib.a8t_prefix_beam_search_lm(
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t, v,
        blank, beam, space_idx, alpha, beta, n_best,
        buf, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lm._h if lm is not None else None,
        out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), t)
    return [out_ids[i, : out_lens[i]].tolist() for i in range(int(n))]


def read_flac(path: str) -> Tuple[np.ndarray, int, int]:
    """Decode a FLAC file -> (int32 array [T] or [T, C], sample_rate,
    bits_per_sample)."""
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    bps = ctypes.c_int32()
    total = ctypes.c_int64()
    rc = _lib.a8t_flac_read(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                            ctypes.byref(bps), ctypes.byref(total), None, 0)
    if rc != 0:
        raise IOError(f"FLAC header read failed for {path!r} (rc={rc})")
    n = int(total.value)
    if n == 0:
        n = 1 << 26  # unknown length: generous cap
    data = np.zeros((n * ch.value,), np.int32)
    got = _lib.a8t_flac_read(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                             ctypes.byref(bps), ctypes.byref(total),
                             data.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                             n)
    if got < 0:
        raise IOError(f"FLAC decode failed for {path!r} (rc={got})")
    data = data[: int(got) * ch.value]
    if ch.value > 1:
        data = data.reshape(-1, ch.value)
    return data, int(sr.value), int(bps.value)
