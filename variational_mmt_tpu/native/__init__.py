"""Native (C++) runtime pieces, loaded via ctypes.

Build is automatic and cached: on first import we compile
``batcher.cpp`` with g++ into ``_native_batcher.so`` next to this file
(falling back to a temp dir if the package is read-only). Everything
degrades gracefully to the pure-Python implementations when no compiler is
available — ``available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "batcher.cpp")


def _build(out_path: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", out_path],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        try:  # -march=native may be unsupported in some sandboxes
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", out_path],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except Exception:
            return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    candidates = [
        os.path.join(os.path.dirname(__file__), "_native_batcher.so"),
        os.path.join(tempfile.gettempdir(), "vmmt_native_batcher.so"),
    ]
    for path in candidates:
        if not os.path.exists(path) or os.path.getmtime(path) < os.path.getmtime(_SRC):
            if not _build(path):
                continue
        try:
            lib = ctypes.CDLL(path)
            lib.assemble_batch.restype = None
            lib.gather_rows_f32.restype = None
            _LIB = lib
            return _LIB
        except OSError:
            continue
    return None


def available() -> bool:
    return _load() is not None


def assemble_batch(
    src_data: np.ndarray, src_off: np.ndarray,
    tgt_data: Optional[np.ndarray], tgt_off: Optional[np.ndarray],
    indices: np.ndarray, B: int, L: int,
    bos: int, eos: int, pad: int,
):
    """Returns (src, tgt_in, tgt_out, indices_out, mask) as fresh arrays.
    Raises RuntimeError if the native library is unavailable (callers check
    available() and fall back to the Python path)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native batcher unavailable")
    out_src = np.empty((B, L), np.int32)
    out_tin = np.empty((B, L), np.int32)
    out_tout = np.empty((B, L), np.int32)
    out_idx = np.empty((B,), np.int32)
    out_mask = np.empty((B,), np.float32)
    idx64 = np.ascontiguousarray(indices, np.int64)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t)) if a is not None else None

    lib.assemble_batch(
        ptr(src_data, ctypes.c_int32), ptr(src_off, ctypes.c_int64),
        ptr(tgt_data, ctypes.c_int32), ptr(tgt_off, ctypes.c_int64),
        ptr(idx64, ctypes.c_int64), ctypes.c_int64(len(idx64)),
        ctypes.c_int64(B), ctypes.c_int64(L),
        ctypes.c_int32(bos), ctypes.c_int32(eos), ctypes.c_int32(pad),
        ptr(out_src, ctypes.c_int32), ptr(out_tin, ctypes.c_int32),
        ptr(out_tout, ctypes.c_int32), ptr(out_idx, ctypes.c_int32),
        ptr(out_mask, ctypes.c_float),
    )
    return out_src, out_tin, out_tout, out_idx, out_mask


def gather_rows(feats: np.ndarray, indices: np.ndarray, mask: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native batcher unavailable")
    feats = np.ascontiguousarray(feats, np.float32)
    B = len(indices)
    row_elems = int(np.prod(feats.shape[1:]))
    out = np.empty((B,) + feats.shape[1:], np.float32)
    lib.gather_rows_f32(
        feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(row_elems),
        np.ascontiguousarray(indices, np.int32).ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(B),
        np.ascontiguousarray(mask, np.float32).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
