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
import stat
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRCS = [
    os.path.join(os.path.dirname(__file__), "batcher.cpp"),
    os.path.join(os.path.dirname(__file__), "bpe.cpp"),
    os.path.join(os.path.dirname(__file__), "packer.cpp"),
]


def _build(out_path: str) -> bool:
    # compile to a per-pid temp path then atomically rename: concurrent
    # processes (MP serving dispatchers on a cold cache) would otherwise
    # CDLL a half-written .so another builder is still emitting
    tmp_path = f"{out_path}.{os.getpid()}.tmp"
    for extra in (["-march=native"], []):  # -march may be unsupported
        try:
            subprocess.run(
                ["g++", "-O3", *extra, "-shared", "-fPIC", *_SRCS, "-o", tmp_path],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp_path, out_path)
            return True
        except Exception:
            continue
        finally:
            if os.path.exists(tmp_path):
                try:
                    os.remove(tmp_path)
                except OSError:
                    pass
    return False


def _user_cache_dir() -> Optional[str]:
    """Per-user 0700 cache dir for the fallback build (never a shared tmp
    path — loading a .so another local user could pre-plant would hand them
    code execution in the training process)."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    path = os.path.join(base, "vmmt_native")
    try:
        os.makedirs(path, mode=0o700, exist_ok=True)
        os.chmod(path, 0o700)
    except OSError:
        return None
    return path


def _safe_to_load(path: str) -> bool:
    """Only CDLL files we own that nobody else can write."""
    try:
        st = os.stat(path)
    except OSError:
        return False
    if st.st_uid != os.getuid():
        return False
    return not (st.st_mode & (stat.S_IWGRP | stat.S_IWOTH))


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    candidates = [os.path.join(os.path.dirname(__file__), "_native_batcher.so")]
    cache = _user_cache_dir()
    if cache is not None:
        candidates.append(os.path.join(cache, "_native_batcher.so"))
    srcs = [s for s in _SRCS if os.path.exists(s)]
    if len(srcs) < len(_SRCS):
        # sources missing (e.g. a deploy shipping only the prebuilt .so):
        # never rebuild, but a shipped library is still loadable — and with
        # nothing to load we must degrade to Python, not crash available()
        newest_src = 0.0
        can_build = False
    else:
        newest_src = max(os.path.getmtime(s) for s in srcs)
        can_build = True
    for path in candidates:
        if not os.path.exists(path) or os.path.getmtime(path) < newest_src:
            if not (can_build and _build(path)):
                continue
        if not _safe_to_load(path):
            continue
        try:
            lib = ctypes.CDLL(path)
            lib.assemble_batch.restype = None
            lib.gather_rows_f32.restype = None
            lib.bpe_create.restype = ctypes.c_void_p
            lib.bpe_create.argtypes = [ctypes.c_char_p]
            lib.bpe_free.argtypes = [ctypes.c_void_p]
            lib.bpe_segment.restype = ctypes.c_int64
            lib.bpe_segment.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
            ]
            lib.pack_plan.restype = ctypes.c_int64
            lib.assemble_packed.restype = None
            _LIB = lib
            return _LIB
        except (OSError, AttributeError):
            # AttributeError: a stale cached .so predating newer symbols —
            # fall through to the next candidate / pure-Python fallback
            # instead of crashing the importer
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


def pack_plan(src_off: np.ndarray, tgt_off: np.ndarray, order: np.ndarray,
              B: int, L: int, K: int):
    """Greedy first-fit packing plan for one epoch (packer.cpp). Returns
    (row_off int64 (n_rows+1,), row_examples int64 (n,)) — corpus indices
    grouped per packed row, batch b = rows [b*B, (b+1)*B)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native packer unavailable")
    if K > 16:
        raise ValueError(f"native packer supports pack_segments <= 16, got {K}")
    order64 = np.ascontiguousarray(order, np.int64)
    n = len(order64)
    row_off = np.empty(n + 1, np.int64)
    row_examples = np.empty(max(n, 1), np.int64)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    n_rows = lib.pack_plan(
        ptr(np.ascontiguousarray(src_off, np.int64)),
        ptr(np.ascontiguousarray(tgt_off, np.int64)),
        ptr(order64), ctypes.c_int64(n),
        ctypes.c_int64(B), ctypes.c_int64(L), ctypes.c_int64(K),
        ptr(row_off), ptr(row_examples),
    )
    if n_rows < 0:
        raise RuntimeError("native pack_plan rejected arguments")
    return row_off[: n_rows + 1], row_examples[:n]


def assemble_packed(src_data, src_off, tgt_data, tgt_off,
                    row_off, row_examples, row0: int, n_rows: int,
                    B: int, L: int, K: int, bos: int, eos: int, pad: int):
    """Fill one packed batch from a pack_plan (packer.cpp). Returns
    (src, tgt_in, tgt_out, src_seg, tgt_seg, seg_first, seg_last,
    indices, seg_mask) as fresh arrays."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native packer unavailable")
    out_src = np.empty((B, L), np.int32)
    out_tin = np.empty((B, L), np.int32)
    out_tout = np.empty((B, L), np.int32)
    out_sseg = np.empty((B, L), np.int32)
    out_tseg = np.empty((B, L), np.int32)
    out_first = np.empty((B, K), np.int32)
    out_last = np.empty((B, K), np.int32)
    out_idx = np.empty((B, K), np.int32)
    out_segmask = np.empty((B, K), np.float32)

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    lib.assemble_packed(
        p32(src_data), p64(src_off), p32(tgt_data), p64(tgt_off),
        p64(np.ascontiguousarray(row_off, np.int64)),
        p64(np.ascontiguousarray(row_examples, np.int64)),
        ctypes.c_int64(row0), ctypes.c_int64(n_rows),
        ctypes.c_int64(B), ctypes.c_int64(L), ctypes.c_int64(K),
        ctypes.c_int32(bos), ctypes.c_int32(eos), ctypes.c_int32(pad),
        p32(out_src), p32(out_tin), p32(out_tout),
        p32(out_sseg), p32(out_tseg), p32(out_first), p32(out_last),
        p32(out_idx), out_segmask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return (out_src, out_tin, out_tout, out_sseg, out_tseg, out_first,
            out_last, out_idx, out_segmask)


class NativeBPE:
    """C++ BPE segmenter handle (byte-identical to data/bpe.py:BPE)."""

    def __init__(self, merges):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        txt = "\n".join(f"{a} {b}" for a, b in merges) + "\n"
        self._h = lib.bpe_create(txt.encode("utf-8"))

    def segment_word(self, word: str, _cap: int = 4096):
        # per-call buffer: ctypes releases the GIL during the C call, so a
        # shared buffer would race under the threaded serving front end
        # (and the corrupted result would be poisoned into BPE._cache)
        buf = ctypes.create_string_buffer(_cap)
        n = self._lib.bpe_segment(self._h, word.encode("utf-8"), buf, len(buf))
        if n < 0:  # pathological word longer than the buffer
            return self.segment_word(word, 4 * _cap)
        if n == 0:
            return []
        return buf.value.decode("utf-8").split(" ")

    def __del__(self):
        lib = getattr(self, "_lib", None)
        h = getattr(self, "_h", None)
        if lib is not None and h:
            lib.bpe_free(h)
