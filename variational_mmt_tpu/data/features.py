"""Image-feature loading (ResNet-50 pool5 / conv), index-aligned to text.

The reference stores pre-extracted features in HDF5 files whose row order
matches the corpus line order, gathered per batch via ``batch.indices``
(SURVEY.md §2.1 #6, §3.1 invariant). We accept HDF5 (any single dataset, or
one named per split) and ``.npy``/``.npz``; features are loaded fully into
host RAM (Multi30k: 29k x 2048 floats ≈ 230 MB) or mem-mapped, and batches
gather rows on host before the async host→HBM transfer in the prefetcher.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def load_features(path: str, split: Optional[str] = None, mmap: bool = False) -> np.ndarray:
    """Load an (N, D) or (N, R, D) feature array.

    HDF5: if `split` names a dataset in the file use it, else if the file has
    exactly one dataset use that. conv features stored as (N, 7, 7, 2048) or
    (N, 2048, 7, 7) are reshaped to (N, 49, 2048).
    """
    ext = os.path.splitext(path)[1].lower()
    if ext in (".h5", ".hdf5"):
        import h5py

        with h5py.File(path, "r") as f:
            keys = list(f.keys())
            if split is not None:
                # an explicitly requested split must exist: silently handing
                # back a different dataset breaks the row<->line alignment
                # invariant with no diagnostic
                if split not in f:
                    raise KeyError(
                        f"split {split!r} not in {path} (has {keys})"
                    )
                key = split
            elif len(keys) == 1:
                key = keys[0]
            else:
                # common reference naming: feats / train / valid / test
                for cand in ("feats", "features", "data"):
                    if cand in f:
                        key = cand
                        break
                else:
                    raise KeyError(f"ambiguous HDF5 datasets {keys} in {path}; pass split=")
            arr = np.asarray(f[key], np.float32)
    elif ext == ".npy":
        if split is not None:
            # a bare .npy holds exactly one array; silently returning it for
            # a requested split would pair e.g. valid text with train-ordered
            # rows (same invariant the HDF5/npz branches raise to protect)
            raise ValueError(
                f"{path} is a single-array .npy and cannot honor "
                f"split={split!r}; use per-split files or an HDF5/npz "
                "with named splits")
        arr = np.load(path, mmap_mode="r" if mmap else None)
    elif ext == ".npz":
        z = np.load(path)
        if split is not None:
            if split not in z:
                raise KeyError(f"split {split!r} not in {path} (has {list(z.keys())})")
            key = split
        else:
            key = list(z.keys())[0]
        arr = np.asarray(z[key], np.float32)
    else:
        raise ValueError(f"unsupported feature file: {path}")

    arr = np.asarray(arr)
    if arr.ndim == 4:  # conv maps (N,7,7,C) or (N,C,7,7) -> (N, 49, C)
        if arr.shape[1] == arr.shape[2]:  # NHWC
            n, h, w, c = arr.shape
            arr = arr.reshape(n, h * w, c)
        else:  # NCHW
            n, c, h, w = arr.shape
            arr = arr.transpose(0, 2, 3, 1).reshape(n, h * w, c)
    return arr


def save_features(path: str, feats: np.ndarray) -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".h5", ".hdf5"):
        import h5py

        with h5py.File(path, "w") as f:
            f.create_dataset("feats", data=np.asarray(feats, np.float32))
    elif ext == ".npy":
        np.save(path, np.asarray(feats, np.float32))
    else:
        raise ValueError(f"unsupported feature file: {path}")
