"""Binarized datasets + length-bucketed, static-shape batching.

The reference uses torchtext ``OrderedIterator`` (sort-by-length buckets,
dynamic shapes) + cuDNN packed sequences (SURVEY.md §2.1 #5). XLA requires
static shapes, so the TPU-native equivalent is:

- examples are assigned to a small set of *buckets* (config ``data.buckets``);
  every batch drawn from a bucket is padded to that bucket's fixed
  (batch, src_len) / (batch, tgt_len) shape — at most ``len(buckets)``
  compilations of the train step, then everything is cache hits;
- per-position masks (``ids != PAD``) replace packed sequences;
- each example carries its original corpus ``index`` so shuffled/bucketed
  batches can gather the right image-feature row (the index-alignment
  invariant of SURVEY.md §3.1).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, List, Optional, Sequence

import numpy as np

from variational_mmt_tpu.data.vocab import BOS, EOS, PAD


@dataclasses.dataclass
class Batch:
    """One fixed-shape minibatch (host-side numpy; moved to device by the
    prefetcher). ``example_mask`` zeroes loss/stats rows that are padding
    (partial final batches are padded up to the static batch size)."""

    src: np.ndarray  # (B, Ls) int32, PAD-padded
    tgt_in: np.ndarray  # (B, Lt) int32, starts with BOS
    tgt_out: np.ndarray  # (B, Lt) int32, ends with EOS
    indices: np.ndarray  # (B,) int32 original example index
    example_mask: np.ndarray  # (B,) float32, 1=real example
    img: Optional[np.ndarray] = None  # (B, D) or (B, R, D) float32

    @property
    def batch_size(self) -> int:
        return self.src.shape[0]

    @property
    def n_tokens(self) -> int:
        return int(((self.tgt_out != PAD) * self.example_mask[:, None].astype(bool)).sum())


class BinarizedDataset:
    """Ragged id sequences stored flat (data + offsets) — compact, O(1) row
    access, trivially mmap-able. The analogue of the reference's ``.pt``
    shards from preprocess.py."""

    def __init__(self, src: List[np.ndarray], tgt: Optional[List[np.ndarray]] = None):
        self.src = src
        self.tgt = tgt
        self._src_flat: Optional[tuple] = None
        self._tgt_flat: Optional[tuple] = None

    def __len__(self) -> int:
        return len(self.src)

    def src_flat(self) -> tuple:
        """(data int32, offsets int64) — zero-copy layout for the native
        batcher (native/batcher.cpp)."""
        if self._src_flat is None:
            data = np.concatenate(self.src) if self.src else np.zeros(0, np.int32)
            off = np.cumsum([0] + [len(a) for a in self.src]).astype(np.int64)
            self._src_flat = (np.ascontiguousarray(data, np.int32), off)
        return self._src_flat

    def tgt_flat(self) -> Optional[tuple]:
        if self.tgt is None:
            return None
        if self._tgt_flat is None:
            data = np.concatenate(self.tgt) if self.tgt else np.zeros(0, np.int32)
            off = np.cumsum([0] + [len(a) for a in self.tgt]).astype(np.int64)
            self._tgt_flat = (np.ascontiguousarray(data, np.int32), off)
        return self._tgt_flat

    # -- persistence ---------------------------------------------------
    def save(self, path: str) -> None:
        # the on-disk layout IS the flat form, so reuse (and cache) it
        arrs = dict(zip(("src_data", "src_off"), self.src_flat()))
        tf = self.tgt_flat()
        if tf is not None:
            arrs["tgt_data"], arrs["tgt_off"] = tf
        np.savez_compressed(path, **arrs)

    @classmethod
    def load(cls, path: str) -> "BinarizedDataset":
        """Load a single ``.npz`` or, when ``path`` does not exist, the
        sharded form ``<base>.00.npz, <base>.01.npz, ...`` written by
        preprocess ``-shard_size`` (the reference's multi-``.pt``-shard
        datasets). Shards concatenate in index order so example index ==
        corpus line — the image-feature alignment invariant holds across
        shards."""
        shards = cls.shard_paths(path)
        if os.path.exists(path) and shards:
            # ambiguous layout: a stale file from a previous run would be
            # silently preferred — refuse instead of guessing
            raise ValueError(
                f"both {path} and shards ({shards[0]} ...) exist; remove the "
                "stale layout (re-running preprocess does this automatically)")
        paths = [path] if os.path.exists(path) else shards
        if not paths:
            raise FileNotFoundError(f"no dataset at {path} (or shards {path[:-4]}.NN.npz)")
        src: List[np.ndarray] = []
        tgt: Optional[List[np.ndarray]] = None
        flats = []
        for i, p in enumerate(paths):
            z = np.load(p)
            sd, so = z["src_data"], z["src_off"]
            src.extend(_unflatten(sd, so))
            has_tgt = "tgt_data" in z
            if i == 0:
                tgt = [] if has_tgt else None
            elif has_tgt != (tgt is not None):
                raise ValueError(f"shard {p} disagrees about having targets")
            if has_tgt:
                td, to = z["tgt_data"], z["tgt_off"]
                tgt.extend(_unflatten(td, to))
            if i == 0 and len(paths) == 1:
                flats = [(np.ascontiguousarray(sd, np.int32), so.astype(np.int64)),
                         (np.ascontiguousarray(td, np.int32), to.astype(np.int64))
                         if has_tgt else None]
        ds = cls(src, tgt)
        if flats:
            # single file: the on-disk layout IS the flat form the native
            # batcher asks for — seed the cache instead of re-concatenating
            # the whole corpus at first use
            ds._src_flat, ds._tgt_flat = flats
        return ds

    @staticmethod
    def shard_paths(path: str) -> List[str]:
        """Shard files for a ``<base>.npz`` path in NUMERIC index order
        ('.100.npz' must follow '.99.npz', not sort between '.10' and
        '.11'); [] if none."""
        import glob as _glob

        base = path[:-4] if path.endswith(".npz") else path
        found = [p for p in _glob.glob(base + ".*.npz")
                 if p[len(base) + 1 : -4].isdigit()]
        return sorted(found, key=lambda p: int(p[len(base) + 1 : -4]))

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(path) or bool(cls.shard_paths(path))


def _unflatten(data: np.ndarray, off: np.ndarray) -> List[np.ndarray]:
    # rows are read-only views into one int32 buffer (the ascontiguousarray
    # is a no-op for data written by save()); a per-row astype would copy
    # the whole corpus on every load
    data = np.ascontiguousarray(data, np.int32)
    return [data[off[i] : off[i + 1]] for i in range(len(off) - 1)]


def binarize(
    src_ids: Sequence[Sequence[int]],
    tgt_ids: Optional[Sequence[Sequence[int]]] = None,
    max_src_len: int = 0,
    max_tgt_len: int = 0,
) -> BinarizedDataset:
    """Truncate + pack id sequences (ids exclude BOS/EOS; those are added at
    batch time, mirroring the reference's Field postprocessing)."""
    src = [np.asarray(s[:max_src_len] if max_src_len else s, np.int32) for s in src_ids]
    tgt = None
    if tgt_ids is not None:
        tgt = [np.asarray(t[:max_tgt_len] if max_tgt_len else t, np.int32) for t in tgt_ids]
        assert len(src) == len(tgt)
    return BinarizedDataset(src, tgt)


def buckets_with_catchall(buckets: Sequence[int], need: int) -> List[int]:
    """Sorted ``buckets`` plus a catch-all bucket when ``need`` (the longest
    sequence to be batched, in tokens) exceeds the largest — over-long
    inputs are decoded/scored in full, never silently truncated at batch
    assembly. One policy shared by decode, force-decode scoring and IW eval
    so the three paths cannot diverge."""
    out = sorted(buckets)
    if need > out[-1]:
        out = out + [need]
    return out


class BucketIterator:
    """Length-bucketed batches with static shapes.

    Bucket of an example = smallest b in ``buckets`` with
    max(len(src), len(tgt)+1) <= b (tgt +1 for the BOS/EOS shift). Longer
    examples go to the last bucket, truncated. Iteration order is shuffled
    per epoch (seeded); within a bucket, batches are contiguous runs, so
    same-bucket examples batch together — the bucketed-batching behavior of
    the reference with deterministic shapes.
    """

    def __init__(
        self,
        ds: BinarizedDataset,
        batch_size: int,
        buckets: Sequence[int],
        img_feats: Optional[np.ndarray] = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        infinite: bool = False,
        use_native: Optional[bool] = None,
    ):
        self.ds = ds
        self.batch_size = batch_size
        self.buckets = sorted(buckets)
        self.img_feats = img_feats
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.infinite = infinite
        self._assign = self._bucketize()
        if use_native is None:
            from variational_mmt_tpu import native

            use_native = native.available()
        self.use_native = bool(use_native)
        if self.use_native and img_feats is not None:
            # one-time contiguous float32 view for the native row gather
            self.img_feats = np.ascontiguousarray(img_feats, np.float32)

    def _bucketize(self) -> List[List[int]]:
        per_bucket: List[List[int]] = [[] for _ in self.buckets]
        for i in range(len(self.ds)):
            ls = len(self.ds.src[i])
            lt = (len(self.ds.tgt[i]) + 1) if self.ds.tgt is not None else 0
            need = max(ls, lt, 1)
            b = next((j for j, cap in enumerate(self.buckets) if need <= cap), len(self.buckets) - 1)
            per_bucket[b].append(i)
        return per_bucket

    def __len__(self) -> int:
        n = 0
        for idxs in self._assign:
            if self.drop_last:
                n += len(idxs) // self.batch_size
            else:
                n += (len(idxs) + self.batch_size - 1) // self.batch_size
        return n

    def epoch(self, epoch: int = 0) -> Iterator[Batch]:
        rng = np.random.default_rng(self.seed + epoch)
        chunks = []  # (bucket_id, np.ndarray of example indices)
        for b, idxs in enumerate(self._assign):
            idxs = np.asarray(idxs, np.int64)
            if self.shuffle:
                idxs = idxs[rng.permutation(len(idxs))]
            for s in range(0, len(idxs), self.batch_size):
                chunk = idxs[s : s + self.batch_size]
                if self.drop_last and len(chunk) < self.batch_size:
                    continue
                if len(chunk):
                    chunks.append((b, chunk))
        order = rng.permutation(len(chunks)) if self.shuffle else np.arange(len(chunks))
        for ci in order:
            b, chunk = chunks[ci]
            yield self._make_batch(self.buckets[b], chunk)

    def __iter__(self) -> Iterator[Batch]:
        e = 0
        while True:
            yield from self.epoch(e)
            e += 1
            if not self.infinite:
                return

    def _make_batch(self, bucket_len: int, idxs: np.ndarray) -> Batch:
        if self.use_native:
            return self._make_batch_native(bucket_len, idxs)
        B, L = self.batch_size, bucket_len
        src = np.full((B, L), PAD, np.int32)
        tgt_in = np.full((B, L), PAD, np.int32)
        tgt_out = np.full((B, L), PAD, np.int32)
        indices = np.zeros((B,), np.int32)
        mask = np.zeros((B,), np.float32)
        for row, i in enumerate(idxs):
            s = self.ds.src[i][:L]
            src[row, : len(s)] = s
            if self.ds.tgt is not None:
                t = self.ds.tgt[i][: L - 1]
                tgt_in[row, 0] = BOS
                tgt_in[row, 1 : 1 + len(t)] = t
                tgt_out[row, : len(t)] = t
                tgt_out[row, len(t)] = EOS
            indices[row] = i
            mask[row] = 1.0
        img = None
        if self.img_feats is not None:
            img = np.asarray(self.img_feats[indices], np.float32)
            img *= mask.reshape((B,) + (1,) * (img.ndim - 1))
        return Batch(src=src, tgt_in=tgt_in, tgt_out=tgt_out, indices=indices, example_mask=mask, img=img)

    def _make_batch_native(self, bucket_len: int, idxs: np.ndarray) -> Batch:
        from variational_mmt_tpu import native
        from variational_mmt_tpu.data.vocab import BOS as _BOS, EOS as _EOS

        B, L = self.batch_size, bucket_len
        sd, so = self.ds.src_flat()
        tgt = self.ds.tgt_flat()
        td, to = tgt if tgt is not None else (None, None)
        src, tgt_in, tgt_out, indices, mask = native.assemble_batch(
            sd, so, td, to, idxs, B, L, _BOS, _EOS, PAD
        )
        img = None
        if self.img_feats is not None:
            img = native.gather_rows(self.img_feats, indices, mask)
        return Batch(src=src, tgt_in=tgt_in, tgt_out=tgt_out, indices=indices, example_mask=mask, img=img)
