"""Sequence packing: multiple sentences per static (B, L) row.

The bucketed iterator (data/dataset.py) already bounds padding waste, but
Multi30k-shape corpora (BPE sentences ~8-25 tokens, SURVEY.md §2.4) still
leave ~25-35% of a 32-token bucket as PAD. XLA charges for every padded
position, so packing K short sentences into one row raises REAL tokens per
(identically-shaped, identically-compiled) train step by exactly the
recovered padding fraction — the classic TPU input-pipeline optimization
(T5-style packing), applied to the RNN/attention stack via segment-reset
recurrences + segment-masked attention (models/gru.py, models/decoder.py).

Packing changes nothing about the math: every packed segment is encoded,
latent-modeled, decoded, and normalized exactly as if it were alone in a
row (tests/test_pack.py proves loss+grad equivalence). Training-side only;
decode/IW batches are never packed.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence

import numpy as np

from variational_mmt_tpu.data.dataset import BinarizedDataset
from variational_mmt_tpu.data.vocab import BOS, EOS, PAD


@dataclasses.dataclass
class PackedBatch:
    """One fixed-shape packed minibatch. Segment id arrays use -1 at PAD
    positions; per-segment arrays are (B, K) with ``seg_mask`` marking real
    segments. ``indices`` keeps the corpus-line alignment invariant
    (SURVEY.md §3.1) per SEGMENT so image rows gather correctly."""

    src: np.ndarray  # (B, L) int32
    tgt_in: np.ndarray  # (B, L) int32: [BOS y1..yn] per segment
    tgt_out: np.ndarray  # (B, L) int32: [y1..yn EOS] per segment
    src_seg: np.ndarray  # (B, L) int32 in [-1, K)
    tgt_seg: np.ndarray  # (B, L) int32 in [-1, K)
    seg_first: np.ndarray  # (B, K) int32 first src position of segment
    seg_last: np.ndarray  # (B, K) int32 last src position (inclusive)
    indices: np.ndarray  # (B, K) int32 corpus index per segment
    seg_mask: np.ndarray  # (B, K) float32 1=real segment
    img: Optional[np.ndarray] = None  # (B, K, D) or (B, K, R, D)

    @property
    def batch_size(self) -> int:
        return self.src.shape[0]

    @property
    def n_tokens(self) -> int:
        return int((self.tgt_seg >= 0).sum())

    @property
    def n_sentences(self) -> int:
        return int(self.seg_mask.sum())


class _Row:
    __slots__ = ("src_used", "tgt_used", "segs")

    def __init__(self):
        self.src_used = 0
        self.tgt_used = 0
        self.segs: List[int] = []  # corpus indices


class PackedBucketIterator:
    """Greedy first-fit packer emitting static-shape :class:`PackedBatch`es.

    One row length (the largest configured bucket) serves every batch: a
    packed stream has a SINGLE train-step shape, so the whole run is one
    compilation — packing subsumes bucketing (short sentences share rows
    instead of migrating to short buckets). Iteration order is shuffled per
    epoch (seeded); each example lands in exactly one segment of one row.
    Interface mirrors data/dataset.py:BucketIterator (epoch / __iter__ /
    __len__) so the Trainer consumes either stream unchanged.
    """

    def __init__(
        self,
        ds: BinarizedDataset,
        batch_size: int,
        buckets: Sequence[int],
        img_feats: Optional[np.ndarray] = None,
        shuffle: bool = True,
        seed: int = 0,
        infinite: bool = False,
        max_segments: int = 4,
        use_native: Optional[bool] = None,
    ):
        if ds.tgt is None:
            raise ValueError("sequence packing requires a target side")
        self.ds = ds
        self.batch_size = batch_size
        self.row_len = max(buckets)
        self.img_feats = img_feats
        self.shuffle = shuffle
        self.seed = seed
        self.infinite = infinite
        self.K = max(1, max_segments)
        if use_native is None:
            from variational_mmt_tpu import native

            # the C++ plan buffer holds <=16 segments/row (packer.cpp)
            use_native = native.available() and self.K <= 16
        self.use_native = bool(use_native)

    def __len__(self) -> int:
        # estimate (exact count depends on the epoch's packing): total
        # token-length over row capacity, floor one batch
        L = self.row_len
        need = sum(
            max(min(len(s), L), min(len(t) + 1, L))
            for s, t in zip(self.ds.src, self.ds.tgt)
        )
        return max(1, -(-need // (L * self.batch_size)))

    def epoch(self, epoch: int = 0) -> Iterator[PackedBatch]:
        rng = np.random.default_rng(self.seed + epoch)
        order = (rng.permutation(len(self.ds)) if self.shuffle
                 else np.arange(len(self.ds)))
        if self.use_native:
            yield from self._epoch_native(order)
            return
        L, K = self.row_len, self.K
        rows: List[_Row] = []
        for i in order:
            ls = min(len(self.ds.src[i]), L)
            lt = min(len(self.ds.tgt[i]) + 1, L)  # +1 for the BOS/EOS shift
            placed = False
            # most-recently-opened rows first: older rows are fuller, and
            # locality keeps the scan short
            for row in reversed(rows):
                if (len(row.segs) < K and row.src_used + ls <= L
                        and row.tgt_used + lt <= L):
                    row.src_used += ls
                    row.tgt_used += lt
                    row.segs.append(int(i))
                    placed = True
                    break
            if not placed:
                if len(rows) == self.batch_size:
                    yield self._assemble(rows)
                    rows = []
                r = _Row()
                r.src_used, r.tgt_used, r.segs = ls, lt, [int(i)]
                rows.append(r)
        if rows:
            yield self._assemble(rows)

    def _epoch_native(self, order: np.ndarray) -> Iterator[PackedBatch]:
        """C++ fast path (native/packer.cpp): one pack_plan call per epoch,
        one assemble_packed call per batch — array-identical to the Python
        path (tests/test_pack.py parity test), ~20x the host throughput
        (the Python packer saturates a 1-CPU host at exactly the flagship
        step rate; see perf_notes "Native packer")."""
        from variational_mmt_tpu import native
        from variational_mmt_tpu.data.vocab import BOS as _BOS, EOS as _EOS

        B, L, K = self.batch_size, self.row_len, self.K
        sd, so = self.ds.src_flat()
        td, to = self.ds.tgt_flat()
        row_off, row_ex = native.pack_plan(so, to, order, B, L, K)
        n_rows = len(row_off) - 1
        for b0 in range(0, n_rows, B):
            nb = min(B, n_rows - b0)
            (src, tgt_in, tgt_out, src_seg, tgt_seg, seg_first, seg_last,
             indices, seg_mask) = native.assemble_packed(
                sd, so, td, to, row_off, row_ex, b0, nb,
                B, L, K, _BOS, _EOS, PAD)
            yield PackedBatch(
                src=src, tgt_in=tgt_in, tgt_out=tgt_out, src_seg=src_seg,
                tgt_seg=tgt_seg, seg_first=seg_first, seg_last=seg_last,
                indices=indices, seg_mask=seg_mask,
                img=self._img_rows(indices, seg_mask),
            )

    def _img_rows(self, indices: np.ndarray, seg_mask: np.ndarray):
        if self.img_feats is None:
            return None
        B, K = indices.shape
        img = np.asarray(self.img_feats[indices], np.float32)
        img *= seg_mask.reshape((B, K) + (1,) * (img.ndim - 2))
        return img

    def __iter__(self) -> Iterator[PackedBatch]:
        e = 0
        while True:
            yield from self.epoch(e)
            e += 1
            if not self.infinite:
                return

    def _assemble(self, rows: List[_Row]) -> PackedBatch:
        B, L, K = self.batch_size, self.row_len, self.K
        src = np.full((B, L), PAD, np.int32)
        tgt_in = np.full((B, L), PAD, np.int32)
        tgt_out = np.full((B, L), PAD, np.int32)
        src_seg = np.full((B, L), -1, np.int32)
        tgt_seg = np.full((B, L), -1, np.int32)
        seg_first = np.zeros((B, K), np.int32)
        seg_last = np.zeros((B, K), np.int32)
        indices = np.zeros((B, K), np.int32)
        seg_mask = np.zeros((B, K), np.float32)
        for r, row in enumerate(rows):
            sp = tp = 0
            for k, i in enumerate(row.segs):
                s = self.ds.src[i][:L]
                t = self.ds.tgt[i][: L - 1]
                ls, lt = len(s), len(t) + 1
                src[r, sp : sp + ls] = s
                src_seg[r, sp : sp + ls] = k
                seg_first[r, k] = sp
                seg_last[r, k] = sp + ls - 1
                tgt_in[r, tp] = BOS
                tgt_in[r, tp + 1 : tp + lt] = t
                tgt_out[r, tp : tp + lt - 1] = t
                tgt_out[r, tp + lt - 1] = EOS
                tgt_seg[r, tp : tp + lt] = k
                indices[r, k] = i
                seg_mask[r, k] = 1.0
                sp += ls
                tp += lt
        return PackedBatch(
            src=src, tgt_in=tgt_in, tgt_out=tgt_out, src_seg=src_seg,
            tgt_seg=tgt_seg, seg_first=seg_first, seg_last=seg_last,
            indices=indices, seg_mask=seg_mask,
            img=self._img_rows(indices, seg_mask),
        )
