"""Byte-pair encoding: learn + apply, subword-nmt-compatible segmentation.

The reference's data is BPE'd offline with subword-nmt (~10k joint merges,
SURVEY.md §2.4). This is a from-scratch implementation of the same algorithm
(Sennrich et al. 2016): greedy merges of the most frequent symbol pair over a
word-frequency dictionary, applied with end-of-word marker ``</w>`` and
``@@ ``-style continuation output so BPE'd text round-trips with standard
``sed 's/@@ //g'`` post-processing.
"""

from __future__ import annotations

import collections
from typing import Dict, Iterable, List, Sequence, Tuple

EOW = "</w>"
SEP = "@@"


def learn_bpe(lines: Iterable[Sequence[str]], num_merges: int, min_freq: int = 2) -> List[Tuple[str, str]]:
    """Learn merge operations from tokenized lines."""
    word_freq: Dict[Tuple[str, ...], int] = collections.Counter()
    for toks in lines:
        for w in toks:
            word_freq[tuple(w[:-1]) + (w[-1] + EOW,)] += 1

    pair_freq: Dict[Tuple[str, str], int] = collections.Counter()
    pair_words: Dict[Tuple[str, str], set] = collections.defaultdict(set)
    words = list(word_freq.items())
    for wi, (word, freq) in enumerate(words):
        for a, b in zip(word, word[1:]):
            pair_freq[(a, b)] += freq
            pair_words[(a, b)].add(wi)

    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_freq:
            break
        best = max(pair_freq.items(), key=lambda kv: (kv[1], kv[0]))
        pair, freq = best
        if freq < min_freq:
            break
        merges.append(pair)
        new_sym = pair[0] + pair[1]
        # re-segment only words containing the pair, update counts in place
        for wi in list(pair_words[pair]):
            word, wfreq = words[wi]
            merged = _merge_word(word, pair, new_sym)
            if merged == word:
                continue
            for a, b in zip(word, word[1:]):
                pair_freq[(a, b)] -= wfreq
                if pair_freq[(a, b)] <= 0:
                    del pair_freq[(a, b)]
                pair_words[(a, b)].discard(wi)
            for a, b in zip(merged, merged[1:]):
                pair_freq[(a, b)] += wfreq
                pair_words[(a, b)].add(wi)
            words[wi] = (merged, wfreq)
        pair_freq.pop(pair, None)
        pair_words.pop(pair, None)
    return merges


def _merge_word(word: Tuple[str, ...], pair: Tuple[str, str], new_sym: str) -> Tuple[str, ...]:
    out: List[str] = []
    i = 0
    while i < len(word):
        if i < len(word) - 1 and word[i] == pair[0] and word[i + 1] == pair[1]:
            out.append(new_sym)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


class BPE:
    """Apply learned merges to tokenized text. Uses the C++ segmenter
    (native/bpe.cpp, byte-identical) when the native library is available;
    falls back to the pure-Python loop."""

    def __init__(self, merges: Sequence[Tuple[str, str]], use_native: bool = True):
        self.merges = list(merges)
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self._cache: Dict[str, List[str]] = {}
        self._native = None
        if use_native:
            try:
                from variational_mmt_tpu import native

                if native.available():
                    self._native = native.NativeBPE(self.merges)
            except Exception:
                self._native = None

    def segment_word(self, word: str) -> List[str]:
        if not word:
            return []
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        if self._native is not None:
            out = self._native.segment_word(word)
            self._cache[word] = out
            return out
        symbols = list(word[:-1]) + [word[-1] + EOW]
        while len(symbols) > 1:
            ranked = [
                (self.ranks.get((a, b), 1 << 60), i)
                for i, (a, b) in enumerate(zip(symbols, symbols[1:]))
            ]
            rank, idx = min(ranked)
            if rank >= 1 << 60:
                break
            symbols = symbols[:idx] + [symbols[idx] + symbols[idx + 1]] + symbols[idx + 2 :]
        # strip EOW; mark non-final pieces with @@
        out: List[str] = []
        for i, s in enumerate(symbols):
            if s.endswith(EOW):
                s = s[: -len(EOW)]
                if s:
                    out.append(s)
            else:
                out.append(s + SEP)
        self._cache[word] = out
        return out

    def segment(self, tokens: Sequence[str]) -> List[str]:
        out: List[str] = []
        for t in tokens:
            out.extend(self.segment_word(t))
        return out

    # -- persistence -------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            f.write("#version: vmmt-tpu bpe\n")
            for a, b in self.merges:
                f.write(f"{a} {b}\n")

    @classmethod
    def load(cls, path: str) -> "BPE":
        merges: List[Tuple[str, str]] = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                # skip only the version header: a learned merge may itself
                # start with '#' (pretokenized hashtag-like words) and must
                # survive the save/load round trip (matches native bpe.cpp)
                if line.startswith("#version"):
                    continue
                parts = line.rstrip("\n").split(" ")
                if len(parts) == 2:
                    merges.append((parts[0], parts[1]))
        return cls(merges)


def remove_bpe(tokens: Sequence[str]) -> List[str]:
    """Undo @@-segmentation (the `sed 's/@@ //g'` of the reference eval)."""
    out: List[str] = []
    buf = ""
    for t in tokens:
        if t.endswith(SEP):
            buf += t[: -len(SEP)]
        else:
            out.append(buf + t)
            buf = ""
    if buf:
        out.append(buf)
    return out
