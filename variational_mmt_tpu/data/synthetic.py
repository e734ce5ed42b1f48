"""Synthetic Multi30k-like corpus for tests and benchmarks.

The real Multi30k data cannot ship with the repo (and this build environment
has no network egress), so tests/benches use a deterministic synthetic task
with the same *shape* as the reference's data: parallel "sentences" over a
BPE-sized vocab plus a 2048-d image-feature row per example
(SURVEY.md §4: "100-sentence synthetic corpus + random 2048-d features").

The task is learnable (so training curves/BLEU move): the target is a
token-wise affine remapping of the source with a deterministic local
reordering, and the image feature is a noisy bag-of-words embedding of the
source — so the visual modality genuinely carries information about the
sentence, exercising q(z|x,y,v) and p(v|z) meaningfully.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from variational_mmt_tpu.data.vocab import SPECIALS, Vocab


def make_corpus(
    n: int,
    vocab_size: int = 200,
    min_len: int = 4,
    max_len: int = 20,
    img_dim: int = 2048,
    seed: int = 0,
    img_noise: float = 0.1,
) -> Tuple[List[List[str]], List[List[str]], np.ndarray, Vocab, Vocab]:
    """Returns (src_lines, tgt_lines, img_feats, src_vocab, tgt_vocab)."""
    rng = np.random.default_rng(seed)
    n_words = vocab_size - len(SPECIALS)
    src_words = [f"s{i}" for i in range(n_words)]
    tgt_words = [f"t{i}" for i in range(n_words)]
    # fixed random projection: word id -> img_dim embedding
    word_emb = rng.standard_normal((n_words, img_dim)).astype(np.float32)

    src_lines, tgt_lines, feats = [], [], np.zeros((n, img_dim), np.float32)
    for i in range(n):
        L = int(rng.integers(min_len, max_len + 1))
        ids = rng.integers(0, n_words, size=L)
        # target: affine id remap + swap adjacent pairs (local reordering)
        tids = (ids * 7 + 3) % n_words
        tids = tids.copy()
        for j in range(0, L - 1, 2):
            tids[j], tids[j + 1] = tids[j + 1], tids[j]
        src_lines.append([src_words[k] for k in ids])
        tgt_lines.append([tgt_words[k] for k in tids])
        bow = word_emb[ids].mean(axis=0)
        feats[i] = bow + img_noise * rng.standard_normal(img_dim).astype(np.float32)

    src_vocab = Vocab(SPECIALS + src_words)
    tgt_vocab = Vocab(SPECIALS + tgt_words)
    return src_lines, tgt_lines, feats, src_vocab, tgt_vocab
