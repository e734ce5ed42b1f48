"""Pretrained word-embedding loading (reference ``-pre_word_vecs_enc/dec``
flags + ``tools/embeddings_to_torch.py``, SURVEY.md §2.1 #4/#7: upstream
OpenNMT-py loads GloVe/word2vec text embeddings into the encoder/decoder
``Embeddings`` tables and can freeze them with ``-fix_word_vecs_*``).

TPU-first shape: the conversion happens OFFLINE (text -> vocab-aligned
``.npy``, see ``tools/embeddings_to_npy.py``) so training only ever loads a
dense array; freezing is a static grad mask in the jitted train step, not a
``requires_grad`` flag.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def read_text_embeddings(path: str) -> Dict[str, np.ndarray]:
    """Parse GloVe / word2vec text format into {token: vector}.

    Auto-detects the word2vec count/dim header line. Malformed lines (wrong
    field count, e.g. tokens containing spaces) are skipped, matching the
    tolerant behavior of the reference converter.
    """
    vecs: Dict[str, np.ndarray] = {}
    dim = None
    with open(path, encoding="utf-8", errors="replace") as f:
        first = f.readline().rstrip("\n")
        parts = first.split(" ")
        if len(parts) == 2 and parts[0].isdigit() and parts[1].isdigit():
            dim = int(parts[1])  # word2vec header: "<count> <dim>"
        elif len(parts) >= 2:
            try:
                v = np.asarray([float(x) for x in parts[1:]], np.float32)
                vecs[parts[0]] = v
                dim = len(v)
            except ValueError:
                pass
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if dim is not None and len(parts) != dim + 1:
                continue
            try:
                v = np.asarray([float(x) for x in parts[1:]], np.float32)
            except ValueError:
                continue
            if dim is None:
                dim = len(v)
            if len(v) == dim:
                vecs[parts[0]] = v
    return vecs


def align_to_vocab(
    vecs: Dict[str, np.ndarray],
    itos,
    emb_dim: Optional[int] = None,
    seed: int = 0,
    init_scale: float = 0.1,
) -> Tuple[np.ndarray, int]:
    """Build a (V, D) table aligned to vocab row order.

    Rows for tokens absent from ``vecs`` are small random-normal (seeded) so
    a partially-covered vocab still trains; returns (table, n_matched).
    """
    if not vecs and emb_dim is None:
        raise ValueError("no embeddings parsed and no emb_dim given")
    dim = emb_dim or len(next(iter(vecs.values())))
    rng = np.random.default_rng(seed)
    table = (init_scale * rng.standard_normal((len(itos), dim))).astype(np.float32)
    matched = 0
    for i, tok in enumerate(itos):
        v = vecs.get(tok)
        if v is not None and len(v) == dim:
            table[i] = v
            matched += 1
    return table, matched


def apply_pretrained(params, enc: Optional[np.ndarray] = None,
                     dec: Optional[np.ndarray] = None):
    """Return a params pytree with src/tgt embedding tables replaced.

    Shapes must match the initialized tables exactly — a mismatch means the
    ``.npy`` was built against a different vocab or emb_dim, which would
    silently destroy alignment, so it is an error.
    """
    params = dict(params)
    for name, table in (("src_embed", enc), ("tgt_embed", dec)):
        if table is None:
            continue
        if name not in params:
            raise ValueError(
                f"model has no '{name}' table (share_embeddings ties both "
                "sides to 'tgt_embed' — load via -pre_word_vecs_dec)"
            )
        cur = params[name]["embedding"]
        if tuple(table.shape) != tuple(cur.shape):
            raise ValueError(
                f"{name}: pretrained table {table.shape} != model {tuple(cur.shape)} "
                "(rebuild the .npy against this run's vocab/emb_dim)"
            )
        params[name] = {"embedding": np.asarray(table, np.float32)}
    return params
