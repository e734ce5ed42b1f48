#!/usr/bin/env python
"""Convert GloVe/word2vec text embeddings to a vocab-aligned ``.npy`` table
(the reference's ``tools/embeddings_to_torch.py`` equivalent, SURVEY.md
§2.1 #4): offline conversion so training loads one dense array.

    python tools/embeddings_to_npy.py -emb_file glove.txt \
        -vocab demo.vocab.src.json -output src_emb.npy [-emb_dim 300]

Rows for vocab tokens missing from the embedding file are small
random-normal (seeded, matching the model's init scale) so partial coverage
still trains; coverage is reported.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from variational_mmt_tpu.data.embeddings import align_to_vocab, read_text_embeddings
from variational_mmt_tpu.data.vocab import Vocab


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-emb_file", required=True, help="GloVe/word2vec text file")
    p.add_argument("-vocab", required=True, help="vocab JSON from preprocess")
    p.add_argument("-output", required=True, help="output .npy path")
    p.add_argument("-emb_dim", type=int, default=0,
                   help="expected dim (0 = infer from the file)")
    p.add_argument("-seed", type=int, default=0)
    args = p.parse_args(argv)

    vocab = Vocab.load(args.vocab)
    vecs = read_text_embeddings(args.emb_file)
    table, matched = align_to_vocab(
        vecs, vocab.itos, emb_dim=args.emb_dim or None, seed=args.seed
    )
    np.save(args.output, table)
    print(f"matched {matched}/{len(vocab.itos)} vocab tokens "
          f"({100.0 * matched / max(len(vocab.itos), 1):.1f}%); "
          f"wrote {table.shape} -> {args.output}")


if __name__ == "__main__":
    main()
