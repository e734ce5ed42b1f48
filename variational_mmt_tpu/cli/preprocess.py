"""``preprocess`` CLI — the reference's ``preprocess.py`` equivalent
(SURVEY.md §2.1 #1, §3.1): tokenized (or raw) parallel text -> BPE codes,
vocabs, binarized train/valid datasets.

    python preprocess.py -train_src ... -train_tgt ... -valid_src ... \
        -valid_tgt ... -save_data prefix [-bpe_merges 10000] [...]

Outputs: {save_data}.bpe.codes, {save_data}.vocab.src.json,
{save_data}.vocab.tgt.json, {save_data}.train.npz, {save_data}.valid.npz.
Image features are NOT processed here (reference invariant: they live in
separate HDF5/NPY files aligned to corpus line order).
"""

from __future__ import annotations

import argparse
import os
from typing import List

from variational_mmt_tpu.data.bpe import BPE, learn_bpe
from variational_mmt_tpu.data.dataset import binarize
from variational_mmt_tpu.data.tokenizer import tokenize
from variational_mmt_tpu.data.vocab import Vocab


def add_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-train_src", required=True)
    p.add_argument("-train_tgt", required=True)
    p.add_argument("-valid_src", default="")
    p.add_argument("-valid_tgt", default="")
    p.add_argument("-save_data", required=True)
    p.add_argument("-src_vocab_size", type=int, default=10000)
    p.add_argument("-tgt_vocab_size", type=int, default=10000)
    p.add_argument("-src_words_min_frequency", type=int, default=1)
    p.add_argument("-tgt_words_min_frequency", type=int, default=1)
    p.add_argument("-src_seq_length", type=int, default=64)
    p.add_argument("-tgt_seq_length", type=int, default=64)
    p.add_argument("-bpe_merges", type=int, default=10000)
    p.add_argument("-no_bpe", action="store_true", help="skip BPE (input already segmented)")
    p.add_argument("-pretokenized", action="store_true", help="input is already tokenized; whitespace-split only")
    p.add_argument("-no_lower", action="store_true")
    p.add_argument("-share_vocab", action="store_true")
    p.add_argument("-vocab_pad_multiple", type=int, default=1,
                   help="pad both vocabs with inert filler types to a "
                        "multiple of N (required for train -tensor_parallel "
                        "N: the vocab dim is sharded N ways)")
    p.add_argument("-shard_size", type=int, default=0,
                   help="examples per training shard (0 = one file; the "
                        "reference's multi-.pt-shard datasets)")


def _round8(n: int) -> int:
    return max(8, ((n + 7) // 8) * 8)


def read_corpus(path: str, pretokenized: bool, lower: bool) -> List[List[str]]:
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            if pretokenized:
                line = line.lower() if lower else line
                out.append(line.split())
            else:
                out.append(tokenize(line, lower=lower))
    return out


def main(argv=None) -> None:
    from variational_mmt_tpu.utils.platform import honor_env_platform

    honor_env_platform(needs_jax=False)  # preprocess stays jax-free
    p = argparse.ArgumentParser("vmmt-tpu preprocess")
    add_args(p)
    opt = p.parse_args(argv)
    lower = not opt.no_lower

    print(f"reading {opt.train_src} / {opt.train_tgt}")
    train_src = read_corpus(opt.train_src, opt.pretokenized, lower)
    train_tgt = read_corpus(opt.train_tgt, opt.pretokenized, lower)
    assert len(train_src) == len(train_tgt), "src/tgt line counts differ"

    if opt.bpe_merges <= 0:
        # learning 0 merges would char-split every word — never what a
        # user asking for "no merges" means
        opt.no_bpe = True
    if not opt.no_bpe:
        print(f"learning {opt.bpe_merges} BPE merges (joint)")
        merges = learn_bpe(train_src + train_tgt, opt.bpe_merges)
        bpe = BPE(merges)
        bpe.save(opt.save_data + ".bpe.codes")
        train_src = [bpe.segment(t) for t in train_src]
        train_tgt = [bpe.segment(t) for t in train_tgt]
    else:
        bpe = None

    print("building vocabularies")
    if opt.share_vocab:
        # the joint vocab honors the LARGER of the two budgets (ignoring an
        # explicitly raised -tgt_vocab_size here would silently cap it)
        sv = tv = Vocab.build(
            train_src + train_tgt,
            max_size=max(opt.src_vocab_size, opt.tgt_vocab_size),
            min_freq=min(opt.src_words_min_frequency, opt.tgt_words_min_frequency),
        )
    else:
        sv = Vocab.build(train_src, max_size=opt.src_vocab_size, min_freq=opt.src_words_min_frequency)
        tv = Vocab.build(train_tgt, max_size=opt.tgt_vocab_size, min_freq=opt.tgt_words_min_frequency)
    if opt.vocab_pad_multiple > 1:
        sv.pad_to_multiple(opt.vocab_pad_multiple)
        if tv is not sv:
            tv.pad_to_multiple(opt.vocab_pad_multiple)
    sv.save(opt.save_data + ".vocab.src.json")
    tv.save(opt.save_data + ".vocab.tgt.json")
    print(f"src vocab {len(sv)}; tgt vocab {len(tv)}")

    ds = binarize(
        [sv.encode(t) for t in train_src],
        [tv.encode(t) for t in train_tgt],
        max_src_len=opt.src_seq_length,
        max_tgt_len=opt.tgt_seq_length,
    )
    from variational_mmt_tpu.data.dataset import BinarizedDataset

    # a re-run must not leave the previous run's layout behind: a stale
    # single file would shadow fresh shards (BinarizedDataset.load prefers
    # it), and a re-run with a larger -shard_size rewrites fewer shards, so
    # stale higher-index ones would be concatenated back in — duplicating
    # examples and breaking the example-index == corpus-line invariant the
    # image-feature alignment relies on. Remove BOTH layouts before writing.
    single = opt.save_data + ".train.npz"
    stale_paths = list(BinarizedDataset.shard_paths(single))
    if opt.shard_size > 0 and os.path.exists(single):
        stale_paths.append(single)
    for stale in stale_paths:
        print(f"removing stale {stale} (re-run)")
        os.remove(stale)
    if opt.shard_size > 0:
        n_shards = (len(ds) + opt.shard_size - 1) // opt.shard_size
        for si in range(n_shards):
            lo, hi = si * opt.shard_size, min((si + 1) * opt.shard_size, len(ds))
            shard = BinarizedDataset(ds.src[lo:hi],
                                     ds.tgt[lo:hi] if ds.tgt is not None else None)
            shard.save(f"{opt.save_data}.train.{si:02d}.npz")
        print(f"train: {len(ds)} examples -> {n_shards} shards "
              f"({opt.save_data}.train.00.npz ...)")
    else:
        ds.save(single)
        print(f"train: {len(ds)} examples -> {single}")

    # suggest bucket boundaries from the post-BPE length distribution
    # (each bucket shape costs one train-step compilation; percentile
    # boundaries keep padding waste low with few shapes)
    lens = sorted(max(len(s), len(t) + 1) for s, t in zip(ds.src, ds.tgt))
    if lens:
        def pct(p):
            return lens[min(len(lens) - 1, int(p * len(lens)))]

        cand = sorted({_round8(pct(p)) for p in (0.25, 0.5, 0.75, 0.9, 1.0)})
        print(f"suggested -buckets {','.join(str(b) for b in cand)} "
              f"(len p50={pct(0.5)}, p90={pct(0.9)}, max={lens[-1]})")

    if opt.valid_src:
        valid_src = read_corpus(opt.valid_src, opt.pretokenized, lower)
        valid_tgt = read_corpus(opt.valid_tgt, opt.pretokenized, lower)
        if bpe is not None:
            valid_src = [bpe.segment(t) for t in valid_src]
            valid_tgt = [bpe.segment(t) for t in valid_tgt]
        vds = binarize(
            [sv.encode(t) for t in valid_src],
            [tv.encode(t) for t in valid_tgt],
            max_src_len=opt.src_seq_length,
            max_tgt_len=opt.tgt_seq_length,
        )
        vds.save(opt.save_data + ".valid.npz")
        print(f"valid: {len(vds)} examples -> {opt.save_data}.valid.npz")


if __name__ == "__main__":
    main()
