"""Data layer: tokenizer, BPE, vocab, bucketing, feature alignment."""

import numpy as np
import pytest

from variational_mmt_tpu.data import bpe as bpe_mod
from variational_mmt_tpu.data import synthetic
from variational_mmt_tpu.data.dataset import BinarizedDataset, BucketIterator, binarize
from variational_mmt_tpu.data.tokenizer import detokenize, tokenize
from variational_mmt_tpu.data.vocab import BOS, EOS, PAD, UNK, Vocab


def test_tokenize_basic():
    assert tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert tokenize("A man's dog.") == ["a", "man", "'s", "dog", "."]
    assert tokenize("  ") == []
    # decimals survive
    assert "3.14" in tokenize("pi is 3.14 ok")


def test_detokenize_roundtrip_shape():
    toks = ["a", "man", ",", "smiling", "."]
    assert detokenize(toks) == "a man, smiling."


def test_bpe_learn_apply_roundtrip():
    corpus = [["low", "lower", "lowest", "newer", "wider"] for _ in range(50)]
    merges = bpe_mod.learn_bpe(corpus, num_merges=50, min_freq=2)
    assert merges, "should learn at least one merge"
    bpe = bpe_mod.BPE(merges)
    seg = bpe.segment(["lowest", "newer"])
    # @@-continuation round-trips
    assert bpe_mod.remove_bpe(seg) == ["lowest", "newer"]
    # frequent whole words end up as few segments
    assert len(bpe.segment_word("lower")) <= 3


def test_bpe_save_load(tmp_path):
    merges = bpe_mod.learn_bpe([["aaab", "aaac"]] * 10, num_merges=10, min_freq=2)
    bpe = bpe_mod.BPE(merges)
    p = str(tmp_path / "codes.bpe")
    bpe.save(p)
    bpe2 = bpe_mod.BPE.load(p)
    assert bpe2.merges == bpe.merges
    assert bpe2.segment_word("aaab") == bpe.segment_word("aaab")


def test_vocab_specials_and_coverage():
    v = Vocab.build([["a", "b", "a"], ["c", "a"]])
    assert v.stoi["<blank>"] == PAD and v.stoi["<unk>"] == UNK
    assert v.stoi["<s>"] == BOS and v.stoi["</s>"] == EOS
    assert v.encode(["a", "zzz"]) == [v.stoi["a"], UNK]
    ids = v.encode(["a", "b"], bos=True, eos=True)
    assert ids[0] == BOS and ids[-1] == EOS
    assert v.decode(ids) == ["a", "b"]


def test_vocab_max_size_and_save(tmp_path):
    lines = [[f"w{i}" for i in range(20)]] * 3
    v = Vocab.build(lines, max_size=5)
    assert len(v) == 9  # 4 specials + 5
    p = str(tmp_path / "vocab.json")
    v.save(p)
    assert Vocab.load(p).itos == v.itos


def test_binarize_save_load(tmp_path):
    ds = binarize([[5, 6, 7], [8]], [[9], [10, 11]])
    p = str(tmp_path / "data.npz")
    ds.save(p)
    ds2 = BinarizedDataset.load(p)
    assert len(ds2) == 2
    np.testing.assert_array_equal(ds2.src[0], [5, 6, 7])
    np.testing.assert_array_equal(ds2.tgt[1], [10, 11])


def test_bucket_iterator_static_shapes_and_alignment():
    rng = np.random.default_rng(0)
    n = 57
    src = [list(rng.integers(4, 50, size=rng.integers(2, 30))) for _ in range(n)]
    tgt = [list(rng.integers(4, 50, size=rng.integers(2, 30))) for _ in range(n)]
    feats = np.arange(n, dtype=np.float32)[:, None] * np.ones((n, 8), np.float32)
    ds = binarize(src, tgt)
    it = BucketIterator(ds, batch_size=8, buckets=[8, 16, 32], img_feats=feats, seed=1)

    seen = set()
    for batch in it.epoch(0):
        assert batch.src.shape[0] == 8 and batch.src.shape[1] in (8, 16, 32)
        assert batch.tgt_in.shape == batch.src.shape == batch.tgt_out.shape
        for row in range(8):
            if batch.example_mask[row] == 0:
                assert (batch.src[row] == PAD).all()
                continue
            i = int(batch.indices[row])
            seen.add(i)
            # image row gathered by original index (the §3.1 invariant)
            assert batch.img[row, 0] == float(i)
            # tgt_in = BOS + tgt; tgt_out = tgt + EOS
            assert batch.tgt_in[row, 0] == BOS
            tl = min(len(tgt[i]), batch.src.shape[1] - 1)
            assert batch.tgt_out[row, tl] == EOS
            np.testing.assert_array_equal(batch.tgt_in[row, 1 : 1 + tl], batch.tgt_out[row, :tl])
    assert seen == set(range(n))  # every example exactly once per epoch


def test_bucket_iterator_deterministic_given_seed():
    src = [[4, 5]] * 20
    ds = binarize(src, src)
    it = BucketIterator(ds, batch_size=4, buckets=[8], seed=7)
    a = [b.indices.copy() for b in it.epoch(3)]
    b = [b.indices.copy() for b in it.epoch(3)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_synthetic_corpus():
    src, tgt, feats, sv, tv = synthetic.make_corpus(50, vocab_size=40, img_dim=16, seed=3)
    assert len(src) == len(tgt) == 50 and feats.shape == (50, 16)
    # same source token always maps through the same target token (learnable)
    assert len(sv) == len(tv) == 40
    ids = sv.encode(src[0])
    assert UNK not in ids


def test_stochastic_corpus():
    """make_stochastic_corpus (round-4 IW study): the image SHIFTS the
    sense distribution without determining it, and the analytic NLL floors
    match the construction."""
    src, tgt, feats, sv, tv, c_img, c_real, amb = \
        synthetic.make_stochastic_corpus(
            400, vocab_size=40, n_senses=4, sense_flip=0.25, img_dim=16,
            seed=7)
    assert len(src) == len(tgt) == 400 and feats.shape == (400, 16)
    # flip rate realized near its nominal value -> genuinely stochastic
    agree = float((c_img == c_real).mean())
    assert 0.65 < agree < 0.85, agree
    # the realized target matches the ideal hypothesis for c_real
    hyp = synthetic.ideal_hypotheses(src[:20], c_real[:20], amb, 40)
    assert hyp == tgt[:20]
    # ...and differs from c_img's hypothesis exactly when flipped (given
    # the sentence contains an ambiguous type)
    hyp_img = synthetic.ideal_hypotheses(src[:400], c_img[:400], amb, 40)
    for i in range(400):
        has_amb = any(amb[int(t[1:])] for t in src[i])
        if c_img[i] == c_real[i] or not has_amb:
            assert hyp_img[i] == tgt[i]
        else:
            assert hyp_img[i] != tgt[i]
    tf, imf = synthetic.stochastic_nll_floors(src, amb, 4, 0.25, 40)
    assert 0 < imf < tf <= np.log(4) + 1e-9
    # flip=0 would make the image floor 0 (conditionally deterministic)
    _, imf0 = synthetic.stochastic_nll_floors(src, amb, 4, 1e-12, 40)
    assert imf0 < 1e-9


def test_features_roundtrip(tmp_path):
    from variational_mmt_tpu.data.features import load_features, save_features

    feats = np.random.default_rng(0).standard_normal((10, 32)).astype(np.float32)
    for name in ("f.npy", "f.h5"):
        p = str(tmp_path / name)
        save_features(p, feats)
        out = load_features(p)
        np.testing.assert_allclose(out, feats, rtol=1e-6)


def test_features_conv_reshape(tmp_path):
    from variational_mmt_tpu.data.features import load_features, save_features

    conv = np.random.default_rng(0).standard_normal((4, 7, 7, 12)).astype(np.float32)
    p = str(tmp_path / "conv.npy")
    np.save(p, conv)
    out = load_features(p)
    assert out.shape == (4, 49, 12)


def test_sharded_dataset_roundtrip(tmp_path):
    """preprocess -shard_size: shards load back IDENTICAL to the single
    file, in index order (the image-feature alignment invariant)."""
    import numpy as np

    from variational_mmt_tpu.data.dataset import BinarizedDataset, binarize

    rng = np.random.default_rng(0)
    src = [rng.integers(4, 50, rng.integers(2, 9)).tolist() for _ in range(25)]
    tgt = [rng.integers(4, 50, rng.integers(2, 9)).tolist() for _ in range(25)]
    ds = binarize(src, tgt)
    ds.save(str(tmp_path / "one.npz"))
    for si in range(3):
        lo, hi = si * 10, min((si + 1) * 10, len(ds))
        BinarizedDataset(ds.src[lo:hi], ds.tgt[lo:hi]).save(
            str(tmp_path / f"many.train.{si:02d}.npz"))

    a = BinarizedDataset.load(str(tmp_path / "one.npz"))
    b = BinarizedDataset.load(str(tmp_path / "many.train.npz"))  # glob form
    assert len(a) == len(b) == 25
    for x, y in zip(a.src + a.tgt, b.src + b.tgt):
        np.testing.assert_array_equal(x, y)
    assert BinarizedDataset.exists(str(tmp_path / "many.train.npz"))
    assert not BinarizedDataset.exists(str(tmp_path / "nope.npz"))
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        BinarizedDataset.load(str(tmp_path / "nope.npz"))


def test_bpe_segment_removebpe_fuzz_roundtrip():
    """Property: remove_bpe(segment(tokens)) == tokens for ANY tokens over
    the learned alphabet (500 random sentences)."""
    import numpy as np

    from variational_mmt_tpu.data.bpe import BPE, learn_bpe, remove_bpe

    rng = np.random.default_rng(7)
    alphabet = list("abcdefgh")
    corpus = [["".join(rng.choice(alphabet, rng.integers(1, 9)))
               for _ in range(rng.integers(1, 12))] for _ in range(200)]
    bpe = BPE(learn_bpe(corpus, 50))
    for _ in range(500):
        toks = ["".join(rng.choice(alphabet, rng.integers(1, 10)))
                for _ in range(rng.integers(1, 10))]
        assert remove_bpe(bpe.segment(toks)) == toks


def test_tokenizer_fuzz_invariants():
    """Properties over random printable text: no empty tokens, no internal
    whitespace in tokens, idempotence (tokenizing the joined tokens changes
    nothing), and detokenize never crashes."""
    import numpy as np

    from variational_mmt_tpu.data.tokenizer import detokenize, tokenize

    rng = np.random.default_rng(9)
    chars = list("abcXYZ0123 .,;:!?()[]'\"-/&%$#") + ["ä", "ß", "é", "«"]
    for _ in range(300):
        s = "".join(rng.choice(chars, rng.integers(0, 60)))
        toks = tokenize(s)
        assert all(t and " " not in t for t in toks)
        assert tokenize(" ".join(toks)) == toks  # idempotent
        detokenize(toks)


def test_shard_paths_numeric_order(tmp_path):
    """'.100.npz' must follow '.99.npz' (lexicographic sorting would place
    it between '.10' and '.11', scrambling the corpus-line invariant)."""
    import numpy as np

    from variational_mmt_tpu.data.dataset import BinarizedDataset, binarize

    idx = [9, 10, 11, 100, 101]
    for si in idx:
        BinarizedDataset([np.asarray([si], np.int32)], [np.asarray([si], np.int32)]).save(
            str(tmp_path / f"d.train.{si}.npz"))
    paths = BinarizedDataset.shard_paths(str(tmp_path / "d.train.npz"))
    got = [int(p.rsplit(".", 2)[1]) for p in paths]
    assert got == sorted(idx)
    ds = BinarizedDataset.load(str(tmp_path / "d.train.npz"))
    assert [int(s[0]) for s in ds.src] == sorted(idx)


def test_load_features_strict_split(tmp_path):
    import numpy as np
    import pytest as _pytest

    from variational_mmt_tpu.data.features import load_features

    p = str(tmp_path / "f.npz")
    np.savez(p, train=np.ones((3, 4), np.float32))
    np.testing.assert_allclose(load_features(p, split="train"), 1.0)
    with _pytest.raises(KeyError, match="valid"):
        load_features(p, split="valid")  # must NOT silently return 'train'


def test_prefetch_releases_producer_on_abandoned_consumer():
    import threading
    import time

    from variational_mmt_tpu.data.prefetch import prefetch

    consumed = []

    def gen():
        for i in range(1000):
            yield i

    before = {t.name for t in threading.enumerate()}
    g = prefetch(gen(), size=2, transform=lambda x: x)
    for i, x in enumerate(g):
        consumed.append(x)
        if i == 2:
            break
    g.close()  # abandoning the generator must release the producer thread
    deadline = time.time() + 5
    while time.time() < deadline:
        extra = {t.name for t in threading.enumerate()} - before
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"leaked threads: {extra}"


def test_npy_features_reject_split(tmp_path):
    """A bare .npy cannot honor a split request — raising protects the same
    row<->line alignment invariant as the HDF5/npz branches."""
    import pytest

    from variational_mmt_tpu.data.features import load_features

    p = str(tmp_path / "f.npy")
    np.save(p, np.zeros((3, 4), np.float32))
    assert load_features(p).shape == (3, 4)
    with pytest.raises(ValueError, match="split"):
        load_features(p, split="valid")
