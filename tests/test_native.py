"""Native C++ batcher: builds, and produces byte-identical batches to the
pure-Python path."""

import numpy as np
import pytest

from variational_mmt_tpu import native
from variational_mmt_tpu.data.dataset import BucketIterator, binarize


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("g++ unavailable; native batcher not built")


def make_ds(n=40, seed=0):
    rng = np.random.default_rng(seed)
    src = [list(rng.integers(4, 50, size=rng.integers(1, 30))) for _ in range(n)]
    tgt = [list(rng.integers(4, 50, size=rng.integers(1, 30))) for _ in range(n)]
    feats = rng.standard_normal((n, 16)).astype(np.float32)
    return binarize(src, tgt), feats


def test_native_matches_python(have_native):
    ds, feats = make_ds()
    it_py = BucketIterator(ds, 8, [8, 16, 32], img_feats=feats, seed=3, use_native=False)
    it_cc = BucketIterator(ds, 8, [8, 16, 32], img_feats=feats, seed=3, use_native=True)
    batches_py = list(it_py.epoch(1))
    batches_cc = list(it_cc.epoch(1))
    assert len(batches_py) == len(batches_cc)
    for a, b in zip(batches_py, batches_cc):
        np.testing.assert_array_equal(a.src, b.src)
        np.testing.assert_array_equal(a.tgt_in, b.tgt_in)
        np.testing.assert_array_equal(a.tgt_out, b.tgt_out)
        np.testing.assert_array_equal(a.indices, b.indices)
        np.testing.assert_array_equal(a.example_mask, b.example_mask)
        np.testing.assert_allclose(a.img, b.img, rtol=0, atol=0)


def test_native_no_tgt(have_native):
    ds, feats = make_ds()
    ds.tgt = None
    it_cc = BucketIterator(ds, 8, [32], seed=0, use_native=True, shuffle=False)
    b = next(iter(it_cc.epoch(0)))
    assert (b.tgt_in == 0).all() and (b.tgt_out == 0).all()
    assert b.src.shape == (8, 32)


def test_native_conv_features(have_native):
    ds, _ = make_ds(n=10)
    feats = np.random.default_rng(0).standard_normal((10, 7, 16)).astype(np.float32)
    it_py = BucketIterator(ds, 4, [32], img_feats=feats, seed=1, use_native=False)
    it_cc = BucketIterator(ds, 4, [32], img_feats=feats, seed=1, use_native=True)
    for a, b in zip(it_py.epoch(0), it_cc.epoch(0)):
        np.testing.assert_allclose(a.img, b.img)
        assert b.img.shape[1:] == (7, 16)


def test_native_bpe_matches_python(have_native):
    """C++ BPE segmentation is byte-identical to the Python implementation."""
    import random
    from variational_mmt_tpu.data.bpe import BPE, learn_bpe, remove_bpe

    rng = random.Random(0)
    words = ["lower", "lowest", "newer", "wider", "training", "trainer",
             "außergewöhnlich", "straße", "naïve", "mädchen", "日本語"]
    corpus = [[rng.choice(words) for _ in range(8)] for _ in range(200)]
    merges = learn_bpe(corpus, num_merges=80, min_freq=2)
    py = BPE(merges, use_native=False)
    cc = BPE(merges, use_native=True)
    assert cc._native is not None, "native BPE did not load"
    test_words = words + ["unseen", "wördxyz", "a", "", "ab"]
    for w in test_words:
        assert py.segment_word(w) == cc.segment_word(w), w
        if w:
            assert remove_bpe(cc.segment_word(w)) == [w]


def test_native_bpe_speed(have_native):
    """Native segmenter should not be slower than Python (uncached words)."""
    import time
    from variational_mmt_tpu.data.bpe import BPE, learn_bpe

    corpus = [[f"w{i}x{j}" for j in range(20)] for i in range(100)]
    merges = learn_bpe(corpus, num_merges=100, min_freq=1)
    words = [f"w{i}x{j}q" for i in range(200) for j in range(20)]

    py = BPE(merges, use_native=False)
    t0 = time.perf_counter()
    for w in words:
        py._cache.clear() or py.segment_word(w)
    t_py = time.perf_counter() - t0

    cc = BPE(merges, use_native=True)
    t0 = time.perf_counter()
    for w in words:
        cc._cache.clear() or cc.segment_word(w)
    t_cc = time.perf_counter() - t0
    # loose informational bound (wall-clock ratios flake under load):
    # only catch a catastrophic native regression
    assert t_cc < t_py * 3.0, (t_cc, t_py)


def test_native_bpe_hash_leading_merge():
    """A merge whose left symbol IS '#' (hashtag-like words) must not be
    dropped as a comment — native and Python segmentations stay identical."""
    from variational_mmt_tpu import native
    from variational_mmt_tpu.data.bpe import BPE, learn_bpe

    if not native.available():
        import pytest as _pytest
        _pytest.skip("native library unavailable")
    corpus = [["#goal", "#goal", "#go"] for _ in range(30)]
    merges = learn_bpe(corpus, 20)
    assert any(a == "#" for a, _ in merges)  # the scenario is real
    py = BPE(merges, use_native=False)
    nat = native.NativeBPE(merges)
    for w in ("#goal", "#gone", "#go", "plain#tag"):
        assert nat.segment_word(w) == py.segment_word(w), w


def test_bpe_hash_leading_merge_file_roundtrip(tmp_path):
    """BPE.save -> BPE.load must preserve '#'-leading merges (only the
    '#version' header line is a comment) so decode-time -bpe_codes
    segmentation matches preprocess-time in-memory segmentation."""
    from variational_mmt_tpu.data.bpe import BPE, learn_bpe

    corpus = [["#goal", "#goal", "#go"] for _ in range(30)]
    merges = learn_bpe(corpus, 20)
    assert any(a == "#" for a, _ in merges)
    path = str(tmp_path / "codes.bpe")
    BPE(merges, use_native=False).save(path)
    loaded = BPE.load(path)
    assert loaded.merges == merges
    mem = BPE(merges, use_native=False)
    for w in ("#goal", "#gone", "#go", "plain#tag"):
        assert loaded.segment_word(w) == mem.segment_word(w), w


def test_native_bpe_concurrent_segmentation():
    """Per-call buffers: concurrent segment_word calls (the threaded serving
    path) must not corrupt each other."""
    import threading

    from variational_mmt_tpu import native
    from variational_mmt_tpu.data.bpe import learn_bpe

    if not native.available():
        import pytest as _pytest
        _pytest.skip("native library unavailable")
    corpus = [[f"word{i}" for i in range(20)] for _ in range(20)]
    merges = learn_bpe(corpus, 40)
    nb = native.NativeBPE(merges)
    expected = {w: nb.segment_word(w) for w in (f"word{i}" for i in range(20))}
    errors = []

    def worker(seed):
        import numpy as np
        rng = np.random.default_rng(seed)
        for _ in range(300):
            w = f"word{int(rng.integers(20))}"
            if nb.segment_word(w) != expected[w]:
                errors.append(w)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors
