"""MBR consensus decode (decode/mbr.py) + the runtime-seed plumbing it
relies on (Translator.translate_ids(seed=...) reuses one compiled program)."""

import numpy as np
import pytest

from variational_mmt_tpu.config import Config, DecodeConfig, ModelConfig, TrainConfig
from variational_mmt_tpu.data.vocab import SPECIALS, Vocab
from variational_mmt_tpu.decode.mbr import mbr_select, mbr_translate_ids
from variational_mmt_tpu.decode.translator import Translator
from variational_mmt_tpu.evals.bleu import sentence_bleu
from variational_mmt_tpu.models.model import build_model
from variational_mmt_tpu.train.trainer import create_train_state


def setup(model_type="nmt", **dec):
    cfg = Config(
        model=ModelConfig(
            model_type=model_type, src_vocab_size=24, tgt_vocab_size=24,
            emb_dim=16, hidden_dim=32, enc_layers=1, dec_layers=2,
            latent_dim=4, img_feat_dim=8, dropout=0.0,
            compute_dtype="float32",
        ),
        train=TrainConfig(seed=7),
        decode=DecodeConfig(**{"beam_size": 1, "max_length": 12,
                               "batch_size": 4, **dec}),
    )
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    vocab = Vocab(SPECIALS + [f"w{i}" for i in range(20)])
    return cfg, model, state, vocab


SRC = [[5, 6, 7], [8, 9], [10, 11, 12], [13], [14, 15], [16, 17, 18]]


# ---------- sentence_bleu ----------

def test_sentence_bleu_identity_and_disjoint():
    assert sentence_bleu([1, 2, 3, 4, 5], [1, 2, 3, 4, 5]) == pytest.approx(100.0)
    assert sentence_bleu([1, 2, 3], [7, 8, 9]) == 0.0
    assert sentence_bleu([], [1, 2]) == 0.0


def test_sentence_bleu_orders_by_overlap():
    ref = [1, 2, 3, 4, 5, 6]
    close = sentence_bleu([1, 2, 3, 4, 5, 9], ref)
    far = sentence_bleu([1, 9, 3, 8, 5, 7], ref)
    assert 0.0 < far < close < 100.0


def test_sentence_bleu_brevity_penalty():
    ref = [1, 2, 3, 4, 5, 6, 7, 8]
    short = sentence_bleu([1, 2, 3, 4], ref)
    full = sentence_bleu(list(ref), ref)
    assert short < full
    # the short prefix's precisions are perfect: only BP separates them
    assert short == pytest.approx(full * np.exp(1 - 8 / 4))


# ---------- mbr_select ----------

def test_mbr_select_majority():
    a, b = [1, 2, 3, 4], [9, 8, 7]
    best, utils = mbr_select([a, a, b])
    assert best == 0
    assert utils[0] == utils[1] > utils[2]


def test_mbr_select_tie_breaks_by_model_score():
    a, b = [1, 2, 3], [7, 8, 9]
    # disjoint singletons: both have utility (100 + 0)/2 — a symmetric tie
    best, utils = mbr_select([a, b], scores=[-5.0, -1.0])
    assert utils[0] == pytest.approx(utils[1])
    assert best == 1
    best, _ = mbr_select([a, b], scores=[-1.0, -5.0])
    assert best == 0


def test_mbr_select_empty_rejected():
    with pytest.raises(ValueError, match="empty"):
        mbr_select([])


# ---------- runtime seed plumbing ----------

def test_seed_override_matches_config_seed():
    cfg, model, state, vocab = setup(sampling_temp=1.0)
    tr7 = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    cfg.decode.decode_seed = 99
    tr99 = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    assert ([nb[0] for nb in tr7.translate_ids(SRC, seed=99)]
            == [nb[0] for nb in tr99.translate_ids(SRC)])


def test_seed_change_does_not_recompile():
    cfg, model, state, vocab = setup(sampling_temp=1.0)
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    tr.translate_ids(SRC)
    n0 = tr._fn._cache_size()
    for s in (5, 6, 7):
        tr.translate_ids(SRC, seed=s)
    assert tr._fn._cache_size() == n0


# ---------- mbr_translate_ids ----------

def test_mbr_deterministic_and_choices_come_from_samples():
    cfg, model, state, vocab = setup(sampling_temp=1.5)
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    out1 = mbr_translate_ids(tr, SRC, n_samples=5)
    out2 = mbr_translate_ids(tr, SRC, n_samples=5)
    assert out1 == out2
    # every chosen hypothesis must be one of that sentence's own samples
    from variational_mmt_tpu.decode.mbr import SEED_STRIDE
    sample_sets = [set() for _ in SRC]
    for k in range(5):
        for i, nb in enumerate(tr.translate_ids(
                SRC, seed=cfg.decode.decode_seed + k * SEED_STRIDE)):
            sample_sets[i].add(tuple(nb[0][1]))
    for i, nb in enumerate(out1):
        assert tuple(nb[0][1]) in sample_sets[i]


def test_mbr_topk1_collapses_to_greedy():
    """topk=1 makes every sample the argmax path: MBR == greedy decode."""
    cfg, model, state, vocab = setup()
    greedy = [nb[0] for nb in Translator(
        model, state.params, vocab, vocab, cfg.decode,
        buckets=[8]).translate_ids(SRC)]
    cfg.decode.sampling_temp = 1.0
    cfg.decode.sampling_topk = 1
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    out = mbr_translate_ids(tr, SRC, n_samples=3)
    assert [ids for _, ids in (nb[0] for nb in out)] \
        == [ids for _, ids in greedy]


def test_mbr_requires_sampling_translator():
    cfg, model, state, vocab = setup()
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    with pytest.raises(ValueError, match="sampling_temp"):
        mbr_translate_ids(tr, SRC, n_samples=3)
    cfg.decode.sampling_temp = 1.0
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    with pytest.raises(ValueError, match="n_samples"):
        mbr_translate_ids(tr, SRC, n_samples=0)


def test_mbr_with_latent_sampling():
    """MBR integrates over BOTH streams: token sampling and z ~ p(z|x,v)."""
    cfg, model, state, vocab = setup("vmmt_c", sampling_temp=1.0,
                                     latent_from="sample")
    feats = np.random.default_rng(0).standard_normal(
        (len(SRC), 8)).astype(np.float32)
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    out1 = mbr_translate_ids(tr, SRC, feats, n_samples=4)
    out2 = mbr_translate_ids(tr, SRC, feats, n_samples=4)
    assert out1 == out2 and len(out1) == len(SRC)
