"""Sampling decode: token-level ancestral sampling (-sampling_temp/topk/topp,
the reference lineage's -random_sampling_topk family) and decode-time latent
sampling (-latent_from sample, the generative read of the paper's z)."""

import numpy as np
import pytest

from variational_mmt_tpu.config import Config, DecodeConfig, ModelConfig, TrainConfig
from variational_mmt_tpu.data.vocab import SPECIALS, Vocab
from variational_mmt_tpu.decode.score import score_corpus
from variational_mmt_tpu.decode.translator import Translator
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


def decode_ids(tr, src=SRC, feats=None):
    return [nbest[0] for nbest in tr.translate_ids(src, feats)]


def test_topk1_equals_greedy():
    """topk=1 sampling collapses to argmax = the greedy search."""
    cfg, model, state, vocab = setup()
    greedy = decode_ids(Translator(model, state.params, vocab, vocab,
                                   cfg.decode, buckets=[8]))
    cfg.decode.sampling_temp = 1.0
    cfg.decode.sampling_topk = 1
    sampled = decode_ids(Translator(model, state.params, vocab, vocab,
                                    cfg.decode, buckets=[8]))
    assert [ids for _, ids in sampled] == [ids for _, ids in greedy]
    for (ss, _), (gs, _) in zip(sampled, greedy):
        assert ss == pytest.approx(gs, abs=1e-5)


def test_tiny_topp_equals_greedy():
    """topp -> 0 keeps only the argmax (the nucleus always contains it)."""
    cfg, model, state, vocab = setup()
    greedy = decode_ids(Translator(model, state.params, vocab, vocab,
                                   cfg.decode, buckets=[8]))
    cfg.decode.sampling_temp = 1.0
    cfg.decode.sampling_topp = 1e-9
    sampled = decode_ids(Translator(model, state.params, vocab, vocab,
                                    cfg.decode, buckets=[8]))
    assert [ids for _, ids in sampled] == [ids for _, ids in greedy]


def test_low_temperature_equals_greedy():
    """T -> 0 makes the tempered distribution a point mass on the argmax."""
    cfg, model, state, vocab = setup()
    greedy = decode_ids(Translator(model, state.params, vocab, vocab,
                                   cfg.decode, buckets=[8]))
    cfg.decode.sampling_temp = 1e-4
    sampled = decode_ids(Translator(model, state.params, vocab, vocab,
                                    cfg.decode, buckets=[8]))
    assert [ids for _, ids in sampled] == [ids for _, ids in greedy]


def test_sampling_deterministic_and_seed_sensitive():
    cfg, model, state, vocab = setup(sampling_temp=2.0)
    a = decode_ids(Translator(model, state.params, vocab, vocab,
                              cfg.decode, buckets=[8]))
    b = decode_ids(Translator(model, state.params, vocab, vocab,
                              cfg.decode, buckets=[8]))
    assert a == b
    cfg.decode.decode_seed = 999
    c = decode_ids(Translator(model, state.params, vocab, vocab,
                              cfg.decode, buckets=[8]))
    # 6 sentences x up to 12 tempered draws over 24 tokens: a collision of
    # every draw across seeds has vanishing probability
    assert [ids for _, ids in c] != [ids for _, ids in a]


def test_sampling_batch_invariance():
    """Keys fold the CORPUS index, so the sampled output of a sentence must
    not depend on batch size or bucket grouping."""
    cfg, model, state, vocab = setup(sampling_temp=1.0)
    small = decode_ids(Translator(model, state.params, vocab, vocab,
                                  cfg.decode, buckets=[8]))
    cfg.decode.batch_size = 6
    big = decode_ids(Translator(model, state.params, vocab, vocab,
                                cfg.decode, buckets=[8]))
    assert small == big
    # and invariant to bucket layout (two buckets split the corpus)
    cfg.decode.batch_size = 4
    split = decode_ids(Translator(model, state.params, vocab, vocab,
                                  cfg.decode, buckets=[2, 8]))
    assert split == small


def test_sampled_scores_match_force_decode():
    """The returned score is the raw model log-prob of the sampled tokens:
    force-decoding the sampled hypothesis must reproduce it exactly."""
    cfg, model, state, vocab = setup(sampling_temp=1.5, max_length=16)
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    out = decode_ids(tr)
    # only EOS-terminated hypotheses are comparable (the scorer appends EOS;
    # a max_length-capped sample never paid that log-prob)
    rows = [i for i, (_, ids) in enumerate(out) if len(ids) < 16]
    assert rows, "no sampled hypothesis terminated; enlarge max_length"
    logp, _, _ = score_corpus(
        model, state.params, [SRC[i] for i in rows],
        [out[i][1] for i in rows], None, buckets=[8], batch_size=4)
    for lp, i in zip(logp, rows):
        assert out[i][0] == pytest.approx(lp, abs=1e-3)


def test_sampling_min_length():
    cfg, model, state, vocab = setup(sampling_temp=1.0, min_length=3)
    out = decode_ids(Translator(model, state.params, vocab, vocab,
                                cfg.decode, buckets=[8]))
    assert all(len(ids) >= 3 for _, ids in out)


def test_sampling_ensemble_smoke():
    """Sampling composes with checkpoint ensembles (combined distribution)."""
    cfg, model, state, vocab = setup(sampling_temp=1.0)
    cfg2, model2, state2, _ = setup()
    tr = Translator([model, model2], (state.params, state2.params),
                    vocab, vocab, cfg.decode, buckets=[8])
    a = decode_ids(tr)
    b = decode_ids(tr)
    assert a == b and len(a) == len(SRC)


def test_latent_sample_deterministic_and_differs_from_mean():
    cfg, model, state, vocab = setup("vmmt_c", beam_size=4)
    feats = np.random.default_rng(0).standard_normal(
        (len(SRC), 8)).astype(np.float32)
    mean = decode_ids(Translator(model, state.params, vocab, vocab,
                                 cfg.decode, buckets=[8]), feats=feats)
    cfg.decode.latent_from = "sample"
    s1 = decode_ids(Translator(model, state.params, vocab, vocab,
                               cfg.decode, buckets=[8]), feats=feats)
    s2 = decode_ids(Translator(model, state.params, vocab, vocab,
                               cfg.decode, buckets=[8]), feats=feats)
    assert s1 == s2  # same seed -> same z -> same beam result
    # z = mu + sigma*eps with sigma ~ softplus(0) ~ 0.7 at init: the scores
    # (f32 log-probs) cannot coincide with the mean-z decode
    assert [s for s, _ in s1] != [s for s, _ in mean]
    cfg.decode.decode_seed = 999
    s3 = decode_ids(Translator(model, state.params, vocab, vocab,
                               cfg.decode, buckets=[8]), feats=feats)
    assert [s for s, _ in s3] != [s for s, _ in s1]


def test_latent_sample_batch_invariance():
    cfg, model, state, vocab = setup("vmmt_c", beam_size=4,
                                     latent_from="sample")
    feats = np.random.default_rng(0).standard_normal(
        (len(SRC), 8)).astype(np.float32)
    small = decode_ids(Translator(model, state.params, vocab, vocab,
                                  cfg.decode, buckets=[8]), feats=feats)
    cfg.decode.batch_size = 6
    big = decode_ids(Translator(model, state.params, vocab, vocab,
                                cfg.decode, buckets=[8]), feats=feats)
    assert small == big


def test_latent_sample_rejected_for_nmt():
    cfg, model, state, vocab = setup("nmt", latent_from="sample")
    with pytest.raises(ValueError, match="no latent"):
        Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])


@pytest.mark.parametrize("dec,msg", [
    (dict(sampling_topk=5), "imply sampling"),
    (dict(sampling_topp=0.9), "imply sampling"),
    (dict(sampling_temp=1.0, beam_size=4), "beam_size must be 1"),
    (dict(sampling_temp=1.0, beam_size=4, n_best=2), "n_best must be 1"),
    (dict(sampling_temp=1.0, replace_unk=True), "replace_unk"),
    (dict(sampling_temp=1.0, dump_beam=True), "dump_beam"),
    (dict(sampling_temp=1.0, coverage_beta=0.2), "coverage_beta"),
    (dict(sampling_temp=-1.0), "must be >= 0"),
    (dict(latent_from="posterior"), "latent_from"),
])
def test_invalid_sampling_configs_rejected(dec, msg):
    cfg, model, state, vocab = setup("vmmt_c", **dec)
    with pytest.raises(ValueError, match=msg):
        Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])


def test_dp_mesh_sampling_matches_single_device():
    """Sampling decode over the 8-device data mesh == single device: the
    per-sentence PRNG folds the corpus index, so sharding the batch across
    devices must not change any draw (exercises the replicated base-key
    device_put in Translator.dispatch_ids)."""
    from variational_mmt_tpu.parallel.mesh import make_mesh

    cfg, model, state, vocab = setup("vmmt_c", sampling_temp=0.8,
                                     latent_from="sample")
    cfg.decode.batch_size = 8
    src = [[4 + (i * 3 + j) % 19 for j in range(2 + i % 5)] for i in range(11)]
    feats = np.random.default_rng(3).standard_normal((11, 8)).astype(np.float32)

    single = Translator(model, state.params, vocab, vocab, cfg.decode,
                        buckets=[8])
    dp = Translator(model, state.params, vocab, vocab, cfg.decode,
                    buckets=[8], mesh=make_mesh())
    out_s = single.translate_ids(src, feats)
    out_d = dp.translate_ids(src, feats)
    for a, b in zip(out_s, out_d):
        assert [ids for _, ids in a] == [ids for _, ids in b]
        np.testing.assert_allclose([s for s, _ in a], [s for s, _ in b],
                                   rtol=2e-5, atol=2e-5)

    # the runtime-seed override threads through the mesh path too
    out_s9 = single.translate_ids(src, feats, seed=9)
    out_d9 = dp.translate_ids(src, feats, seed=9)
    assert [[ids for _, ids in nb] for nb in out_s9] \
        == [[ids for _, ids in nb] for nb in out_d9]
    assert [[ids for _, ids in nb] for nb in out_s9] \
        != [[ids for _, ids in nb] for nb in out_s]


def test_stream_ids_override_corpus_position():
    """stream_ids decouple a sentence's PRNG stream from its corpus position:
    the same (sentence, stream) pair draws identically wherever it sits."""
    cfg, model, state, vocab = setup(sampling_temp=1.2)
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    # baseline: position IS the stream (default), so position 2 == stream 2
    base = tr.translate_ids(SRC)
    moved = tr.translate_ids([SRC[2], SRC[0]], stream_ids=[2, 0])
    assert moved[0] == base[2]
    assert moved[1] == base[0]
    # validation: one stream id per sentence
    import pytest as _pt
    with _pt.raises(ValueError, match="one entry per sentence"):
        tr.translate_ids(SRC, stream_ids=[1, 2])
