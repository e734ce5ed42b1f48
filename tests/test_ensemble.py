"""Checkpoint-ensemble decode: combination math, degenerate-ensemble
identity, mixed-architecture members, CLI surface.

The reference lineage ensembles checkpoints by averaging the per-step
output distributions across models inside the beam (SURVEY.md §2.1 #15's
Translator is the seam); here the combination happens on-device inside the
single compiled beam program (decode/translator.py _combine_logps).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from variational_mmt_tpu.config import Config, DecodeConfig, ModelConfig, TrainConfig
from variational_mmt_tpu.data.vocab import SPECIALS, Vocab
from variational_mmt_tpu.decode.translator import Translator, _combine_logps
from variational_mmt_tpu.models.model import build_model
from variational_mmt_tpu.train.trainer import create_train_state


def small_setup(model_type="vmmt_c", seed=7, hidden=32, img_dim=8):
    cfg = Config(
        model=ModelConfig(
            model_type=model_type, src_vocab_size=24, tgt_vocab_size=24,
            emb_dim=16, hidden_dim=hidden, enc_layers=1, dec_layers=2,
            latent_dim=4, img_feat_dim=img_dim, dropout=0.0,
            compute_dtype="float32",
        ),
        train=TrainConfig(seed=seed),
        decode=DecodeConfig(beam_size=4, max_length=12, batch_size=4),
    )
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    vocab = Vocab(SPECIALS + [f"w{i}" for i in range(20)])
    return cfg, model, state, vocab


SRC = [[5, 6, 7], [8, 9], [10, 11, 12, 13]]


def _feats(n=3):
    return np.random.default_rng(0).standard_normal((n, 8)).astype(np.float32)


def test_combine_logps_math():
    rng = np.random.default_rng(1)
    a = jnp.asarray(np.log(rng.dirichlet(np.ones(11), size=3)), jnp.float32)
    b = jnp.asarray(np.log(rng.dirichlet(np.ones(11), size=3)), jnp.float32)
    prob = _combine_logps([a, b], "prob")
    np.testing.assert_allclose(
        np.asarray(jnp.exp(prob)), (np.exp(a) + np.exp(b)) / 2.0,
        rtol=1e-5, atol=1e-6)
    logprob = _combine_logps([a, b], "logprob")
    np.testing.assert_allclose(np.asarray(logprob), (a + b) / 2.0, rtol=1e-6)
    # single member: identity for both modes
    for mode in ("prob", "logprob"):
        np.testing.assert_array_equal(np.asarray(_combine_logps([a], mode)),
                                      np.asarray(a))
    with pytest.raises(ValueError):
        _combine_logps([a, b], "mean")


@pytest.mark.parametrize("mode", ["prob", "logprob"])
def test_self_ensemble_matches_single(mode):
    """[ckpt, ckpt] must decode exactly like ckpt: both combination rules
    are the identity on identical distributions."""
    cfg, model, state, vocab = small_setup()
    feats = _feats()
    single = Translator(model, state.params, vocab, vocab, cfg.decode,
                        buckets=[8]).translate_ids(SRC, feats)
    cfg.decode.ensemble_mode = mode
    duo = Translator([model, model], [state.params, state.params],
                     vocab, vocab, cfg.decode,
                     buckets=[8]).translate_ids(SRC, feats)
    for s, d in zip(single, duo):
        assert [ids for _, ids in s] == [ids for _, ids in d]
        np.testing.assert_allclose([sc for sc, _ in s], [sc for sc, _ in d],
                                   rtol=1e-5)


def test_self_ensemble_greedy_path():
    cfg, model, state, vocab = small_setup()
    cfg.decode.beam_size = 1
    feats = _feats()
    single = Translator(model, state.params, vocab, vocab, cfg.decode,
                        buckets=[8]).translate_ids(SRC, feats)
    duo = Translator([model, model], [state.params, state.params],
                     vocab, vocab, cfg.decode,
                     buckets=[8]).translate_ids(SRC, feats)
    assert [[ids for _, ids in s] for s in single] == \
        [[ids for _, ids in d] for d in duo]


def test_mixed_architecture_ensemble_runs():
    """Members may differ in width and model family (each keeps its own
    encoder memory/latent/carry); only the vocabs must match."""
    cfg_a, model_a, state_a, vocab = small_setup("vmmt_c", seed=1, hidden=32)
    cfg_b, model_b, state_b, _ = small_setup("nmt", seed=2, hidden=48)
    dcfg = DecodeConfig(beam_size=3, n_best=3, max_length=10, batch_size=4)
    tr = Translator([model_a, model_b], [state_a.params, state_b.params],
                    vocab, vocab, dcfg, buckets=[8])
    out = tr.translate_ids(SRC, _feats())
    assert len(out) == 3
    for nbest in out:
        assert len(nbest) == 3
        scores = [s for s, _ in nbest]
        assert scores == sorted(scores, reverse=True)
        assert all(math.isfinite(s) for s in scores)


def test_ensemble_replace_unk_attention():
    """track_attn path: member-mean attention drives replace_unk without
    error and entries carry source positions."""
    cfg, model_a, state_a, vocab = small_setup(seed=3)
    _, model_b, state_b, _ = small_setup(seed=4)
    dcfg = DecodeConfig(beam_size=2, max_length=8, batch_size=4,
                        replace_unk=True)
    tr = Translator([model_a, model_b], [state_a.params, state_b.params],
                    vocab, vocab, dcfg, buckets=[8])
    out = tr.translate_ids(SRC, _feats())
    for nbest in out:
        score, ids, attn = nbest[0]
        assert len(attn) == len(ids)


def test_cli_img_interface_mismatch_rejected(tmp_path):
    """Two vmmt_c members trained on different feature dims cannot share one
    -img_feats tensor: the translate CLI refuses up front (same rule in the
    serve CLI)."""
    from variational_mmt_tpu.cli import serve as cli_serve
    from variational_mmt_tpu.cli import translate as cli_translate
    from variational_mmt_tpu.train.checkpoint import save_checkpoint

    cfg_a, _, state_a, vocab = small_setup(seed=31, img_dim=8)
    cfg_b, _, state_b, _ = small_setup(seed=32, img_dim=16)
    save_checkpoint(str(tmp_path / "a"), state_a, cfg_a, vocab, vocab)
    save_checkpoint(str(tmp_path / "b"), state_b, cfg_b, vocab, vocab)
    src = tmp_path / "src.txt"
    src.write_text("w1 w2\n")
    feats = tmp_path / "feats.npy"
    np.save(feats, np.zeros((1, 8), np.float32))
    argv = ["-model", f"{tmp_path}/a,{tmp_path}/b", "-src", str(src),
            "-img_feats", str(feats), "-pretokenized",
            "-output", str(tmp_path / "pred.txt")]
    with pytest.raises(SystemExit, match="image-feature interface"):
        cli_translate.main(argv)
    with pytest.raises(SystemExit, match="image-feature interface"):
        cli_serve.main(["-model", f"{tmp_path}/a,{tmp_path}/b", "-no_warmup"])
    # the TP guard needs interface-compatible members (the shared loader
    # raises the interface mismatch first)
    with pytest.raises(SystemExit, match="tensor_parallel"):
        cli_serve.main(["-model", f"{tmp_path}/a,{tmp_path}/a",
                        "-tensor_parallel", "2", "-no_warmup"])


def test_member_count_mismatch_rejected():
    cfg, model, state, vocab = small_setup()
    with pytest.raises(ValueError, match="param trees"):
        Translator([model, model], [state.params], vocab, vocab, cfg.decode,
                   buckets=[8])
    # a bare (non-sequence) tree with a model list must fail in __init__,
    # not be silently zip-truncated to member 0 inside the traced fn
    with pytest.raises(ValueError, match="single tree"):
        Translator([model, model], state.params, vocab, vocab, cfg.decode,
                   buckets=[8])


def test_ensemble_data_parallel_mesh_matches_single():
    """Ensemble decode over the data mesh (replicated member params,
    batch sharded on 'data') == single-device ensemble, token for token."""
    from variational_mmt_tpu.parallel.mesh import make_mesh

    cfg, model_a, state_a, vocab = small_setup(seed=51)
    _, model_b, state_b, _ = small_setup("nmt", seed=52)
    n = len(jax.devices())
    dcfg = DecodeConfig(beam_size=3, max_length=10, batch_size=n)
    src = [[4 + (i * 3 + j) % 19 for j in range(1 + i % 5)]
           for i in range(n + 3)]  # non-multiple count: pad-row masking
    feats = np.random.default_rng(9).standard_normal(
        (len(src), 8)).astype(np.float32)
    members = ([model_a, model_b], [state_a.params, state_b.params])
    out_s = Translator(*members, vocab, vocab, dcfg,
                       buckets=[8]).translate_ids(src, feats)
    out_dp = Translator(*members, vocab, vocab, dcfg, buckets=[8],
                        mesh=make_mesh(n)).translate_ids(src, feats)
    for a, b in zip(out_s, out_dp):
        assert [ids for _, ids in a] == [ids for _, ids in b]
        np.testing.assert_allclose([s for s, _ in a], [s for s, _ in b],
                                   rtol=2e-5, atol=2e-5)


def test_model_spec_empty_segment_rejected():
    from variational_mmt_tpu.cli.loading import load_model_spec

    for spec in ("ckpts/a,", ",ckpts/a", "a,,b"):
        with pytest.raises(SystemExit, match="empty checkpoint path"):
            load_model_spec(spec)


def test_serve_mixed_family_uses_vmmt_c_feature_interface():
    """A vmmt_f member trained on WIDER features may share an ensemble with
    a narrower vmmt_c (its v is ignored at decode); the service must size
    request features to the vmmt_c interface — the only decode-time
    consumer — not to whichever member comes first."""
    from variational_mmt_tpu.serve import ServeConfig, TranslationService

    _, model_f, state_f, vocab = small_setup("vmmt_f", seed=41, img_dim=16)
    _, model_c, state_c, _ = small_setup("vmmt_c", seed=42, img_dim=8)
    svc = TranslationService(
        [model_f, model_c], [state_f.params, state_c.params], vocab, vocab,
        DecodeConfig(beam_size=2, max_length=8, batch_size=4), buckets=[8],
        scfg=ServeConfig(max_wait_ms=50.0, warmup=False))
    try:
        assert svc._feat_shape() == (8,)
        imgs = np.zeros((2, 8), np.float32)
        out = svc.translate_text(["w1 w2", "w3"], imgs)
        assert len(out) == 2
    finally:
        svc.stop()


def test_serve_ensemble_matches_offline():
    """The dynamic-batching service accepts an ensemble and answers exactly
    like the offline ensemble Translator."""
    from variational_mmt_tpu.serve import ServeConfig, TranslationService

    cfg, model_a, state_a, vocab = small_setup(seed=21)
    _, model_b, state_b, _ = small_setup("nmt", seed=22)
    dcfg = DecodeConfig(beam_size=2, max_length=10, batch_size=4)
    svc = TranslationService(
        [model_a, model_b], [state_a.params, state_b.params], vocab, vocab,
        dcfg, buckets=[8], scfg=ServeConfig(max_wait_ms=50.0, warmup=False))
    try:
        texts = ["w1 w2 w3", "w4 w5", "w6 w7 w8 w9"]
        imgs = np.random.default_rng(0).standard_normal((3, 8)).astype(np.float32)
        online = svc.translate_text(texts, imgs)
        offline = Translator(
            [model_a, model_b], [state_a.params, state_b.params], vocab,
            vocab, dcfg, buckets=[8],
        ).translate_tokens([t.split() for t in texts], imgs)
        assert [nb[0][1] for nb in online] == [nb[0][1] for nb in offline]
    finally:
        svc.stop()


def test_ensemble_shifts_distribution():
    """A two-member ensemble of different random models is genuinely the
    combination, not member 0: at least one sentence must decode
    differently from both members on a batch of inputs."""
    cfg, model_a, state_a, vocab = small_setup(seed=11)
    _, model_b, state_b, _ = small_setup(seed=12)
    src = [[4 + (i * 3 + j) % 19 for j in range(1 + i % 5)] for i in range(12)]
    feats = np.random.default_rng(5).standard_normal((12, 8)).astype(np.float32)
    dcfg = DecodeConfig(beam_size=4, max_length=12, batch_size=4)
    out_a = Translator(model_a, state_a.params, vocab, vocab, dcfg,
                       buckets=[8]).translate_ids(src, feats)
    out_b = Translator(model_b, state_b.params, vocab, vocab, dcfg,
                       buckets=[8]).translate_ids(src, feats)
    out_e = Translator([model_a, model_b], [state_a.params, state_b.params],
                       vocab, vocab, dcfg, buckets=[8]).translate_ids(src, feats)
    ids = lambda out: [out[i][0][1] for i in range(len(out))]
    # the two members must disagree for the assertion below to bite, and
    # the ensemble must differ from EACH member (an `or` here would pass a
    # regression that returns member 0's distribution verbatim)
    assert ids(out_a) != ids(out_b)
    assert ids(out_e) != ids(out_a) and ids(out_e) != ids(out_b)


def test_ensemble_supports_dump_beam_and_coverage():
    """Beam-level features (raw search trace, coverage penalty) are defined
    on the COMBINED distribution and must work with an ensemble (unlike the
    per-model flags the CLI rejects)."""
    cfg, model_a, state_a, vocab = small_setup(seed=61)
    _, model_b, state_b, _ = small_setup(seed=62)
    dcfg = DecodeConfig(beam_size=2, max_length=8, batch_size=4,
                        coverage_beta=0.2, dump_beam=True)
    tr = Translator([model_a, model_b], [state_a.params, state_b.params],
                    vocab, vocab, dcfg, buckets=[8])
    out = tr.translate_ids(SRC, _feats())
    assert len(out) == 3
    # one raw search tree per corpus index, each step carrying (parent,
    # token) pairs for every beam slot
    assert sorted(tr.beam_traces) == [0, 1, 2]
    for trace in tr.beam_traces.values():
        assert len(trace) >= 1
