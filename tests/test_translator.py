"""Translator + checkpoint round-trip + IW-ELBO eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from variational_mmt_tpu.config import Config, DecodeConfig, ModelConfig, TrainConfig
from variational_mmt_tpu.data.vocab import Vocab, SPECIALS
from variational_mmt_tpu.decode.iw_eval import make_iw_elbo_fn
from variational_mmt_tpu.decode.translator import Translator
from variational_mmt_tpu.models.model import build_model
from variational_mmt_tpu.train.checkpoint import (
    latest_checkpoint,
    list_checkpoints,
    load_checkpoint,
    save_checkpoint,
)
from variational_mmt_tpu.train.trainer import create_train_state


def small_setup(model_type="vmmt_c"):
    cfg = Config(
        model=ModelConfig(
            model_type=model_type, src_vocab_size=24, tgt_vocab_size=24, emb_dim=16,
            hidden_dim=32, enc_layers=1, dec_layers=2, latent_dim=4, img_feat_dim=8,
            dropout=0.0, compute_dtype="float32",
        ),
        train=TrainConfig(seed=7),
        decode=DecodeConfig(beam_size=4, max_length=12, batch_size=4),
    )
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    vocab = Vocab(SPECIALS + [f"w{i}" for i in range(20)])
    return cfg, model, state, vocab


def test_translator_produces_output():
    cfg, model, state, vocab = small_setup()
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    src = [["w1", "w2", "w3"], ["w4", "w5"], ["w6"]]
    feats = np.random.default_rng(0).standard_normal((3, 8)).astype(np.float32)
    out = tr.translate_tokens(src, feats)
    assert len(out) == 3
    for nbest in out:
        assert len(nbest) == 1
        score, text = nbest[0]
        assert isinstance(text, str)


def test_translator_nbest_sorted():
    cfg, model, state, vocab = small_setup()
    cfg.decode.n_best = 4
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    feats = np.zeros((2, 8), np.float32)
    out = tr.translate_ids([[5, 6, 7], [8, 9]], feats)
    for nbest in out:
        scores = [s for s, _ in nbest]
        assert scores == sorted(scores, reverse=True)


def test_greedy_beam1_path():
    cfg, model, state, vocab = small_setup("nmt")
    cfg.decode.beam_size = 1
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    out = tr.translate_ids([[5, 6, 7]])
    assert len(out) == 1 and len(out[0]) == 1


def test_translation_deterministic():
    cfg, model, state, vocab = small_setup()
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    feats = np.ones((1, 8), np.float32)
    a = tr.translate_ids([[5, 6, 7]], feats)
    b = tr.translate_ids([[5, 6, 7]], feats)
    assert a == b


def test_checkpoint_roundtrip_identical_decode(tmp_path):
    """SURVEY §2.5: checkpoints must round-trip (save->load->same decode)."""
    cfg, model, state, vocab = small_setup()
    ckpt_dir = str(tmp_path / "ckpts")
    save_checkpoint(ckpt_dir, state, cfg, vocab, vocab, keep=3)
    path = latest_checkpoint(ckpt_dir)
    state2, cfg2, model2, sv2, tv2 = load_checkpoint(path)
    assert cfg2.model == cfg.model
    assert sv2.itos == vocab.itos
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    feats = np.ones((2, 8), np.float32)
    src = [[5, 6, 7], [8, 9, 10]]
    out1 = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8]).translate_ids(src, feats)
    out2 = Translator(model2, state2.params, sv2, tv2, cfg2.decode, buckets=[8]).translate_ids(src, feats)
    assert out1 == out2


def test_checkpoint_retention(tmp_path):
    cfg, model, state, vocab = small_setup("nmt")
    ckpt_dir = str(tmp_path / "ckpts")
    for s in range(5):
        state = state.replace(step=jnp.int32(s))
        save_checkpoint(ckpt_dir, state, cfg, vocab, vocab, keep=2)
    assert list_checkpoints(ckpt_dir) == [3, 4]


@pytest.mark.parametrize("model_type", ["vmmt_f", "vmmt_c"])
def test_iw_elbo(model_type):
    cfg, model, state, vocab = small_setup(model_type)
    B, L = 4, 6
    rng = np.random.default_rng(0)
    batch = {
        "src": jnp.array(rng.integers(4, 24, (B, L)), jnp.int32),
        "tgt_in": jnp.array(rng.integers(4, 24, (B, L)), jnp.int32),
        "tgt_out": jnp.array(rng.integers(4, 24, (B, L)), jnp.int32),
        "example_mask": jnp.ones((B,), jnp.float32),
        "img": jnp.array(rng.standard_normal((B, 8)), jnp.float32),
    }
    fn = jax.jit(make_iw_elbo_fn(model, 5))
    out = fn(state.params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(out["iw_elbo_sum"]))
    assert float(out["n_sents"]) == B
    # IW bound with more samples should not get (meaningfully) worse
    fn1 = jax.jit(make_iw_elbo_fn(model, 1))
    keys = [jax.random.PRNGKey(i) for i in range(8)]
    iw1 = np.mean([float(fn1(state.params, batch, k)["iw_elbo_sum"]) for k in keys])
    iw5 = np.mean([float(fn(state.params, batch, k)["iw_elbo_sum"]) for k in keys])
    assert iw5 >= iw1 - 1.0  # monotone-in-K in expectation


def test_iw_rejects_nonlatent():
    cfg, model, state, vocab = small_setup("nmt")
    with pytest.raises(ValueError):
        make_iw_elbo_fn(model, 3)


def test_dp_decode_matches_single_device():
    """Data-parallel beam decode over the 8-device mesh returns exactly the
    single-device result (tokens and scores)."""
    from variational_mmt_tpu.parallel.mesh import make_mesh

    cfg, model, state, vocab = small_setup()
    cfg.decode.batch_size = 8  # divisible by the mesh
    src = [[4 + (i * 3 + j) % 19 for j in range(2 + i % 5)] for i in range(11)]
    feats = np.random.default_rng(3).standard_normal((11, 8)).astype(np.float32)

    single = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    dp = Translator(
        model, state.params, vocab, vocab, cfg.decode, buckets=[8],
        mesh=make_mesh(),
    )
    out_s = single.translate_ids(src, feats)
    out_d = dp.translate_ids(src, feats)
    for a, b in zip(out_s, out_d):
        assert [ids for _, ids in a] == [ids for _, ids in b]
        np.testing.assert_allclose(
            [s for s, _ in a], [s for s, _ in b], rtol=2e-5, atol=2e-5
        )


def test_dp_decode_rejects_indivisible_batch():
    from variational_mmt_tpu.parallel.mesh import make_mesh

    cfg, model, state, vocab = small_setup()
    cfg.decode.batch_size = 6
    with pytest.raises(ValueError):
        Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8],
                   mesh=make_mesh())


def test_dp_iw_eval_matches_single_device():
    """Mesh-sharded IW eval == single-device (same keys, same bound)."""
    from variational_mmt_tpu.decode.iw_eval import iw_elbo_corpus
    from variational_mmt_tpu.parallel.mesh import make_mesh

    cfg, model, state, vocab = small_setup("vmmt_c")
    B, L = 8, 6
    rng = np.random.default_rng(1)
    batch = {
        "src": np.asarray(rng.integers(4, 24, (B, L)), np.int32),
        "tgt_in": np.asarray(rng.integers(4, 24, (B, L)), np.int32),
        "tgt_out": np.asarray(rng.integers(4, 24, (B, L)), np.int32),
        "example_mask": np.ones((B,), np.float32),
        "img": np.asarray(rng.standard_normal((B, 8)), np.float32),
    }
    key = jax.random.PRNGKey(3)
    single = iw_elbo_corpus(model, state.params, [batch], 4, key)
    dp = iw_elbo_corpus(model, state.params, [batch], 4, key, mesh=make_mesh())
    assert single["iw_elbo_per_sent"] == pytest.approx(
        dp["iw_elbo_per_sent"], rel=1e-5
    )
    assert single["iw_ppl"] == pytest.approx(dp["iw_ppl"], rel=1e-5)


def test_score_corpus_per_sentence_and_attn():
    """Force-decode scorer (decode/score.py): per-sentence log p(y|x,z-mean)
    is batch-layout invariant, attention rows are a distribution over real
    source positions, and shapes trim to the true lengths."""
    from variational_mmt_tpu.decode.score import report_score, score_corpus

    cfg, model, state, vocab = small_setup()
    feats = np.random.default_rng(3).standard_normal((3, 8)).astype(np.float32)
    src = [[5, 6, 7], [8, 9], [10, 11, 12, 13]]
    tgt = [[6, 7], [9, 10, 11], [12]]
    lp, nt, attns = score_corpus(model, state.params, src, tgt, feats,
                                 buckets=[8], batch_size=2, return_attn=True)
    assert lp.shape == (3,) and np.all(lp < 0)
    np.testing.assert_array_equal(nt, [3, 4, 2])  # len(tgt)+1 EOS steps
    # batch-layout invariance: B=1 must give the same numbers
    lp1, nt1, _ = score_corpus(model, state.params, src, tgt, feats,
                               buckets=[8], batch_size=1)
    np.testing.assert_allclose(lp, lp1, rtol=1e-5)
    for i, a in enumerate(attns):
        assert a.shape == (len(tgt[i]) + 1, len(src[i]))
        np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-5)
    line = report_score("GOLD", lp, nt)
    assert "GOLD AVG SCORE" in line and "GOLD PPL" in line


def test_score_corpus_overlong_sequences_get_catchall_bucket():
    from variational_mmt_tpu.decode.score import score_corpus

    cfg, model, state, vocab = small_setup("nmt")
    src = [[5] * 20]  # longer than the largest bucket (8)
    tgt = [[6] * 15]
    lp, nt, _ = score_corpus(model, state.params, src, tgt, None,
                             buckets=[8], batch_size=2)
    assert nt[0] == 16 and np.isfinite(lp[0])


def test_empty_source_line():
    """An empty source line must not crash and must produce an output row
    (real corpora contain blank lines; the reference tolerates them)."""
    cfg, model, state, vocab = small_setup()
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    feats = np.zeros((3, 8), np.float32)
    out = tr.translate_tokens([["w1", "w2"], [], ["w3"]], feats)
    assert len(out) == 3
    assert all(isinstance(nbest[0][1], str) for nbest in out)


def test_vmmt_c_decode_without_features_clear_error(tmp_path):
    """Decoding a conditional-prior checkpoint without -img_feats must raise
    the explicit SystemExit, not a flax shape error deep in the prior."""
    import pytest as _pytest

    from variational_mmt_tpu.cli import translate as cli_translate

    cfg, model, state, vocab = small_setup("vmmt_c")
    path = save_checkpoint(str(tmp_path / "ck"), state, cfg, vocab, vocab)
    src = tmp_path / "s.txt"
    src.write_text("w1 w2\n")
    with _pytest.raises(SystemExit, match="img_feats"):
        cli_translate.main(["-model", str(tmp_path / "ck"), "-src", str(src),
                            "-pretokenized", "-output", str(tmp_path / "o.txt")])


def test_replace_unk_phrase_table():
    """-phrase_table: replace_unk consults the src->tgt map before copying
    the source token verbatim (reference Translator behavior)."""
    cfg, model, state, vocab = small_setup("nmt")
    cfg.decode.replace_unk = True
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    # force an UNK-heavy output: the tiny untrained model emits arbitrary
    # ids; instead exercise the substitution path directly
    src_tokens = [["alpha", "beta"]]
    out_plain = tr.translate_tokens(src_tokens)
    tr.phrase_table = {"alpha": "ALPHA_T", "beta": "BETA_T"}
    out_pt = tr.translate_tokens(src_tokens)
    # every <unk> that copied "alpha"/"beta" now maps through the table
    for nb_plain, nb_pt in zip(out_plain, out_pt):
        for (s1, t1), (s2, t2) in zip(nb_plain, nb_pt):
            assert t2 == t1.replace("alpha", "ALPHA_T").replace("beta", "BETA_T")


def test_greedy_min_length_routes_through_beam():
    """beam_size=1 with min_length must NOT take the greedy fast path (which
    cannot mask EOS): every hypothesis gets at least min_length tokens."""
    cfg, model, state, vocab = small_setup("nmt")
    cfg.decode.beam_size = 1
    cfg.decode.min_length = 5
    cfg.decode.max_length = 8
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    out = tr.translate_ids([[5, 6, 7], [9]])
    for nbest in out:
        assert len(nbest[0][1]) >= 5


def test_overlong_source_not_truncated_at_decode():
    """A source longer than the largest bucket gets a catch-all bucket: the
    decode must consume ALL tokens (equality with an explicitly big bucket
    proves no truncation happened)."""
    cfg, model, state, vocab = small_setup("nmt")
    long_src = [list(range(5, 5 + 15))]  # 15 tokens, largest bucket is 8
    tr_small = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    tr_big = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[16])
    a = tr_small.translate_ids(long_src)
    b = tr_big.translate_ids(long_src)
    assert a[0][0][1] == b[0][0][1]
    # and it genuinely differs from decoding the truncated prefix
    c = tr_big.translate_ids([long_src[0][:8]])
    assert a[0][0][1] != c[0][0][1] or a[0][0][0] != c[0][0][0]


def test_n_best_beyond_beam_rejected():
    """n_best > beam_size must raise (silent clamping would change the
    n-best block structure a downstream parser was promised)."""
    cfg, model, state, vocab = small_setup()
    with pytest.raises(ValueError, match="n_best"):
        Translator(model, state.params, vocab, vocab,
                   DecodeConfig(beam_size=2, n_best=5), buckets=[8])


def test_greedy_scores_are_real_logprobs():
    """beam_size=1 (greedy fast path) must return the cumulative log-prob
    of the emitted tokens, not fake zeros — serve clients and
    translate_ids callers receive these scores directly."""
    cfg, model, state, vocab = small_setup()
    cfg.decode.beam_size = 1
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    feats = np.random.default_rng(1).standard_normal((3, 8)).astype(np.float32)
    out = tr.translate_ids([[5, 6, 7], [8, 9], [10, 11]], feats)
    scores = [nbest[0][0] for nbest in out]
    assert all(np.isfinite(s) for s in scores)
    assert any(s != 0.0 for s in scores)
    assert all(s <= 0.0 for s in scores)  # log-probs of emitted tokens


def test_infer_dtype_bf16_casts_and_decodes():
    """-infer_dtype bfloat16: float param leaves are cast at load (halved
    HBM weight traffic on the bandwidth-bound decode step); decode still
    produces finite log-prob scores (logits/latent heads upcast to f32)."""
    cfg, model, state, vocab = small_setup()
    cfg.decode.infer_dtype = "bfloat16"
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    for leaf in jax.tree_util.tree_leaves(tr.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.bfloat16
    feats = np.random.default_rng(0).standard_normal((2, 8)).astype(np.float32)
    out = tr.translate_tokens([["w1", "w2"], ["w3"]], feats)
    assert len(out) == 2
    for nbest in out:
        score, text = nbest[0]
        assert np.isfinite(score)
        assert isinstance(text, str)


def test_infer_dtype_bf16_ensemble_members_cast():
    cfg, model, state, vocab = small_setup()
    cfg2, model2, state2, _ = small_setup()
    cfg.decode.infer_dtype = "bfloat16"
    tr = Translator([model, model2], (state.params, state2.params),
                    vocab, vocab, cfg.decode, buckets=[8])
    for tree in tr.params:
        for leaf in jax.tree_util.tree_leaves(tree):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.bfloat16
    feats = np.zeros((1, 8), np.float32)
    out = tr.translate_ids([[5, 6, 7]], feats)
    assert len(out) == 1 and np.isfinite(out[0][0][0])


def test_infer_dtype_invalid_rejected():
    cfg, model, state, vocab = small_setup()
    cfg.decode.infer_dtype = "float16"
    with pytest.raises(ValueError, match="infer_dtype"):
        Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])


def test_int8_quant_dequant_error_bound():
    """Per-output-channel symmetric int8: reconstruction error per element
    is bounded by the channel's quantization step (max|x|/127, + bf16
    rounding slack)."""
    from variational_mmt_tpu.decode.translator import (
        dequantize_params, quantize_params_int8)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((64, 48)) * rng.lognormal(0, 1, 48)).astype(
        np.float32)  # per-column magnitude spread exercises the per-channel scale
    q = quantize_params_int8({"w": x})
    assert q["w"]["int8"].dtype == jnp.int8
    assert q["w"]["scale"].shape == (48,)
    deq = np.asarray(dequantize_params(q)["w"], np.float32)
    step = np.abs(x).max(axis=0) / 127.0
    assert (np.abs(deq - x) <= step * 1.05 + 1e-12).all()


def test_int8_grid_weights_roundtrip_exact():
    """Weights already on the int8 grid (int multiples of a power-of-two
    channel scale, so every product is bf16-exact) reconstruct EXACTLY —
    pins that the scale math introduces no systematic bias."""
    from variational_mmt_tpu.decode.translator import (
        dequantize_params, quantize_params_int8)

    rng = np.random.default_rng(1)
    ints = rng.integers(-127, 128, (32, 16)).astype(np.float32)
    ints[0, :] = 127  # channel max attained -> scale recovers exactly
    x = ints * (2.0 ** -6)
    deq = np.asarray(
        dequantize_params(quantize_params_int8({"w": x}))["w"], np.float32)
    assert (deq == x).all()


def test_infer_dtype_int8_decodes_and_quarters_footprint():
    """-infer_dtype int8: 2-D float leaves become int8+scale pairs, 1-D
    leaves stay float, and beam decode still produces finite-scored,
    well-formed output. This tiny model is bias-heavy, so the footprint
    lands near 31% of f32 (the matrix-dominated flagship approaches 25%)."""
    cfg, model, state, vocab = small_setup()

    def nbytes(tree):
        return sum(leaf.nbytes for leaf in jax.tree_util.tree_leaves(tree))

    full = nbytes(state.params)
    cfg.decode.infer_dtype = "int8"
    tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
    assert nbytes(tr.params) < 0.35 * full
    feats = np.random.default_rng(0).standard_normal((2, 8)).astype(np.float32)
    out = tr.translate_tokens([["w1", "w2"], ["w3"]], feats)
    assert len(out) == 2
    for nbest in out:
        score, text = nbest[0]
        assert np.isfinite(score) and isinstance(text, str)


def test_int8_composes_with_tensor_parallel():
    """Round 5: the old explicit int8+TP refusal is gone — construction
    succeeds and the quantized generator lands vocab-sharded (full
    TP==single equivalence lives in tests/test_tp.py)."""
    from variational_mmt_tpu.parallel.tp import MODEL_AXIS, make_mesh_2d

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    cfg, model, state, vocab = small_setup()
    cfg.decode.infer_dtype = "int8"
    cfg.decode.batch_size = 4
    mesh = make_mesh_2d(len(jax.devices()) // 2, 2)
    tr = Translator(model, state.params, vocab, vocab, cfg.decode,
                    buckets=[8], mesh=mesh)
    gk = tr.params["generator"]["kernel"]
    assert MODEL_AXIS in str(gk["int8"].sharding.spec), gk["int8"].sharding


def test_block_ngram_validation():
    cfg, model, state, vocab = small_setup()
    d = DecodeConfig(beam_size=2, max_length=12, batch_size=4,
                     ignore_when_blocking="w1")
    with pytest.raises(ValueError, match="ignore_when_blocking"):
        Translator(model, state.params, vocab, vocab, d, buckets=[8])
    d = DecodeConfig(beam_size=2, max_length=12, batch_size=4,
                     block_ngram_repeat=-1)
    with pytest.raises(ValueError, match="block_ngram_repeat"):
        Translator(model, state.params, vocab, vocab, d, buckets=[8])
    d = DecodeConfig(beam_size=1, n_best=1, max_length=12, batch_size=4,
                     sampling_temp=0.8, block_ngram_repeat=2)
    with pytest.raises(ValueError, match="block_ngram_repeat unsupported"):
        Translator(model, state.params, vocab, vocab, d, buckets=[8])


def test_block_ngram_decode_end_to_end():
    cfg, model, state, vocab = small_setup()
    feats = np.ones((2, 8), np.float32)
    src = [[5, 6, 7], [8, 9]]
    d = DecodeConfig(beam_size=4, max_length=12, batch_size=4,
                     block_ngram_repeat=1)
    out = Translator(model, state.params, vocab, vocab, d,
                     buckets=[8]).translate_ids(src, feats)
    assert len(out) == 2
    for nbest in out:
        ids = list(nbest[0][1])  # translate_ids returns token-id lists
        assert len(ids) == len(set(ids)), ids  # g=1: all-distinct output
    # exclusion tokens resolve through the tgt vocab (unknown -> UNK id)
    d2 = DecodeConfig(beam_size=4, max_length=12, batch_size=4,
                      block_ngram_repeat=2,
                      ignore_when_blocking="w1 not-in-vocab")
    tr = Translator(model, state.params, vocab, vocab, d2, buckets=[8])
    assert vocab.stoi["w1"] in tr._exclusion_ids
    assert 1 in tr._exclusion_ids  # UNK
    assert tr.translate_ids(src, feats)


def test_block_ngram_beam1_routes_through_beam():
    """K=1 with blocking cannot take the greedy fast path (greedy has no
    history masking); it must still decode and obey the constraint."""
    cfg, model, state, vocab = small_setup("nmt")
    d = DecodeConfig(beam_size=1, max_length=12, batch_size=4,
                     block_ngram_repeat=1)
    out = Translator(model, state.params, vocab, vocab, d,
                     buckets=[8]).translate_ids([[5, 6, 7]])
    ids = list(out[0][0][1])
    assert len(ids) == len(set(ids)), ids


def test_release_checkpoint_roundtrip(tmp_path):
    from variational_mmt_tpu.train.checkpoint import (is_released,
                                                      release_checkpoint)

    cfg, model, state, vocab = small_setup()
    ckpt_dir = str(tmp_path / "ckpts")
    save_checkpoint(ckpt_dir, state, cfg, vocab, vocab)
    src = latest_checkpoint(ckpt_dir)
    dst = str(tmp_path / "release")
    info = release_checkpoint(src, dst)
    assert info["dst_bytes"] < info["src_bytes"]
    assert is_released(dst) and not is_released(src)
    state2, cfg2, model2, sv2, tv2 = load_checkpoint(dst)
    feats = np.ones((2, 8), np.float32)
    srcs = [[5, 6, 7], [8, 9, 10]]
    out1 = Translator(model, state.params, vocab, vocab, cfg.decode,
                      buckets=[8]).translate_ids(srcs, feats)
    out2 = Translator(model2, state2.params, sv2, tv2, cfg2.decode,
                      buckets=[8]).translate_ids(srcs, feats)
    assert out1 == out2  # stripping the optimizer must not move decode
    # the synthesized optimizer state: right structure, all zeros
    assert (jax.tree.structure(state2.opt_state)
            == jax.tree.structure(state.opt_state))
    assert all(float(jnp.sum(jnp.abs(l))) == 0.0
               for l in jax.tree.leaves(state2.opt_state))


def test_release_checkpoint_bf16(tmp_path):
    from variational_mmt_tpu.train.checkpoint import release_checkpoint

    cfg, model, state, vocab = small_setup()
    ckpt_dir = str(tmp_path / "ckpts")
    save_checkpoint(ckpt_dir, state, cfg, vocab, vocab)
    src = latest_checkpoint(ckpt_dir)
    keep = release_checkpoint(src, str(tmp_path / "rel_f32"), dtype="keep")
    bf16 = release_checkpoint(src, str(tmp_path / "rel_bf16"), dtype="bfloat16")
    assert bf16["dst_bytes"] < 0.6 * keep["dst_bytes"]
    state2, cfg2, model2, sv2, tv2 = load_checkpoint(str(tmp_path / "rel_bf16"))
    floats = [l for l in jax.tree.leaves(state2.params)
              if jnp.issubdtype(l.dtype, jnp.floating)]
    assert floats and all(l.dtype == jnp.bfloat16 for l in floats)
    out = Translator(model2, state2.params, sv2, tv2, cfg2.decode,
                     buckets=[8]).translate_ids([[5, 6, 7]],
                                                np.ones((1, 8), np.float32))
    assert len(out) == 1 and len(out[0]) >= 1
    with pytest.raises(ValueError, match="dtype"):
        release_checkpoint(src, str(tmp_path / "bad"), dtype="int4")
