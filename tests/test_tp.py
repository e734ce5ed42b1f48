"""Tensor-parallel (2-D data x model mesh) correctness.

The reference is single-GPU (SURVEY.md §2.3); TP is a beyond-reference
TPU-native layout (parallel/tp.py): vocab-sharded embeddings + generator,
replicated recurrent cells. These tests prove the TP layout is a pure
re-layout — same numbers as single-device — on the virtual 8-device mesh.
"""

import jax
import numpy as np
import pytest

from variational_mmt_tpu.config import Config, ModelConfig, TrainConfig
from variational_mmt_tpu.models.model import build_model
from variational_mmt_tpu.parallel.mesh import batch_sharding, make_mesh
from variational_mmt_tpu.parallel.tp import (
    MODEL_AXIS, make_mesh_2d, tree_shardings, validate_tp_divisibility,
)
from variational_mmt_tpu.train.trainer import (
    Trainer, create_train_state, make_eval_step, make_train_step,
    state_shardings,
)

from test_train import make_batch

V = 32  # divisible by the TP degree 2


def tp_cfg(model_type="vmmt_c", fused_ce=True, **model_kw):
    kw = dict(
        model_type=model_type, src_vocab_size=V, tgt_vocab_size=V,
        emb_dim=16, hidden_dim=32, enc_layers=1, dec_layers=2,
        latent_dim=4, img_feat_dim=16, dropout=0.0, word_dropout=0.0,
        compute_dtype="float32", fused_ce=fused_ce,
    )
    kw.update(model_kw)
    return Config(
        model=ModelConfig(**kw),
        train=TrainConfig(learning_rate=3e-3, kl_anneal_steps=20),
    )


def tp_batch(B=16):
    b = make_batch(B=B)
    # re-draw token ids inside the V=32 vocab
    rng = np.random.default_rng(3)
    for k in ("src", "tgt_in", "tgt_out"):
        b[k] = jax.numpy.asarray(
            rng.integers(4, V, b[k].shape).astype(np.int32))
    return b


def test_tp_rules_place_vocab_shards():
    mesh = make_mesh_2d(4, 2)
    cfg = tp_cfg()
    sh = state_shardings(cfg, build_model(cfg.model), mesh)
    state = create_train_state(cfg, build_model(cfg.model))
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]
    }
    gen_k = next(v for k, v in flat.items() if k.endswith("generator/kernel"))
    emb = next(v for k, v in flat.items() if k.endswith("tgt_embed/embedding"))
    enc = next(v for k, v in flat.items() if "encoder" in k and k.endswith("hh_kernel"))
    assert gen_k.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)
    assert emb.spec == jax.sharding.PartitionSpec(MODEL_AXIS, None)
    assert enc.spec == jax.sharding.PartitionSpec()
    # adam moments mirror the layout (they ride the same rules)
    mu_gen = [v for k, v in flat.items()
              if "opt_state" in k and k.endswith("generator/kernel")]
    assert mu_gen and all(
        s.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS) for s in mu_gen)
    # the sharded state materializes with the requested layout
    placed = jax.device_put(state, sh)
    leaf = jax.tree_util.tree_flatten_with_path(placed.params)[0]
    gk = next(l for p, l in leaf
              if "/".join(str(getattr(k, "key", k)) for k in p).endswith("generator/kernel"))
    assert gk.sharding.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)


@pytest.mark.parametrize("fused_ce", [True, False])
def test_tp_train_matches_single_device(fused_ce):
    """3 train steps on a (4 data x 2 model) mesh == single device: the TP
    layout must be a pure re-layout (GSPMD collectives), not a different
    program. Covers the vocab-parallel fused-CE reduction."""
    cfg = tp_cfg(fused_ce=fused_ce)
    model = build_model(cfg.model)
    batch = tp_batch()

    mesh_tp = make_mesh_2d(4, 2)
    mesh_1 = make_mesh(1)
    state_tp = create_train_state(cfg, model)
    state_1 = create_train_state(cfg, model)
    step_tp = make_train_step(cfg, model, mesh_tp)
    step_1 = make_train_step(cfg, model, mesh_1)
    b_tp = jax.device_put(batch, batch_sharding(mesh_tp))
    b_1 = jax.device_put(batch, batch_sharding(mesh_1))
    for _ in range(3):
        state_tp, m_tp = step_tp(state_tp, b_tp)
        state_1, m_1 = step_1(state_1, b_1)
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_1["loss"]),
                               rtol=1e-5)
    # like the DP test: collective reduction order differs from the single-
    # device sum and adam's per-coordinate normalization amplifies ~1e-7
    # grad noise into ~1e-5 params per step; 3 steps compound it (measured
    # max 3.9e-4 on one rarely-touched embedding element, loss still 1e-5)
    for p_tp, p_1 in zip(jax.tree.leaves(state_tp.params),
                         jax.tree.leaves(state_1.params)):
        np.testing.assert_allclose(np.asarray(p_tp), np.asarray(p_1),
                                   rtol=2e-3, atol=1e-4)


def test_tp_tied_generator_matches_single_device():
    """Three-way weight tying + TP: the tied generator reads the vocab-
    sharded tgt_embed transposed; parity must still hold."""
    cfg = tp_cfg(share_embeddings=True, share_decoder_embeddings=True,
                 emb_dim=32)  # tying requires emb_dim == hidden_dim
    model = build_model(cfg.model)
    batch = tp_batch()
    mesh_tp = make_mesh_2d(4, 2)
    state_tp = create_train_state(cfg, model)
    state_1 = create_train_state(cfg, model)
    step_tp = make_train_step(cfg, model, mesh_tp)
    step_1 = make_train_step(cfg, model, make_mesh(1))
    state_tp, m_tp = step_tp(state_tp, jax.device_put(batch, batch_sharding(mesh_tp)))
    state_1, m_1 = step_1(state_1, jax.device_put(batch, batch_sharding(make_mesh(1))))
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_1["loss"]), rtol=1e-5)


def test_tp_eval_step_matches_single_device():
    cfg = tp_cfg()
    model = build_model(cfg.model)
    batch = tp_batch()
    state = create_train_state(cfg, model)
    mesh_tp = make_mesh_2d(4, 2)
    mesh_1 = make_mesh(1)
    ev_tp = make_eval_step(cfg, model, mesh_tp)
    ev_1 = make_eval_step(cfg, model, mesh_1)
    repl_1 = jax.sharding.NamedSharding(mesh_1, jax.sharding.PartitionSpec())
    m_tp = ev_tp(jax.device_put(state, state_shardings(cfg, model, mesh_tp)),
                 jax.device_put(batch, batch_sharding(mesh_tp)))
    m_1 = ev_1(jax.device_put(state, repl_1),
               jax.device_put(batch, batch_sharding(mesh_1)))
    np.testing.assert_allclose(float(m_tp["ce_sum"]), float(m_1["ce_sum"]), rtol=1e-5)


def test_tp_packed_train_matches_single_device():
    """Sequence packing x TP: a packed train step on a (4 data x 2 model)
    mesh == single-device packed step. The packed extras (src_seg/tgt_seg/
    seg_first/seg_last/seg_mask, (B, K, D) img) ride the data axis like the
    token arrays; vocab shards never see segment structure."""
    from dataclasses import replace

    from variational_mmt_tpu.data.dataset import BinarizedDataset
    from variational_mmt_tpu.data.packing import PackedBucketIterator

    rng = np.random.default_rng(7)
    n = 48
    src = [rng.integers(4, V, rng.integers(3, 12)).astype(np.int32)
           for _ in range(n)]
    tgt = [rng.integers(4, V, rng.integers(3, 12)).astype(np.int32)
           for _ in range(n)]
    feats = rng.standard_normal((n, 16)).astype(np.float32)
    cfg = tp_cfg()
    cfg = replace(cfg, train=replace(cfg.train, pack=True, pack_segments=3))
    model = build_model(cfg.model)
    it = PackedBucketIterator(BinarizedDataset(src, tgt), batch_size=8,
                              buckets=[16], img_feats=feats, seed=2,
                              max_segments=3)
    pb = next(it.epoch(0))
    batch = {
        "src": jax.numpy.asarray(pb.src),
        "tgt_in": jax.numpy.asarray(pb.tgt_in),
        "tgt_out": jax.numpy.asarray(pb.tgt_out),
        "src_seg": jax.numpy.asarray(pb.src_seg),
        "tgt_seg": jax.numpy.asarray(pb.tgt_seg),
        "seg_first": jax.numpy.asarray(pb.seg_first),
        "seg_last": jax.numpy.asarray(pb.seg_last),
        "seg_mask": jax.numpy.asarray(pb.seg_mask),
        "img": jax.numpy.asarray(pb.img),
    }

    mesh_tp = make_mesh_2d(4, 2)
    mesh_1 = make_mesh(1)
    state_tp = create_train_state(cfg, model)
    state_1 = create_train_state(cfg, model)
    step_tp = make_train_step(cfg, model, mesh_tp)
    step_1 = make_train_step(cfg, model, mesh_1)
    b_tp = jax.device_put(batch, batch_sharding(mesh_tp))
    b_1 = jax.device_put(batch, batch_sharding(mesh_1))
    for _ in range(2):
        state_tp, m_tp = step_tp(state_tp, b_tp)
        state_1, m_1 = step_1(state_1, b_1)
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_1["loss"]),
                               rtol=1e-5)
    assert float(m_tp["n_sents"]) == float(m_1["n_sents"]) > 8  # packed rows
    for p_tp, p_1 in zip(jax.tree.leaves(state_tp.params),
                         jax.tree.leaves(state_1.params)):
        np.testing.assert_allclose(np.asarray(p_tp), np.asarray(p_1),
                                   rtol=2e-3, atol=1e-4)


def test_tp_vocab_divisibility_error():
    cfg = tp_cfg()
    cfg.model.src_vocab_size = 30  # not divisible by 4
    with pytest.raises(ValueError, match="divisible by the tensor-parallel"):
        validate_tp_divisibility(cfg.model, 4)


def test_trainer_accepts_tp_mesh():
    """Trainer wiring: a (2 data x 2 model) mesh trains end-to-end and the
    batch divisibility check uses the DATA axis only."""
    from variational_mmt_tpu.data.dataset import BucketIterator, binarize

    rng = np.random.default_rng(0)
    n = 48
    src = [list(rng.integers(4, V, rng.integers(4, 8))) for _ in range(n)]
    tgt = [list(rng.integers(4, V, rng.integers(4, 8))) for _ in range(n)]
    ds = binarize(src, tgt)
    cfg = tp_cfg()
    cfg.train.batch_size = 6  # divisible by 2 data shards, NOT by 4 devices
    cfg.train.max_steps = 4
    cfg.data.buckets = [8, 12]
    it = BucketIterator(ds, cfg.train.batch_size, cfg.data.buckets,
                        img_feats=rng.standard_normal((n, 16)).astype(np.float32),
                        seed=1)
    tr = Trainer(cfg, build_model(cfg.model), it, mesh=make_mesh_2d(2, 2))
    tr.train()
    assert np.isfinite(float(tr.final_state.lr))


def test_tp_decode_matches_single_device():
    """Beam decode with TP-sharded params (vocab-parallel generator under
    the (K*V) top-k) == single-device decode, token for token."""
    from variational_mmt_tpu.config import DecodeConfig
    from variational_mmt_tpu.data.vocab import SPECIALS, Vocab
    from variational_mmt_tpu.decode.translator import Translator

    cfg = tp_cfg()
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    params = jax.tree.map(np.asarray, state.params)
    vocab = Vocab(SPECIALS + [f"w{i}" for i in range(V - 4)])
    dcfg = DecodeConfig(beam_size=3, max_length=8, batch_size=4)
    rng = np.random.default_rng(5)
    src_ids = [list(map(int, rng.integers(4, V, rng.integers(3, 7))))
               for _ in range(9)]  # odd count: pad-row masking
    feats = rng.standard_normal((9, 16)).astype(np.float32)
    tp = Translator(model, params, vocab, vocab, dcfg, buckets=[8],
                    mesh=make_mesh_2d(2, 2))
    single = Translator(model, params, vocab, vocab, dcfg, buckets=[8])
    out_tp = tp.translate_ids(src_ids, feats)
    out_s = single.translate_ids(src_ids, feats)
    for a, b in zip(out_s, out_tp):
        assert [ids for _, ids in a] == [ids for _, ids in b], (a, b)
        np.testing.assert_allclose([s for s, _ in a], [s for s, _ in b],
                                   rtol=2e-5, atol=2e-5)


def test_tp_int8_decode_matches_single_device():
    """-infer_dtype int8 composes with TP (round-5: the int8/scale pairs
    shard through the same rules — int8 takes the original tensor's spec,
    the per-output-channel scale its last-axis component). Quantization
    happens BEFORE sharding on both sides, so TP == single-device must be
    exact (same dequantized weights, pure re-layout)."""
    from variational_mmt_tpu.config import DecodeConfig
    from variational_mmt_tpu.data.vocab import SPECIALS, Vocab
    from variational_mmt_tpu.decode.translator import Translator

    cfg = tp_cfg()
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    params = jax.tree.map(np.asarray, state.params)
    vocab = Vocab(SPECIALS + [f"w{i}" for i in range(V - 4)])
    dcfg = DecodeConfig(beam_size=3, max_length=8, batch_size=4,
                        infer_dtype="int8")
    rng = np.random.default_rng(6)
    src_ids = [list(map(int, rng.integers(4, V, rng.integers(3, 7))))
               for _ in range(9)]
    feats = rng.standard_normal((9, 16)).astype(np.float32)
    tp = Translator(model, params, vocab, vocab, dcfg, buckets=[8],
                    mesh=make_mesh_2d(2, 2))
    single = Translator(model, params, vocab, vocab, dcfg, buckets=[8])
    # the generator's int8 tensor is genuinely vocab-sharded, scale too
    gk = tp.params["generator"]["kernel"]
    assert str(gk["int8"].sharding.spec) == str(
        jax.sharding.PartitionSpec(None, MODEL_AXIS)), gk["int8"].sharding
    assert MODEL_AXIS in str(gk["scale"].sharding.spec), gk["scale"].sharding
    out_tp = tp.translate_ids(src_ids, feats)
    out_s = single.translate_ids(src_ids, feats)
    for a, b in zip(out_s, out_tp):
        assert [ids for _, ids in a] == [ids for _, ids in b], (a, b)
        np.testing.assert_allclose([s for s, _ in a], [s for s, _ in b],
                                   rtol=2e-5, atol=2e-5)


def test_tp_iw_eval_matches_single_device():
    """K-sample IW-ELBO with TP-sharded params == single-device."""
    from variational_mmt_tpu.decode.iw_eval import iw_elbo_corpus

    cfg = tp_cfg()
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    params = jax.tree.map(np.asarray, state.params)
    batch = tp_batch(B=8)
    key = jax.random.PRNGKey(3)
    tp = iw_elbo_corpus(model, params, [batch], 3, key, mesh=make_mesh_2d(2, 2))
    single = iw_elbo_corpus(model, params, [batch], 3, key)
    np.testing.assert_allclose(tp["iw_elbo_per_sent"],
                               single["iw_elbo_per_sent"], rtol=1e-5)


def test_tp_checkpoint_roundtrip_matches_dp(tmp_path):
    """A checkpoint saved from TP-sharded state must contain the FULL
    gathered tensors (not one shard) and decode identically to a DP-trained
    checkpoint of the same run."""
    from variational_mmt_tpu.train.checkpoint import (
        latest_checkpoint, load_checkpoint, save_checkpoint,
    )
    from variational_mmt_tpu.data.vocab import SPECIALS, Vocab

    cfg = tp_cfg()
    model = build_model(cfg.model)
    batch = tp_batch()
    vocab = Vocab(SPECIALS + [f"w{i}" for i in range(V - 4)])

    mesh_tp = make_mesh_2d(4, 2)
    state_tp = create_train_state(cfg, model)
    state_1 = create_train_state(cfg, model)
    step_tp = make_train_step(cfg, model, mesh_tp)
    step_1 = make_train_step(cfg, model, make_mesh(1))
    for _ in range(2):
        state_tp, _ = step_tp(state_tp, jax.device_put(batch, batch_sharding(mesh_tp)))
        state_1, _ = step_1(state_1, jax.device_put(batch, batch_sharding(make_mesh(1))))

    p_tp = str(tmp_path / "tp")
    save_checkpoint(p_tp, state_tp, cfg, vocab, vocab)
    state_l, cfg_l, sv_l, _, _ = load_checkpoint(latest_checkpoint(p_tp))
    # full shapes on disk (the vocab-sharded generator must be gathered)
    gk = state_l.params["generator"]["kernel"]
    assert gk.shape == (cfg.model.hidden_dim, V), gk.shape
    for a, b in zip(jax.tree.leaves(state_l.params),
                    jax.tree.leaves(state_1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)
