"""Sequence packing (data/packing.py + the packed model forward).

The load-bearing claim: a packed batch is mathematically IDENTICAL, per
sentence, to the unpacked batch of the same sentences — same encoder
states, same latents, same per-sentence ELBO terms, same parameter
gradients. Everything here runs the f32 XLA path on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from variational_mmt_tpu.config import Config, ModelConfig, TrainConfig
from variational_mmt_tpu.data.dataset import BinarizedDataset
from variational_mmt_tpu.data.packing import PackedBatch, PackedBucketIterator
from variational_mmt_tpu.data.vocab import BOS, EOS, PAD
from variational_mmt_tpu.models.model import VMMTModel, build_model, generator_params, init_params
from variational_mmt_tpu.train.loss import compute_loss

V = 50
D_IMG = 16


def _mcfg(**kw):
    base = dict(
        model_type="vmmt_c", src_vocab_size=V, tgt_vocab_size=V,
        emb_dim=12, hidden_dim=16, enc_layers=2, dec_layers=2,
        latent_dim=6, img_feat_dim=D_IMG, dropout=0.0, word_dropout=0.0,
        compute_dtype="float32",
    )
    base.update(kw)
    return ModelConfig(**base)


def _sentences(rng, n, lo=3, hi=9):
    out = []
    for _ in range(n):
        ls = int(rng.integers(lo, hi))
        lt = int(rng.integers(lo, hi))
        out.append((rng.integers(4, V, ls).astype(np.int32),
                    rng.integers(4, V, lt).astype(np.int32)))
    return out


def _unpacked_batch(sents, L):
    n = len(sents)
    src = np.full((n, L), PAD, np.int32)
    tgt_in = np.full((n, L), PAD, np.int32)
    tgt_out = np.full((n, L), PAD, np.int32)
    for r, (s, t) in enumerate(sents):
        src[r, : len(s)] = s
        tgt_in[r, 0] = BOS
        tgt_in[r, 1 : 1 + len(t)] = t
        tgt_out[r, : len(t)] = t
        tgt_out[r, len(t)] = EOS
    return src, tgt_in, tgt_out


def _packed_batch(sents, rows, L, K, img=None):
    """Hand-pack `sents` by explicit row assignment (list of lists of
    sentence indices)."""
    B = len(rows)
    src = np.full((B, L), PAD, np.int32)
    tgt_in = np.full((B, L), PAD, np.int32)
    tgt_out = np.full((B, L), PAD, np.int32)
    src_seg = np.full((B, L), -1, np.int32)
    tgt_seg = np.full((B, L), -1, np.int32)
    seg_first = np.zeros((B, K), np.int32)
    seg_last = np.zeros((B, K), np.int32)
    seg_mask = np.zeros((B, K), np.float32)
    img_arr = np.zeros((B, K, D_IMG), np.float32) if img is not None else None
    for r, segs in enumerate(rows):
        sp = tp = 0
        for k, i in enumerate(segs):
            s, t = sents[i]
            src[r, sp : sp + len(s)] = s
            src_seg[r, sp : sp + len(s)] = k
            seg_first[r, k] = sp
            seg_last[r, k] = sp + len(s) - 1
            tgt_in[r, tp] = BOS
            tgt_in[r, tp + 1 : tp + 1 + len(t)] = t
            tgt_out[r, tp : tp + len(t)] = t
            tgt_out[r, tp + len(t)] = EOS
            tgt_seg[r, tp : tp + len(t) + 1] = k
            if img is not None:
                img_arr[r, k] = img[i]
            seg_mask[r, k] = 1.0
            sp += len(s)
            tp += len(t) + 1
    return dict(src=src, tgt_in=tgt_in, tgt_out=tgt_out, src_seg=src_seg,
                tgt_seg=tgt_seg, seg_first=seg_first, seg_last=seg_last,
                seg_mask=seg_mask, img=img_arr), seg_mask


def _loss_unpacked(model, params, sents, img, cfg, L):
    src, tgt_in, tgt_out = _unpacked_batch(sents, L)
    out = model.apply(
        {"params": params}, jnp.asarray(src), jnp.asarray(tgt_in),
        None if img is None else jnp.asarray(img),
        deterministic=True, sample=False, tgt_out=jnp.asarray(tgt_out),
    )
    mask = np.ones((len(sents),), np.float32)
    return compute_loss(
        out, jnp.asarray(tgt_out), jnp.asarray(mask),
        None if img is None else jnp.asarray(img),
        cfg.model, cfg.train, jnp.int32(0),
        generator_params=(generator_params(params, cfg.model)
                          if cfg.model.fused_ce else None),
    )


def _loss_packed(model, params, pb, seg_mask, cfg):
    out = model.apply(
        {"params": params}, jnp.asarray(pb["src"]), jnp.asarray(pb["tgt_in"]),
        jnp.asarray(pb["src_seg"]), jnp.asarray(pb["tgt_seg"]),
        jnp.asarray(pb["seg_first"]), jnp.asarray(pb["seg_last"]),
        None if pb["img"] is None else jnp.asarray(pb["img"]),
        deterministic=True, sample=False, tgt_out=jnp.asarray(pb["tgt_out"]),
        method=VMMTModel.forward_packed,
    )
    B, K = seg_mask.shape
    img_flat = (None if pb["img"] is None
                else jnp.asarray(pb["img"].reshape(B * K, -1)))
    return compute_loss(
        out, jnp.asarray(pb["tgt_out"]), jnp.asarray(seg_mask.reshape(-1)),
        img_flat, cfg.model, cfg.train, jnp.int32(0),
        generator_params=(generator_params(params, cfg.model)
                          if cfg.model.fused_ce else None),
        tgt_seg=jnp.asarray(pb["tgt_seg"]),
    )


@pytest.mark.parametrize("model_type,use_img,z_cond,input_feed,fused_ce", [
    ("vmmt_c", True, "init", True, False),
    ("vmmt_c", True, "init+input", True, True),
    ("vmmt_f", True, "init", True, False),
    ("nmt", False, "init", False, False),
])
def test_packed_equals_unpacked_loss_and_grads(model_type, use_img, z_cond,
                                               input_feed, fused_ce):
    """Packed loss == unpacked loss on the same sentences, and the grads
    w.r.t. every parameter match."""
    rng = np.random.default_rng(0)
    sents = _sentences(rng, 5)
    img = rng.standard_normal((5, D_IMG)).astype(np.float32) if use_img else None
    mcfg = _mcfg(model_type=model_type, z_cond=z_cond, input_feed=input_feed,
                 fused_ce=fused_ce,
                 use_img_predict=use_img and model_type != "nmt",
                 img_feat_dim=D_IMG if use_img else 0)
    cfg = Config(model=mcfg, train=TrainConfig(batch_size=4, pack=True))
    model = build_model(mcfg)
    params = init_params(model, jax.random.PRNGKey(1))

    L = 24
    # rows: [s0, s1], [s2, s3, s4] — mixed segment counts, K=3
    pb, seg_mask = _packed_batch(sents, [[0, 1], [2, 3, 4]], L, 3, img)

    def up(p):
        return _loss_unpacked(model, p, sents, img, cfg, L)[0]

    def pk(p):
        return _loss_packed(model, p, pb, seg_mask, cfg)[0]

    # normalization check: mean-per-sentence losses must agree even though
    # row counts differ (5 unpacked rows vs 2 packed rows / 5 segments)
    lu, mu = _loss_unpacked(model, params, sents, img, cfg, L)
    lp, mp = _loss_packed(model, params, pb, seg_mask, cfg)
    assert np.isclose(float(lu), float(lp), rtol=2e-5), (float(lu), float(lp))
    for k in ("ce_sum", "kl_sum", "img_loss_sum", "n_tokens", "n_sents",
              "n_correct"):
        assert np.isclose(float(mu[k]), float(mp[k]), rtol=2e-5), (
            k, float(mu[k]), float(mp[k]))

    gu = jax.grad(up)(params)
    gp = jax.grad(pk)(params)
    flat_u, _ = jax.tree.flatten(gu)
    flat_p, _ = jax.tree.flatten(gp)
    for a, b in zip(flat_u, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_packed_encoder_segment_isolation():
    """Encoder outputs for a segment match encoding that sentence alone, and
    per-segment finals match the lone sentence's finals."""
    rng = np.random.default_rng(2)
    sents = _sentences(rng, 3)
    mcfg = _mcfg(model_type="nmt", img_feat_dim=0)
    model = build_model(mcfg)
    params = init_params(model, jax.random.PRNGKey(3))
    L = 24

    pb, seg_mask = _packed_batch(sents, [[0, 1, 2]], L, 3)
    src_seg = jnp.asarray(pb["src_seg"])
    mem_p, fin_p, _, _ = model.apply(
        {"params": params}, jnp.asarray(pb["src"]),
        method=lambda m, s: (
            m.encoder(m.src_embed(s), (src_seg >= 0).astype(jnp.float32),
                      deterministic=True, seg=src_seg,
                      seg_bounds=(jnp.asarray(pb["seg_first"]),
                                  jnp.asarray(pb["seg_last"]))) + (None, None)),
    )
    pos = 0
    for k, (s, _t) in enumerate(sents):
        lone = np.full((1, L), PAD, np.int32)
        lone[0, : len(s)] = s
        mem_u, fin_u, _, _ = model.apply(
            {"params": params}, jnp.asarray(lone),
            method=VMMTModel.encode,
        )
        np.testing.assert_allclose(
            np.asarray(mem_p[0, pos : pos + len(s)]),
            np.asarray(mem_u[0, : len(s)]), rtol=1e-5, atol=1e-6)
        for layer in range(len(fin_u)):
            np.testing.assert_allclose(
                np.asarray(fin_p[layer][0, k]), np.asarray(fin_u[layer][0]),
                rtol=1e-5, atol=1e-6)
        pos += len(s)


def test_packed_attention_stays_in_segment():
    """Alignments from the packed decoder are zero outside the target
    position's own source segment."""
    rng = np.random.default_rng(4)
    sents = _sentences(rng, 4)
    img = rng.standard_normal((4, D_IMG)).astype(np.float32)
    mcfg = _mcfg()
    model = build_model(mcfg)
    params = init_params(model, jax.random.PRNGKey(5))
    pb, seg_mask = _packed_batch(sents, [[0, 1], [2, 3]], 24, 2, img)
    out = model.apply(
        {"params": params}, jnp.asarray(pb["src"]), jnp.asarray(pb["tgt_in"]),
        jnp.asarray(pb["src_seg"]), jnp.asarray(pb["tgt_seg"]),
        jnp.asarray(pb["seg_first"]), jnp.asarray(pb["seg_last"]),
        jnp.asarray(pb["img"]), deterministic=True, sample=False,
        tgt_out=jnp.asarray(pb["tgt_out"]), method=VMMTModel.forward_packed,
    )
    aligns = np.asarray(out["aligns"])  # (B, T, S)
    same = (pb["tgt_seg"][:, :, None] == pb["src_seg"][:, None, :]) & (
        pb["src_seg"][:, None, :] >= 0)
    valid_t = pb["tgt_seg"] >= 0
    off_seg = aligns * (~same) * valid_t[:, :, None]
    assert np.abs(off_seg).max() < 1e-6


def test_packer_covers_every_example_once():
    """The greedy packer assigns every corpus example to exactly one
    segment, respects capacities, and keeps index alignment."""
    rng = np.random.default_rng(6)
    n = 257
    src = [rng.integers(4, V, rng.integers(3, 30)).astype(np.int32) for _ in range(n)]
    tgt = [rng.integers(4, V, rng.integers(3, 30)).astype(np.int32) for _ in range(n)]
    feats = rng.standard_normal((n, D_IMG)).astype(np.float32)
    ds = BinarizedDataset(src, tgt)
    it = PackedBucketIterator(ds, batch_size=16, buckets=[16, 32],
                              img_feats=feats, seed=7, max_segments=4)
    seen = []
    for pb in it.epoch(0):
        assert isinstance(pb, PackedBatch)
        B, L = pb.src.shape
        assert (B, L) == (16, 32)
        K = pb.seg_mask.shape[1]
        assert K == 4
        for r in range(B):
            for k in range(K):
                if pb.seg_mask[r, k] == 0:
                    continue
                i = int(pb.indices[r, k])
                seen.append(i)
                # src segment content matches the corpus line (truncated)
                f, l = int(pb.seg_first[r, k]), int(pb.seg_last[r, k])
                np.testing.assert_array_equal(pb.src[r, f : l + 1], src[i][: l + 1 - f])
                assert (pb.src_seg[r, f : l + 1] == k).all()
                # image row rides with its segment
                np.testing.assert_array_equal(pb.img[r, k], feats[i])
                # target segment: BOS + y ... y + EOS
                tpos = np.where(pb.tgt_seg[r] == k)[0]
                assert pb.tgt_in[r, tpos[0]] == BOS
                assert pb.tgt_out[r, tpos[-1]] == EOS
    assert sorted(seen) == list(range(n))


def test_packing_fill_beats_unpacked():
    """On a short-sentence corpus the packed stream carries materially more
    real tokens per row than the padded unpacked layout."""
    rng = np.random.default_rng(8)
    n = 512
    src = [rng.integers(4, V, rng.integers(5, 20)).astype(np.int32) for _ in range(n)]
    tgt = [rng.integers(4, V, rng.integers(5, 20)).astype(np.int32) for _ in range(n)]
    ds = BinarizedDataset(src, tgt)
    it = PackedBucketIterator(ds, batch_size=32, buckets=[32], seed=0,
                              max_segments=4)
    toks = rows = 0
    for pb in it.epoch(0):
        toks += pb.n_tokens
        rows += pb.src.shape[0]
    fill = toks / (rows * 32)
    assert fill > 0.55, fill  # unpacked at these lengths is ~0.38


def test_trainer_runs_packed_end_to_end():
    """Two jitted packed train steps through make_train_step: loss finite,
    params move, metrics count segments (not rows)."""
    from variational_mmt_tpu.train.trainer import create_train_state, make_train_step

    rng = np.random.default_rng(9)
    n = 64
    src = [rng.integers(4, V, rng.integers(3, 14)).astype(np.int32) for _ in range(n)]
    tgt = [rng.integers(4, V, rng.integers(3, 14)).astype(np.int32) for _ in range(n)]
    feats = rng.standard_normal((n, D_IMG)).astype(np.float32)
    ds = BinarizedDataset(src, tgt)
    mcfg = _mcfg(dropout=0.1, word_dropout=0.1, use_img_predict=True)
    cfg = Config(model=mcfg,
                 train=TrainConfig(batch_size=8, pack=True, pack_segments=4,
                                   learning_rate=1e-3))
    model = build_model(mcfg)
    state = create_train_state(cfg, model)
    step = make_train_step(cfg, model)
    it = PackedBucketIterator(ds, batch_size=8, buckets=[24],
                              img_feats=feats, seed=1, max_segments=4)
    p0 = jax.tree.leaves(state.params)[0].copy()
    n_sents = 0
    for i, pb in enumerate(it.epoch(0)):
        batch = {
            "src": jnp.asarray(pb.src), "tgt_in": jnp.asarray(pb.tgt_in),
            "tgt_out": jnp.asarray(pb.tgt_out),
            "src_seg": jnp.asarray(pb.src_seg),
            "tgt_seg": jnp.asarray(pb.tgt_seg),
            "seg_first": jnp.asarray(pb.seg_first),
            "seg_last": jnp.asarray(pb.seg_last),
            "seg_mask": jnp.asarray(pb.seg_mask),
            "img": jnp.asarray(pb.img),
        }
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))
        n_sents += int(float(m["n_sents"]))
        if i == 1:
            break
    assert n_sents > 16  # more sentences than rows: packing worked
    assert not np.allclose(p0, jax.tree.leaves(state.params)[0])


def test_native_packer_matches_python():
    """The C++ packer (native/packer.cpp) must be array-identical to the
    Python PackedBucketIterator on every field of every batch — the Python
    path is the behavioral spec, the native path is the same algorithm."""
    from variational_mmt_tpu import native

    if not native.available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(3)
    n = 700
    src = [rng.integers(4, V, rng.integers(1, 30)).astype(np.int32)
           for _ in range(n)]
    tgt = [rng.integers(4, V, rng.integers(1, 30)).astype(np.int32)
           for _ in range(n)]
    feats = rng.standard_normal((n, D_IMG)).astype(np.float32)
    for K, B, L in ((4, 16, 24), (1, 8, 16), (7, 8, 32)):
        ds = BinarizedDataset(src, tgt)
        it_py = PackedBucketIterator(ds, B, [L], img_feats=feats, seed=5,
                                     max_segments=K, use_native=False)
        it_cc = PackedBucketIterator(ds, B, [L], img_feats=feats, seed=5,
                                     max_segments=K, use_native=True)
        py = list(it_py.epoch(2))
        cc = list(it_cc.epoch(2))
        assert len(py) == len(cc) and len(py) > 1
        for pb, cb in zip(py, cc):
            for f in ("src", "tgt_in", "tgt_out", "src_seg", "tgt_seg",
                      "seg_first", "seg_last", "indices", "seg_mask", "img"):
                np.testing.assert_array_equal(
                    getattr(pb, f), getattr(cb, f), err_msg=f"{f} K={K}")


def test_native_packer_rejects_large_k():
    from variational_mmt_tpu import native

    if not native.available():
        pytest.skip("no C++ toolchain")
    ds = BinarizedDataset([np.array([5, 6], np.int32)],
                          [np.array([7], np.int32)])
    it = PackedBucketIterator(ds, 4, [16], max_segments=32)
    assert not it.use_native  # auto-falls back to Python past the C++ cap
    assert len(list(it.epoch(0))) == 1
