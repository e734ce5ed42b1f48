"""Training runtime: overfit sanity, determinism, data-parallel equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from variational_mmt_tpu.config import Config, ModelConfig, TrainConfig
from variational_mmt_tpu.models.model import build_model
from variational_mmt_tpu.parallel.mesh import batch_sharding, make_mesh
from variational_mmt_tpu.train.trainer import create_train_state, make_eval_step, make_train_step


def tiny_cfg(model_type="vmmt_c", **train_kw):
    return Config(
        model=ModelConfig(
            model_type=model_type, src_vocab_size=30, tgt_vocab_size=30, emb_dim=16,
            hidden_dim=32, enc_layers=1, dec_layers=2, latent_dim=4, img_feat_dim=16,
            dropout=0.1, word_dropout=0.1, compute_dtype="float32",
        ),
        train=TrainConfig(learning_rate=3e-3, kl_anneal_steps=20, **train_kw),
    )


def make_batch(B=16, L=8, img_dim=16, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(4, 30, (B, L)).astype(np.int32)
    src[:, -1] = 0
    tgt = rng.integers(4, 30, (B, L)).astype(np.int32)
    tgt_in = tgt.copy()
    tgt_in[:, 0] = 2
    return {
        "src": jnp.array(src),
        "tgt_in": jnp.array(tgt_in),
        "tgt_out": jnp.array(tgt),
        "example_mask": jnp.ones((B,), jnp.float32),
        "img": jnp.array(rng.standard_normal((B, img_dim)), jnp.float32),
    }


@pytest.mark.parametrize("model_type", ["nmt", "vmmt_f", "vmmt_c"])
def test_overfit_single_batch(model_type):
    cfg = tiny_cfg(model_type)
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    step = make_train_step(cfg, model)
    batch = make_batch()
    losses = []
    for _ in range(80):
        state, m = step(state, batch)
        losses.append(float(m["ce_sum"]) / float(m["n_tokens"]))
    # genuinely memorizing, not "barely learning": measured ratio after 80
    # single-batch steps is ~0.16 for all three families; 0.35 leaves 2x
    # headroom while failing any model that merely drifts downhill
    assert losses[-1] < losses[0] * 0.35, f"{model_type}: no learning {losses[0]} -> {losses[-1]}"
    assert np.isfinite(losses).all()


def test_determinism_same_seed():
    cfg = tiny_cfg()
    model = build_model(cfg.model)
    batch = make_batch()

    def run():
        state = create_train_state(cfg, model)
        step = make_train_step(cfg, model)
        out = []
        for _ in range(5):
            state, m = step(state, batch)
            out.append(float(m["loss"]))
        return out

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)


def test_data_parallel_matches_single_device():
    """Same global batch, 8-way sharded vs single device -> same loss and
    (near-)same params after a step. This is the DP-correctness test
    SURVEY.md §4 calls for."""
    cfg = tiny_cfg()
    cfg.model.dropout = 0.0
    cfg.model.word_dropout = 0.0
    model = build_model(cfg.model)
    batch = make_batch(B=16)

    mesh8 = make_mesh(8)
    mesh1 = make_mesh(1)
    state8 = create_train_state(cfg, model)
    state1 = create_train_state(cfg, model)
    # identical init (same seed)
    step8 = make_train_step(cfg, model, mesh8)
    step1 = make_train_step(cfg, model, mesh1)
    b8 = jax.device_put(batch, batch_sharding(mesh8))
    b1 = jax.device_put(batch, batch_sharding(mesh1))
    state8, m8 = step8(state8, b8)
    state1, m1 = step1(state1, b1)
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    # all-reduce reduction order differs from the single-device sum; adam's
    # per-coordinate normalization amplifies ~1e-7 grad noise to ~1e-5 in params
    for p8, p1 in zip(jax.tree.leaves(state8.params), jax.tree.leaves(state1.params)):
        np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), rtol=1e-3, atol=2e-5)


def test_eval_step_deterministic():
    cfg = tiny_cfg()
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    ev = make_eval_step(cfg, model)
    batch = make_batch()
    m1 = ev(state, batch)
    m2 = ev(state, batch)
    assert float(m1["ce_sum"]) == float(m2["ce_sum"])


def test_example_mask_zeroes_padding_rows():
    """A padded example row must contribute nothing to loss/metrics."""
    cfg = tiny_cfg()
    cfg.model.dropout = 0.0
    cfg.model.word_dropout = 0.0
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    ev = make_eval_step(cfg, model)
    b = make_batch(B=8)
    m_full = ev(state, b)
    # zero out last 4 rows via example_mask; metrics must equal first-4-only
    mask = np.ones(8, np.float32)
    mask[4:] = 0
    b_masked = dict(b, example_mask=jnp.array(mask))
    b_small = {k: (v[:4] if k != "example_mask" else jnp.ones(4)) for k, v in b.items()}
    m_masked = ev(state, b_masked)
    m_small = ev(state, b_small)
    np.testing.assert_allclose(float(m_masked["ce_sum"]), float(m_small["ce_sum"]), rtol=1e-4)
    assert float(m_masked["n_sents"]) == 4.0
    assert float(m_masked["n_tokens"]) == float(m_small["n_tokens"])


def test_grad_clipping_applied():
    # use SGD: adam's per-coordinate normalization undoes the clip scale
    cfg = tiny_cfg(max_grad_norm=1e-6, optimizer="sgd")
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    step = make_train_step(cfg, model)
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    state, _ = step(state, make_batch())
    # params barely move under the clip
    max_delta = max(
        float(np.abs(np.asarray(a) - b).max())
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(p0))
    )
    assert max_delta < 1e-4


def test_grad_accumulation_matches_full_batch():
    """grad_accum=2 over a 16-batch == single step over the same batch
    (equal-size micros; dropout off so the math is deterministic)."""
    batch = make_batch(B=16)
    # nmt (no latent): exact equality (latent sampling uses per-micro keys)
    cfg_n = tiny_cfg("nmt")
    cfg_n.model.dropout = 0.0
    cfg_n.model.word_dropout = 0.0
    cfg_n2 = tiny_cfg("nmt", grad_accum=2)
    cfg_n2.model.dropout = 0.0
    cfg_n2.model.word_dropout = 0.0
    m = build_model(cfg_n.model)
    sa = create_train_state(cfg_n, m)
    sb = create_train_state(cfg_n2, m)
    sa2, ma = make_train_step(cfg_n, m)(sa, batch)
    sb2, mb = make_train_step(cfg_n2, m)(sb, batch)
    np.testing.assert_allclose(float(ma["ce_sum"]), float(mb["ce_sum"]), rtol=1e-5)
    assert float(mb["n_tokens"]) == float(ma["n_tokens"])
    for a, b in zip(jax.tree.leaves(sa2.params), jax.tree.leaves(sb2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_batch_size_mesh_divisibility_error():
    from variational_mmt_tpu.train.trainer import Trainer
    from variational_mmt_tpu.data.dataset import binarize, BucketIterator

    cfg = tiny_cfg()
    cfg.train.batch_size = 30  # not divisible by the 8-device mesh
    ds = binarize([[4, 5]] * 10, [[6, 7]] * 10)
    it = BucketIterator(ds, 30, [8])
    with pytest.raises(ValueError, match="divisible"):
        Trainer(cfg, build_model(cfg.model), it, mesh=make_mesh(8))


def test_valid_iw_reported():
    from variational_mmt_tpu.data.dataset import binarize, BucketIterator
    from variational_mmt_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    n = 16
    src = [list(rng.integers(4, 30, 6)) for _ in range(n)]
    tgt = [list(rng.integers(4, 30, 6)) for _ in range(n)]
    feats = rng.standard_normal((n, 16)).astype(np.float32)
    ds = binarize(src, tgt)
    cfg = tiny_cfg(max_steps=2, valid_every=2, report_every=10, checkpoint_every=10**9)
    it = BucketIterator(ds, 8, [8], img_feats=feats, seed=0)
    vi = BucketIterator(ds, 8, [8], img_feats=feats, shuffle=False)
    tr = Trainer(cfg, build_model(cfg.model), it, vi, mesh=make_mesh(8), valid_iw=3)
    tr.train()
    assert tr.history and "iw_elbo" in tr.history[-1]
    assert np.isfinite(tr.history[-1]["iw_elbo"])
    # joint bound (includes log p(v|z)) sits below the text-only ELBO by
    # roughly the image log-density scale; just sanity-bound the gap
    assert tr.history[-1]["iw_elbo"] < tr.history[-1]["elbo"]


def test_device_resident_feature_table_matches_host_gather():
    """Trainer with a device-resident feature table == host-gathered batches."""
    from variational_mmt_tpu.data.dataset import binarize, BucketIterator
    from variational_mmt_tpu.train.trainer import Trainer

    rng = np.random.default_rng(1)
    n = 16
    src = [list(rng.integers(4, 30, 6)) for _ in range(n)]
    tgt = [list(rng.integers(4, 30, 6)) for _ in range(n)]
    feats = rng.standard_normal((n, 16)).astype(np.float32)
    ds = binarize(src, tgt)
    cfg = tiny_cfg(max_steps=3, valid_every=3, report_every=10, checkpoint_every=10**9)
    cfg.model.dropout = 0.0
    cfg.model.word_dropout = 0.0

    # host-gather path
    it_h = BucketIterator(ds, 8, [8], img_feats=feats, seed=0)
    vi_h = BucketIterator(ds, 8, [8], img_feats=feats, shuffle=False)
    tr_h = Trainer(cfg, build_model(cfg.model), it_h, vi_h, mesh=make_mesh(8))
    tr_h.train()
    # device-table path
    it_d = BucketIterator(ds, 8, [8], seed=0)
    vi_d = BucketIterator(ds, 8, [8], shuffle=False)
    tr_d = Trainer(cfg, build_model(cfg.model), it_d, vi_d, mesh=make_mesh(8),
                   train_feats=feats, valid_feats=feats)
    tr_d.train()
    np.testing.assert_allclose(tr_h.history[-1]["ppl"], tr_d.history[-1]["ppl"], rtol=1e-4)
    np.testing.assert_allclose(tr_h.history[-1]["kl"], tr_d.history[-1]["kl"], rtol=1e-3, atol=1e-5)


def test_steps_per_call_matches_single_dispatch():
    """steps_per_call=2 == two single steps (same batches, same PRNG chain)."""
    from variational_mmt_tpu.data.dataset import binarize, BucketIterator
    from variational_mmt_tpu.train.trainer import Trainer

    rng = np.random.default_rng(3)
    n = 32
    src = [list(rng.integers(4, 30, 6)) for _ in range(n)]
    tgt = [list(rng.integers(4, 30, 6)) for _ in range(n)]
    ds = binarize(src, tgt)

    def run(spc):
        cfg = tiny_cfg(max_steps=4, report_every=4, valid_every=4,
                       checkpoint_every=4, steps_per_call=spc)
        cfg.model.img_feat_dim = 0
        cfg.model.use_img_predict = False
        cfg.model.dropout = 0.0
        cfg.model.word_dropout = 0.0
        it = BucketIterator(ds, 8, [8], seed=0)
        vi = BucketIterator(ds, 8, [8], shuffle=False)
        tr = Trainer(cfg, build_model(cfg.model), it, vi, mesh=make_mesh(8))
        tr.train()
        return tr.history[-1]

    a, b = run(1), run(2)
    # single bucket -> identical batch order -> identical PRNG chain -> same result
    np.testing.assert_allclose(a["ppl"], b["ppl"], rtol=1e-5)
    np.testing.assert_allclose(a["xent"], b["xent"], rtol=1e-5)


def test_intervals_fire_when_misaligned_with_spc():
    """valid_every need not divide steps_per_call: triggers fire on interval
    CROSSINGS, so validation happens even when step never hits an exact
    multiple (also covers resuming from a step misaligned with spc)."""
    from variational_mmt_tpu.data.dataset import binarize, BucketIterator
    from variational_mmt_tpu.train.trainer import Trainer

    rng = np.random.default_rng(7)
    src = [list(rng.integers(4, 30, 6)) for _ in range(48)]
    tgt = [list(rng.integers(4, 30, 6)) for _ in range(48)]
    ds = binarize(src, tgt)
    # dispatches land on steps 3 and 6; valid_every=4 would never fire with
    # modulo logic (6 % 4 != 0) but must fire once via the 4-boundary crossing
    cfg = tiny_cfg(max_steps=6, steps_per_call=3, report_every=100,
                   valid_every=4, checkpoint_every=10**9)
    cfg.model.img_feat_dim = 0
    cfg.model.use_img_predict = False
    it = BucketIterator(ds, 8, [8], seed=0)
    vi = BucketIterator(ds, 8, [8], shuffle=False)
    tr = Trainer(cfg, build_model(cfg.model), it, vi, mesh=make_mesh(8))
    tr.train()
    assert len(tr.history) == 1 and tr.history[0]["step"] == 6


def test_stacked_dispatch_flushes_rare_bucket_each_epoch():
    """A bucket shape producing fewer than steps_per_call batches per epoch
    must still train every one of its batches within that epoch (via the
    single-step flush at the epoch boundary), not strand them across
    epochs."""
    from variational_mmt_tpu.data.dataset import binarize, BucketIterator
    from variational_mmt_tpu.train.trainer import Trainer

    rng = np.random.default_rng(9)
    # 32 short examples -> 4 batches in bucket 8; 8 long -> ONE batch in
    # bucket 16 per epoch (< spc=4, so it only ever trains via the flush)
    src = [list(rng.integers(4, 30, 4)) for _ in range(32)] + \
          [list(rng.integers(4, 30, 12)) for _ in range(8)]
    tgt = [list(rng.integers(4, 30, 4)) for _ in range(32)] + \
          [list(rng.integers(4, 30, 12)) for _ in range(8)]
    ds = binarize(src, tgt)
    cfg = tiny_cfg(max_steps=10, report_every=10**6, valid_every=10**9,
                   checkpoint_every=10**9, steps_per_call=4)
    cfg.model.img_feat_dim = 0
    cfg.model.use_img_predict = False
    it = BucketIterator(ds, 8, [8, 16], seed=0)
    tr = Trainer(cfg, build_model(cfg.model), it, mesh=make_mesh(8))
    stats = tr.train()
    # 5 steps/epoch (4 stacked + 1 flushed) -> exactly 2 full epochs
    assert int(tr.final_state.step) == 10
    # every target token of both buckets trained twice:
    # 32 * (4+1) + 8 * (12+1) = 264 tokens per epoch
    assert stats.n_words == 2 * 264


def test_steps_per_call_multi_bucket():
    """Shape grouping: stacked dispatch works when batches span buckets."""
    from variational_mmt_tpu.data.dataset import binarize, BucketIterator
    from variational_mmt_tpu.train.trainer import Trainer

    rng = np.random.default_rng(5)
    # half short, half long examples -> two bucket shapes interleaved
    src = [list(rng.integers(4, 30, 4)) for _ in range(32)] + \
          [list(rng.integers(4, 30, 12)) for _ in range(32)]
    tgt = [list(rng.integers(4, 30, 4)) for _ in range(32)] + \
          [list(rng.integers(4, 30, 12)) for _ in range(32)]
    ds = binarize(src, tgt)
    cfg = tiny_cfg(max_steps=8, report_every=4, valid_every=8,
                   checkpoint_every=8, steps_per_call=2)
    cfg.model.img_feat_dim = 0
    cfg.model.use_img_predict = False
    it = BucketIterator(ds, 8, [8, 16], seed=0)
    vi = BucketIterator(ds, 8, [8, 16], shuffle=False)
    tr = Trainer(cfg, build_model(cfg.model), it, vi, mesh=make_mesh(8))
    stats = tr.train()
    assert int(tr.final_state.step) >= 8
    assert np.isfinite(tr.history[-1]["ppl"])


def test_skip_nonfinite_guards_params():
    """A batch producing non-finite grads must leave params and opt state
    untouched (and be counted); a clean batch must still train."""
    cfg = tiny_cfg(skip_nonfinite=True)
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    step = make_train_step(cfg, model)

    bad = make_batch()
    bad["img"] = bad["img"].at[0, 0].set(jnp.inf)  # img loss -> inf -> nan grads
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    state, m = step(state, bad)
    assert float(m["skipped_sum"]) == 1.0
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(p0)):
        np.testing.assert_array_equal(np.asarray(a), b)
    assert int(state.step) == 1  # the step counter still advances

    state, m = step(state, make_batch())
    assert float(m["skipped_sum"]) == 0.0
    moved = any(
        float(np.abs(np.asarray(a) - b).max()) > 0
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(p0))
    )
    assert moved


def test_skip_nonfinite_off_by_default():
    """The default must NOT silently drop bad batches: with skip_nonfinite
    off, a NaN batch poisons the params (proving no skip is active); with it
    on, the same batch is skipped and the params stay finite."""
    cfg = tiny_cfg()
    assert cfg.train.skip_nonfinite is False
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    bad = make_batch()
    bad = dict(bad)
    bad["img"] = bad["img"].at[0, 0].set(jnp.nan)

    step = make_train_step(cfg, model)
    poisoned, m = step(state, bad)
    assert float(m["skipped_sum"]) == 0.0
    assert not np.isfinite(np.asarray(jax.tree.leaves(poisoned.params)[0])).all()

    import dataclasses
    scfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, skip_nonfinite=True))
    sstep = make_train_step(scfg, build_model(scfg.model))
    # fresh state: the jitted step donates its input buffers
    kept, m2 = sstep(create_train_state(cfg, model), bad)
    assert float(m2["skipped_sum"]) == 1.0
    for leaf in jax.tree.leaves(kept.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_param_init_uniform_reinit():
    """-param_init r: every param tensor re-initialized uniform(-r, r); the
    model still learns from that init (reference init parity)."""
    cfg = tiny_cfg(param_init=0.1)
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    leaves = jax.tree.leaves(state.params)
    for x in leaves:
        a = np.asarray(x)
        assert a.min() >= -0.1 and a.max() <= 0.1
    # not degenerate: distinct leaves get distinct draws, wide spread
    big = max(leaves, key=lambda x: x.size)
    assert np.asarray(big).std() > 0.03
    step = make_train_step(cfg, model)
    batch = make_batch()
    losses = []
    for _ in range(30):
        state, m = step(state, batch)
        losses.append(float(m["ce_sum"]) / float(m["n_tokens"]))
    assert losses[-1] < losses[0]


def test_adagrad_optimizer_learns():
    cfg = tiny_cfg(optimizer="adagrad")
    cfg.train.learning_rate = 0.1
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    step = make_train_step(cfg, model)
    batch = make_batch()
    losses = []
    for _ in range(40):
        state, m = step(state, batch)
        losses.append(float(m["ce_sum"]) / float(m["n_tokens"]))
    assert losses[-1] < losses[0] * 0.6
    assert np.isfinite(losses).all()


def test_single_compile_per_cold_start():
    """Regression guard for the round-3 cold-start fix (VERDICT #2): a
    host-fresh state must NOT trigger a second trace/compile of the same
    train-step program on the second call. Root cause was the first call
    tracing with empty-sharding avals and the second with the jit's output
    shardings; _align_state pins the steady-state sharding up front."""
    cfg = tiny_cfg()
    model = build_model(cfg.model)
    batch = make_batch()
    mesh = make_mesh(8)
    state = create_train_state(cfg, model)
    step = make_train_step(cfg, model, mesh)
    b = jax.device_put(batch, batch_sharding(mesh))

    state, _ = step(state, b)
    state, _ = step(state, b)
    state, _ = step(state, b)
    # one lowered signature total: the host-fresh first call and the
    # donated-output steady state must present IDENTICAL avals+shardings
    # (a second signature is the double-compile bug, invisible on warm
    # persistent caches but a full recompile on every cold start)
    assert step._jit._cache_size() == 1, step._jit._cache_size()


def test_max_steps_exact_with_spc():
    """max_steps not a multiple of steps_per_call: the final stacked window
    must be split through the single-step path, landing exactly on the
    budget (previously the loop overshot by up to spc-1 optimizer steps)."""
    from variational_mmt_tpu.data.dataset import binarize, BucketIterator
    from variational_mmt_tpu.train.trainer import Trainer

    rng = np.random.default_rng(5)
    src = [list(rng.integers(4, 30, 6)) for _ in range(64)]
    tgt = [list(rng.integers(4, 30, 6)) for _ in range(64)]
    ds = binarize(src, tgt)
    cfg = tiny_cfg(max_steps=5, steps_per_call=3, report_every=100,
                   valid_every=10**9, checkpoint_every=10**9)
    cfg.model.img_feat_dim = 0
    cfg.model.use_img_predict = False
    it = BucketIterator(ds, 8, [8], seed=0)
    tr = Trainer(cfg, build_model(cfg.model), it, mesh=make_mesh(8))
    tr.train()
    assert int(tr.final_state.step) == 5


def test_grad_accum_divisibility_errors():
    """batch_size must divide by grad_accum (and each micro by the data
    devices) — a named error at construction, not a generic reshape error
    inside jit."""
    from variational_mmt_tpu.data.dataset import binarize, BucketIterator
    from variational_mmt_tpu.train.trainer import Trainer

    ds = binarize([[4, 5]] * 8, [[4, 5]] * 8)
    it = BucketIterator(ds, 8, [8], seed=0)
    cfg = tiny_cfg(max_steps=1, batch_size=8, grad_accum=3)
    cfg.model.img_feat_dim = 0
    cfg.model.use_img_predict = False
    with pytest.raises(ValueError, match="grad_accum"):
        Trainer(cfg, build_model(cfg.model), it, mesh=make_mesh(8))
    cfg2 = tiny_cfg(max_steps=1, batch_size=16, grad_accum=4)
    cfg2.model.img_feat_dim = 0
    cfg2.model.use_img_predict = False
    with pytest.raises(ValueError, match="micro-batch"):
        Trainer(cfg2, build_model(cfg2.model), it, mesh=make_mesh(8))
