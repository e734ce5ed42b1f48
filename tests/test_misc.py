"""Config round-trip, plateau scheduler, prefetcher, word dropout, stats."""

import jax
import jax.numpy as jnp
import numpy as np

from variational_mmt_tpu.config import Config, ModelConfig, TrainConfig, update_config
from variational_mmt_tpu.data.dataset import Batch
from variational_mmt_tpu.data.prefetch import prefetch
from variational_mmt_tpu.train.optim import PlateauScheduler
from variational_mmt_tpu.utils.logging import Statistics


def test_config_json_roundtrip():
    cfg = Config(model=ModelConfig(model_type="vmmt_c", latent_dim=77),
                 train=TrainConfig(learning_rate=1.5e-4, kl_anneal="sigmoid"))
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_config_ignores_unknown_keys():
    d = Config().to_dict()
    d["model"]["bogus_future_field"] = 42
    cfg = Config.from_dict(d)  # forward-compatible load
    assert cfg.model.model_type == "vmmt_f"


def test_update_config_dotted():
    cfg = Config()
    update_config(cfg, {"model.latent_dim": "64", "train.learning_rate": "0.001"})
    assert cfg.model.latent_dim == 64
    assert abs(cfg.train.learning_rate - 1e-3) < 1e-12
    try:
        update_config(cfg, {"model.nope": 1})
        assert False
    except KeyError:
        pass


def test_plateau_scheduler():
    # Reference Optim.update_learning_rate semantics: decay latches on when
    # ppl worsens vs the LAST validation OR once past start_decay_at, and
    # then fires at every subsequent validation.
    sched = PlateauScheduler(TrainConfig(lr_decay=0.5, start_decay_at=100))
    lr = 1.0
    lr = sched.update(10.0, step=5, lr=lr)   # first validation: no decay
    assert lr == 1.0
    lr = sched.update(9.0, step=20, lr=lr)   # improved vs last: no decay
    assert lr == 1.0
    lr = sched.update(9.5, step=30, lr=lr)   # worse vs last: latch + decay
    assert lr == 0.5
    lr = sched.update(8.0, step=40, lr=lr)   # improved, but latched: decay
    assert lr == 0.25
    lr = sched.update(7.0, step=150, lr=lr)  # past start_decay_at: decay
    assert lr == 0.125

    # start_decay_at <= 0 disables the step trigger entirely.
    sched2 = PlateauScheduler(TrainConfig(lr_decay=0.5, start_decay_at=0))
    lr = sched2.update(10.0, step=1000, lr=1.0)
    assert lr == 1.0
    lr = sched2.update(9.0, step=2000, lr=lr)
    assert lr == 1.0


def test_prefetch_preserves_order_and_errors():
    batches = [Batch(src=np.full((1, 2), i, np.int32), tgt_in=np.zeros((1, 2), np.int32),
                     tgt_out=np.zeros((1, 2), np.int32), indices=np.zeros(1, np.int32),
                     example_mask=np.ones(1, np.float32)) for i in range(5)]
    out = list(prefetch(iter(batches), size=2, transform=lambda b: int(b.src[0, 0])))
    assert out == [0, 1, 2, 3, 4]

    def boom():
        yield batches[0]
        raise RuntimeError("source failed")

    try:
        list(prefetch(boom(), size=2, transform=lambda b: b))
        assert False
    except RuntimeError as e:
        assert "source failed" in str(e)


def test_word_dropout_applied():
    from variational_mmt_tpu.models.model import build_model, init_params

    cfg = ModelConfig(model_type="nmt", src_vocab_size=30, tgt_vocab_size=30,
                      emb_dim=8, hidden_dim=16, enc_layers=1, dec_layers=1,
                      dropout=0.0, word_dropout=0.9, compute_dtype="float32",
                      use_img_predict=False, img_feat_dim=0)
    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    src = jnp.ones((2, 6), jnp.int32) * 5
    tgt_in = jnp.ones((2, 6), jnp.int32) * 7
    o_det = model.apply({"params": params}, src, tgt_in, None, deterministic=True, sample=False)
    o_wd = model.apply(
        {"params": params}, src, tgt_in, None, deterministic=False, sample=False,
        rngs={"dropout": jax.random.PRNGKey(1), "word_dropout": jax.random.PRNGKey(2)},
    )
    # 90% word dropout must change the logits (tokens became <unk>)
    assert not np.allclose(np.asarray(o_det["logits"]), np.asarray(o_wd["logits"]))


def test_statistics_math():
    s = Statistics()
    s.update(loss=float(np.log(4.0) * 10), n_words=10, n_correct=5, n_sents=2, kl=3.0)
    assert abs(s.ppl() - 4.0) < 1e-6
    assert s.accuracy() == 50.0
    assert s.avg_kl() == 1.5
    s2 = Statistics()
    s2.update(loss=0.0, n_words=10, n_correct=10)
    s.merge(s2)
    assert s.n_words == 20 and s.accuracy() == 75.0
    assert "ppl" in s.scalars()


def test_checkpoint_averaging(tmp_path):
    """tools/average_checkpoints: averaged params = elementwise mean."""
    import subprocess, sys, os
    from variational_mmt_tpu.config import Config, ModelConfig
    from variational_mmt_tpu.data.vocab import SPECIALS, Vocab
    from variational_mmt_tpu.models.model import build_model
    from variational_mmt_tpu.train.checkpoint import load_checkpoint, latest_checkpoint, save_checkpoint
    from variational_mmt_tpu.train.trainer import create_train_state

    cfg = Config(model=ModelConfig(
        model_type="nmt", src_vocab_size=12, tgt_vocab_size=12, emb_dim=4,
        hidden_dim=8, enc_layers=1, dec_layers=1, dropout=0.0,
        compute_dtype="float32", img_feat_dim=0, use_img_predict=False))
    model = build_model(cfg.model)
    v = Vocab(list(SPECIALS) + [f"w{i}" for i in range(8)])
    states = []
    dirs = []
    for i in range(2):
        cfg.train.seed = i
        st = create_train_state(cfg, model)
        st = st.replace(step=jnp.int32(i))
        d = str(tmp_path / f"ck{i}")
        save_checkpoint(d, st, cfg, v, v, keep=0)
        states.append(st)
        dirs.append(latest_checkpoint(d))

    out_dir = str(tmp_path / "avg")
    subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         "tools", "average_checkpoints.py"),
         "-ckpts", *dirs, "-output", out_dir],
        check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    st_avg, *_ = load_checkpoint(latest_checkpoint(out_dir))
    import jax as _jax
    for a, b, c in zip(_jax.tree.leaves(st_avg.params),
                       _jax.tree.leaves(states[0].params),
                       _jax.tree.leaves(states[1].params)):
        np.testing.assert_allclose(np.asarray(a), (np.asarray(b) + np.asarray(c)) / 2, rtol=1e-6, atol=1e-7)


def test_update_config_bool_strings():
    cfg = Config()
    update_config(cfg, {"model.input_feed": "False", "model.use_pallas": "true"})
    assert cfg.model.input_feed is False
    assert cfg.model.use_pallas is True


def test_step_timer_and_trace_noop():
    import time as _time
    from variational_mmt_tpu.utils.profiling import StepTimer, trace

    t = StepTimer()
    assert t.summary() == {}
    for _ in range(5):
        t.mark()
        _time.sleep(0.001)
    t.mark()
    s = t.summary()
    assert s["steps"] == 5 and s["mean_ms"] >= 1.0 and s["p99_ms"] >= s["p50_ms"]
    with trace(None):  # no log dir -> pure no-op
        pass


def test_metrics_logger(tmp_path):
    import json
    from variational_mmt_tpu.utils.metrics_log import MetricsLogger

    p = str(tmp_path / "m.jsonl")
    log = MetricsLogger(p)
    log.log(10, {"ppl": 3.5}, prefix="train")
    log.log(20, {"bleu": 30.0})
    log.close()
    recs = [json.loads(l) for l in open(p)]
    assert recs[0]["train/ppl"] == 3.5 and recs[0]["step"] == 10
    assert recs[1]["bleu"] == 30.0
    MetricsLogger(None).log(1, {"x": 1.0})  # disabled logger is a no-op


def test_tensorboard_writer_roundtrip(tmp_path):
    """Native tfevents writer: frames round-trip through our own parser with
    CRC32C verification, and crc32c matches a known vector."""
    import glob
    from variational_mmt_tpu.utils.tensorboard import (
        TensorBoardWriter, crc32c, read_events,
    )

    # RFC 3720 test vector: crc32c of 32 zero bytes
    assert crc32c(b"\x00" * 32) == 0x8A9136AA

    d = str(tmp_path / "tb")
    w = TensorBoardWriter(d)
    w.log(10, {"ppl": 3.5, "kl": 1.25}, prefix="train")
    w.log(20, {"bleu": 30.5})
    w.close()
    files = glob.glob(d + "/events.out.tfevents.*")
    assert len(files) == 1
    events = read_events(files[0])
    # first record is the file_version header (step 0, no scalars)
    assert events[0] == (0, {})
    assert events[1][0] == 10
    np.testing.assert_allclose(events[1][1]["train/ppl"], 3.5)
    np.testing.assert_allclose(events[1][1]["train/kl"], 1.25)
    assert events[2] == (20, {"bleu": 30.5})

    # disabled writer is a no-op
    TensorBoardWriter(None).log(1, {"x": 1.0})


def test_metrics_logger_tensorboard_integration(tmp_path):
    import glob
    from variational_mmt_tpu.utils.metrics_log import MetricsLogger
    from variational_mmt_tpu.utils.tensorboard import read_events

    log = MetricsLogger(str(tmp_path / "m.jsonl"), str(tmp_path / "tb"))
    log.log(5, {"loss": 2.0}, prefix="train")
    log.close()
    events = read_events(glob.glob(str(tmp_path / "tb") + "/events.*")[0])
    assert events[1][0] == 5 and events[1][1]["train/loss"] == 2.0


def test_config_presets_load_and_validate():
    """Shipped paper-family presets parse into a valid Config."""
    import glob
    import json as _json
    import os as _os

    from variational_mmt_tpu.config import Config

    pat = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "variational_mmt_tpu", "configs", "*.json",
    )
    paths = sorted(glob.glob(pat))
    assert len(paths) == 3
    types = set()
    for p in paths:
        cfg = Config.from_dict(_json.load(open(p)))
        cfg.validate()
        types.add(cfg.model.model_type)
        assert cfg.model.hidden_dim == 500 and cfg.decode.beam_size == 4
    assert types == {"nmt", "vmmt_f", "vmmt_c"}


def test_enable_compile_cache(monkeypatch, tmp_path):
    """Every jax-using CLI gets a persistent per-user XLA compile cache; env
    overrides, JAX's own env var, and the =0 kill switch must all win."""
    import jax

    from variational_mmt_tpu.utils import platform as plat

    prior = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("VMMT_COMPILE_CACHE", str(tmp_path / "cache"))
        plat.enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")
        import os as _os
        assert _os.path.isdir(tmp_path / "cache")

        monkeypatch.setenv("VMMT_COMPILE_CACHE", str(tmp_path / "other"))
        plat.enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "other")
        # =0 disables (leaves the previous setting untouched)
        monkeypatch.setenv("VMMT_COMPILE_CACHE", "0")
        plat.enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "other")
        # without VMMT override, an already-configured cache is respected
        monkeypatch.delenv("VMMT_COMPILE_CACHE", raising=False)
        plat.enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "other")
    finally:
        # jax config is process-global: later tests must not inherit a
        # deleted tmp_path as their cache dir
        jax.config.update("jax_compilation_cache_dir", prior)


def test_prng_step_keys_distinct_and_deterministic():
    import jax
    import numpy as np

    from variational_mmt_tpu.utils.prng import base_key, step_key

    k = base_key(7)
    ks = [np.asarray(jax.random.key_data(step_key(k, i))) for i in range(50)]
    # deterministic
    np.testing.assert_array_equal(ks[3], np.asarray(jax.random.key_data(step_key(base_key(7), 3))))
    # pairwise distinct
    seen = {bytes(a.tobytes()) for a in ks}
    assert len(seen) == 50


def test_flops_model_counts_scale_sanely():
    """The analytic FLOP model must scale linearly in B and quadratically-ish
    in H, and lstm > gru at the same shape (4 vs 3 gate blocks)."""
    from variational_mmt_tpu.config import ModelConfig
    from variational_mmt_tpu.utils.flops import forward_flops, train_step_flops

    base = dict(model_type="vmmt_c", src_vocab_size=1000, tgt_vocab_size=1000,
                emb_dim=64, hidden_dim=64, enc_layers=2, dec_layers=2,
                latent_dim=16, img_feat_dim=128)
    f1 = forward_flops(ModelConfig(**base), 8, 16, 16)
    f2 = forward_flops(ModelConfig(**base), 16, 16, 16)
    assert abs(f2 / f1 - 2.0) < 1e-6  # exactly linear in B
    fh = forward_flops(ModelConfig(**{**base, "hidden_dim": 128, "emb_dim": 128}), 8, 16, 16)
    assert 2.0 < fh / f1 < 4.5  # between linear and quadratic in width
    fl = forward_flops(ModelConfig(**{**base, "rnn_type": "lstm"}), 8, 16, 16)
    assert fl > f1
    assert train_step_flops(ModelConfig(**base), 8, 16, 16) == 3.0 * f1


def test_make_mesh_rejects_oversubscription():
    import pytest as _pytest

    from variational_mmt_tpu.parallel.mesh import make_mesh

    with _pytest.raises(ValueError, match="data shards"):
        make_mesh(10 ** 6)


def test_corrupt_targets_train_only_noise():
    """corrupt_targets flips ~frac of tokens in place, only in the lines it
    is given, deterministically per seed (the plain-corpus gate regime keeps
    valid/test clean)."""
    import copy

    from variational_mmt_tpu.data import synthetic

    src, tgt, _, _, tv = synthetic.make_corpus(
        120, vocab_size=60, img_dim=8, seed=4, max_len=12)
    train, valid = tgt[:100], tgt[100:]
    valid_before = copy.deepcopy(valid)
    train_before = copy.deepcopy(train)
    n = synthetic.corrupt_targets(train, 0.3, vocab_size=60, seed=7)
    total = sum(len(t) for t in train_before)
    changed = sum(a != b for ta, tb in zip(train, train_before)
                  for a, b in zip(ta, tb))
    # flip count reported == observed-or-higher (a flip can redraw the same
    # word), rate near 0.3, valid split untouched, vocab stays closed
    assert n >= changed and abs(n / total - 0.3) < 0.08
    assert valid == valid_before
    assert all(w in tv.stoi for t in train for w in t)
    # determinism: same seed reproduces the same corruption
    train2 = copy.deepcopy(train_before)
    synthetic.corrupt_targets(train2, 0.3, vocab_size=60, seed=7)
    assert train2 == train
