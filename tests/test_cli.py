"""End-to-end CLI integration (the reference's CI-style chain: preprocess ->
1-short-train -> translate on a tiny corpus, SURVEY.md §4), run in-process
with a tiny synthetic corpus."""

import json
import os

import numpy as np
import pytest

from variational_mmt_tpu.cli import preprocess as cli_pre
from variational_mmt_tpu.cli import train as cli_train
from variational_mmt_tpu.cli import translate as cli_translate
from variational_mmt_tpu.data import synthetic


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    src, tgt, feats, _, _ = synthetic.make_corpus(80, vocab_size=40, img_dim=16, seed=9, max_len=8)
    for name, lines in [("train.src", src[:60]), ("train.tgt", tgt[:60]),
                        ("valid.src", src[60:70]), ("valid.tgt", tgt[60:70]),
                        ("test.src", src[70:]), ("test.tgt", tgt[70:])]:
        with open(d / name, "w") as f:
            for l in lines:
                f.write(" ".join(l) + "\n")
    np.save(d / "train.feats.npy", feats[:60])
    np.save(d / "valid.feats.npy", feats[60:70])
    np.save(d / "test.feats.npy", feats[70:])
    # preprocess once so every test (in any order) has the binarized data
    cli_pre.main([
        "-train_src", f"{d}/train.src", "-train_tgt", f"{d}/train.tgt",
        "-valid_src", f"{d}/valid.src", "-valid_tgt", f"{d}/valid.tgt",
        "-save_data", f"{d}/demo", "-bpe_merges", "30", "-pretokenized",
    ])
    return d


def test_cli_chain(corpus, capsys):
    d = str(corpus)
    assert os.path.exists(f"{d}/demo.train.npz")  # built by the fixture

    cli_train.main([
        "-data", f"{d}/demo", "-save_model", f"{d}/ckpts", "-model_type", "vmmt_f",
        "-train_img_feats", f"{d}/train.feats.npy",
        "-valid_img_feats", f"{d}/valid.feats.npy", "-img_feat_dim", "16",
        "-word_vec_size", "16", "-rnn_size", "32", "-enc_layers", "1",
        "-dec_layers", "1", "-z_latent_dim", "4", "-batch_size", "16",
        "-max_steps", "6", "-report_every", "3", "-valid_every", "6",
        "-checkpoint_every", "100", "-buckets", "16", "-compute_dtype", "float32",
        "-metrics_log", f"{d}/metrics.jsonl",
    ])
    assert os.path.isdir(f"{d}/ckpts")
    with open(f"{d}/metrics.jsonl") as f:
        recs = [json.loads(l) for l in f]
    assert any("train/ppl" in r for r in recs)
    assert any("valid/ppl" in r for r in recs)

    cli_translate.main([
        "-model", f"{d}/ckpts", "-src", f"{d}/test.src", "-tgt", f"{d}/test.tgt",
        "-img_feats", f"{d}/test.feats.npy", "-bpe_codes", f"{d}/demo.bpe.codes",
        "-pretokenized", "-output", f"{d}/pred.txt", "-beam_size", "2",
        "-batch_size", "8", "-max_length", "12", "-iw_eval", "2",
        "-latent_diag", "-verbose", "-dump_attn", f"{d}/attn.npz",
    ])
    with open(f"{d}/pred.txt") as f:
        preds = f.read().splitlines()
    assert len(preds) == 10
    out = capsys.readouterr().out
    assert "BLEU" in out and "IW-ELBO" in out
    assert "LATENT DIAG: active units" in out
    # upstream-style verbose + scoring report (SURVEY §2.1 #15)
    assert "PRED SCORE" in out and "GOLD AVG SCORE" in out and "GOLD PPL" in out
    attn = np.load(f"{d}/attn.npz")
    assert len(attn.files) == 10
    for i, hyp in enumerate(preds):
        a = attn[f"attn_{i}"]
        assert a.ndim == 2 and a.shape[0] >= 1
        np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-4)


def _mini_train(d, out_dir, steps=6):
    """A 6-step vmmt_f checkpoint (self-contained; no cross-test ordering)."""
    cli_train.main([
        "-data", f"{d}/demo", "-save_model", out_dir, "-model_type", "vmmt_f",
        "-train_img_feats", f"{d}/train.feats.npy",
        "-valid_img_feats", f"{d}/valid.feats.npy", "-img_feat_dim", "16",
        "-word_vec_size", "16", "-rnn_size", "32", "-enc_layers", "1",
        "-dec_layers", "1", "-z_latent_dim", "4", "-batch_size", "16",
        "-max_steps", str(steps), "-report_every", "100", "-valid_every", "100",
        "-checkpoint_every", "100", "-buckets", "16", "-compute_dtype", "float32",
    ])


def test_cli_resume(corpus, tmp_path):
    d = str(corpus)
    ck = f"{tmp_path}/ckres"
    _mini_train(d, ck, steps=6)
    cli_train.main([
        "-data", f"{d}/demo", "-save_model", ck, "-model_type", "vmmt_f",
        "-train_from", ck,
        "-train_img_feats", f"{d}/train.feats.npy",
        "-valid_img_feats", f"{d}/valid.feats.npy", "-img_feat_dim", "16",
        "-word_vec_size", "16", "-rnn_size", "32", "-enc_layers", "1",
        "-dec_layers", "1", "-z_latent_dim", "4", "-batch_size", "16",
        "-max_steps", "8", "-report_every", "4", "-valid_every", "100",
        "-checkpoint_every", "100", "-buckets", "16", "-compute_dtype", "float32",
    ])
    from variational_mmt_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    state, _, _, _, _ = load_checkpoint(latest_checkpoint(ck))
    assert int(state.step) == 8  # resumed 6 -> 8


def test_cli_conv_features(corpus, tmp_path):
    """Train + translate with conv (N,49,D) features through the CLIs."""
    d = str(corpus)
    conv = np.repeat(np.load(f"{d}/train.feats.npy")[:, None, :], 4, axis=1)
    np.save(f"{tmp_path}/train.conv.npy", conv)
    vconv = np.repeat(np.load(f"{d}/valid.feats.npy")[:, None, :], 4, axis=1)
    np.save(f"{tmp_path}/valid.conv.npy", vconv)
    cli_train.main([
        "-data", f"{d}/demo", "-save_model", f"{tmp_path}/ck", "-model_type", "vmmt_c",
        "-train_img_feats", f"{tmp_path}/train.conv.npy",
        "-valid_img_feats", f"{tmp_path}/valid.conv.npy", "-img_feat_dim", "16",
        "-img_feat_type", "conv", "-word_vec_size", "16", "-rnn_size", "32",
        "-enc_layers", "1", "-dec_layers", "1", "-z_latent_dim", "4",
        "-batch_size", "16", "-max_steps", "4", "-report_every", "4",
        "-valid_every", "100", "-checkpoint_every", "100", "-buckets", "16",
        "-compute_dtype", "float32",
    ])
    import os as _os
    assert _os.path.isdir(f"{tmp_path}/ck")


def test_cli_pack(corpus, tmp_path, capsys):
    """-pack 1: packed training through the full CLI (device-resident
    feature table + (B,K) index gather), and the resulting checkpoint
    decodes through the normal (unpacked) translate path."""
    d = str(corpus)
    ck = f"{tmp_path}/ckpack"
    cli_train.main([
        "-data", f"{d}/demo", "-save_model", ck, "-model_type", "vmmt_c",
        "-train_img_feats", f"{d}/train.feats.npy",
        "-valid_img_feats", f"{d}/valid.feats.npy", "-img_feat_dim", "16",
        "-word_vec_size", "16", "-rnn_size", "32", "-enc_layers", "1",
        "-dec_layers", "1", "-z_latent_dim", "4", "-batch_size", "8",
        "-max_steps", "6", "-report_every", "3", "-valid_every", "6",
        "-checkpoint_every", "100", "-buckets", "16", "-compute_dtype",
        "float32", "-pack", "1", "-pack_segments", "3",
    ])
    assert os.path.isdir(ck)
    cli_translate.main([
        "-model", ck, "-src", f"{d}/test.src",
        "-img_feats", f"{d}/test.feats.npy", "-bpe_codes", f"{d}/demo.bpe.codes",
        "-pretokenized", "-output", f"{tmp_path}/pred.txt", "-beam_size", "2",
        "-batch_size", "8", "-max_length", "12",
    ])
    with open(f"{tmp_path}/pred.txt") as f:
        assert len(f.read().splitlines()) == 10


def test_cli_pack_requires_gru(corpus, tmp_path):
    d = str(corpus)
    with pytest.raises(SystemExit, match="rnn_type gru"):
        cli_train.main([
            "-data", f"{d}/demo", "-save_model", f"{tmp_path}/x",
            "-model_type", "nmt", "-rnn_type", "lstm", "-pack", "1",
            "-word_vec_size", "16", "-rnn_size", "32", "-batch_size", "8",
            "-max_steps", "2", "-buckets", "16", "-compute_dtype", "float32",
        ])


def test_cli_epochs_flag(corpus, tmp_path):
    """-epochs computes max_steps from the corpus size."""
    d = str(corpus)
    cli_train.main([
        "-data", f"{d}/demo", "-save_model", f"{tmp_path}/cke", "-model_type", "nmt",
        "-word_vec_size", "16", "-rnn_size", "32", "-enc_layers", "1",
        "-dec_layers", "1", "-batch_size", "32", "-epochs", "2",
        "-report_every", "2", "-valid_every", "100", "-checkpoint_every", "100",
        "-buckets", "16", "-compute_dtype", "float32",
    ])
    from variational_mmt_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
    state, _, _, _, _ = load_checkpoint(latest_checkpoint(f"{tmp_path}/cke"))
    # 60 examples in one bucket, batch 32 -> ceil(60/32) = 2 steps/epoch x 2
    # (the final partial batch pads up and trains; it is NOT dropped)
    assert int(state.step) == 4


def test_flag_map_covers_full_surface():
    """Every argparse flag is either mapped to a Config field (FLAG2KEY) or
    a declared runtime flag — nothing can fall through silently."""
    import argparse

    p = argparse.ArgumentParser()
    cli_train.add_args(p)
    dests = {a.dest for a in p._actions if a.dest != "help"}
    mapped = set(cli_train.FLAG2KEY) | cli_train.RUNTIME_FLAGS
    assert dests == mapped, f"unmapped: {dests - mapped}; stale: {mapped - dests}"
    # every FLAG2KEY target must be a real Config field
    from variational_mmt_tpu.config import Config

    cd = Config().to_dict()
    for flag, (sect, key) in cli_train.FLAG2KEY.items():
        assert key in cd[sect], f"{flag} -> {sect}.{key} is not a Config field"


def test_config_file_with_full_cli_override(corpus, tmp_path):
    """-config as base + EVERY mapped flag passed explicitly: each must land
    in the final Config (the round-1 partial map silently dropped most)."""
    from variational_mmt_tpu.config import Config

    d = str(corpus)
    from dataclasses import replace

    # base file carries lstm so the rnn_type CLI override (gru) is
    # non-vacuous while still satisfying -pack's GRU requirement
    base = Config()
    base = replace(base, model=replace(base.model, rnn_type="lstm"))
    cfg_path = f"{tmp_path}/base.json"
    open(cfg_path, "w").write(base.to_json())

    overrides = {
        "data": f"{d}/demo", "buckets": "16", "model_type": "vmmt_c",
        "rnn_type": "gru",
        "word_vec_size": "32", "rnn_size": "32", "enc_layers": "1",
        "share_decoder_embeddings": "1", "share_embeddings": "0",
        "dec_layers": "1", "dropout": "0.11", "word_dropout": "0.07",
        "input_feed": "1", "global_attention": "dot", "z_latent_dim": "4",
        "img_feat_dim": "16", "img_feat_type": "pool5", "img_pool": "mean",
        "use_img_predict": "1",
        "img_loss": "mse", "img_loss_weight": "0.5", "z_cond": "init+input",
        "compute_dtype": "float32", "use_pallas": "0", "fused_ce": "1",
        "batch_size": "16",
        "grad_accum": "1", "steps_per_call": "1", "max_steps": "1",
        "epochs": "0", "optim": "sgd", "learning_rate": "0.123",
        "max_grad_norm": "3.5", "adam_beta1": "0.85", "adam_beta2": "0.97", "learning_rate_decay": "0.7",
        "start_decay_at": "77", "label_smoothing": "0.05",
        "param_init": "0.08",
        "kl_anneal": "sigmoid", "kl_anneal_steps": "55", "kl_anneal_start": "5",
        "kl_free_bits": "0.25", "skip_nonfinite": "1", "ema_decay": "0.9", "ema_ramp": "0",
        "pack": "1", "pack_segments": "3",
        "fix_word_vecs_enc": "1", "fix_word_vecs_dec": "1", "seed": "42",
        "report_every": "9",
        "valid_every": "100", "checkpoint_every": "100",
        "keep_checkpoints": "2", "num_shards": "1", "tensor_parallel": "1",
    }
    argv = ["-save_model", f"{tmp_path}/ckov", "-config", cfg_path,
            "-train_img_feats", f"{d}/train.feats.npy"]
    for k, v in overrides.items():
        argv += [f"-{k}", v]
    cli_train.main(argv)

    from variational_mmt_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
    _, cfg, _, _, _ = load_checkpoint(latest_checkpoint(f"{tmp_path}/ckov"))
    got = cfg.to_dict()
    skip = {"data", "buckets"}  # non-scalar/positional handling checked below
    for flag, (sect, key) in cli_train.FLAG2KEY.items():
        if flag in skip:
            continue
        want = overrides[flag]
        have = got[sect][key]
        if isinstance(have, bool):
            assert have == bool(int(want)), f"{flag}: {have} != {want}"
        elif isinstance(have, (int, float)):
            assert abs(float(have) - float(want)) < 1e-9, f"{flag}: {have} != {want}"
        else:
            assert str(have) == want, f"{flag}: {have} != {want}"
    assert got["data"]["buckets"] == [16]
    assert got["data"]["save_data"] == f"{d}/demo"


def test_unmapped_passed_flag_errors():
    with pytest.raises(SystemExit, match="not mapped"):
        cli_train.passed_flags(["-totally_bogus_flag", "1"])


def test_cli_preprocess_no_bpe_and_bucket_suggestion(corpus, tmp_path, capsys):
    d = str(corpus)
    cli_pre.main([
        "-train_src", f"{d}/train.src", "-train_tgt", f"{d}/train.tgt",
        "-save_data", f"{tmp_path}/nb", "-no_bpe", "-pretokenized",
    ])
    out = capsys.readouterr().out
    assert "suggested -buckets" in out
    assert os.path.exists(f"{tmp_path}/nb.train.npz")
    assert not os.path.exists(f"{tmp_path}/nb.bpe.codes")


def test_cli_preprocess_zero_merges_means_no_bpe(corpus, tmp_path):
    """-bpe_merges 0 must behave like -no_bpe (0 merges would char-split)."""
    d = str(corpus)
    cli_pre.main([
        "-train_src", f"{d}/train.src", "-train_tgt", f"{d}/train.tgt",
        "-save_data", f"{tmp_path}/zm", "-bpe_merges", "0", "-pretokenized",
    ])
    assert not os.path.exists(f"{tmp_path}/zm.bpe.codes")
    nb = json.load(open(f"{tmp_path}/zm.vocab.src.json"))
    # word-level vocab, not characters: the corpus has ~40 word types
    assert len(nb["tokens"] if isinstance(nb, dict) and "tokens" in nb else nb) > 15


def test_share_embeddings_requires_shared_vocab(corpus, tmp_path):
    """Same SIZES are not enough: -share_embeddings with separately-built
    vocabs must exit with the explicit message, not silently misembed."""
    d = str(corpus)
    with pytest.raises(SystemExit, match="share_vocab"):
        cli_train.main([
            "-data", f"{d}/demo", "-save_model", f"{tmp_path}/cksv",
            "-model_type", "nmt", "-share_embeddings", "1",
            "-word_vec_size", "16", "-rnn_size", "16", "-batch_size", "8",
            "-max_steps", "1", "-buckets", "16", "-compute_dtype", "float32",
        ])


def test_optimizer_family_lr_default_survives_config(corpus, tmp_path):
    """-config written for adam + -optim adagrad on the CLI: the adagrad
    family default lr (0.1) must win over the file's adam-oriented 4e-4."""
    from variational_mmt_tpu.config import Config
    from variational_mmt_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    d = str(corpus)
    cfg_path = f"{tmp_path}/adam_base.json"
    open(cfg_path, "w").write(Config().to_json())  # optimizer=adam, lr=4e-4
    cli_train.main([
        "-data", f"{d}/demo", "-save_model", f"{tmp_path}/cklr",
        "-config", cfg_path, "-model_type", "nmt", "-optim", "adagrad",
        "-word_vec_size", "16", "-rnn_size", "16", "-batch_size", "8",
        "-max_steps", "1", "-buckets", "16", "-compute_dtype", "float32",
        "-checkpoint_every", "100", "-valid_every", "100",
    ])
    _, cfg, _, _, _ = load_checkpoint(latest_checkpoint(f"{tmp_path}/cklr"))
    assert cfg.train.optimizer == "adagrad"
    assert abs(cfg.train.learning_rate - 0.1) < 1e-9


def test_phrase_table_requires_replace_unk(corpus, tmp_path):
    d = str(corpus)
    ck = f"{tmp_path}/ckpt"
    _mini_train(d, ck, steps=1)  # self-contained (checkpoint loads BEFORE the guard)
    pt = tmp_path / "pt.txt"
    pt.write_text("a\tb\n")
    with pytest.raises(SystemExit, match="replace_unk"):
        cli_translate.main([
            "-model", ck, "-src", f"{d}/test.src",
            "-img_feats", f"{d}/test.feats.npy", "-pretokenized",
            "-output", f"{tmp_path}/o.txt", "-phrase_table", str(pt),
        ])


def test_cli_sharded_preprocess_and_train(corpus, tmp_path):
    """-shard_size writes multiple training shards; train consumes them
    transparently (same example count, feature alignment preserved)."""
    d = str(corpus)
    cli_pre.main([
        "-train_src", f"{d}/train.src", "-train_tgt", f"{d}/train.tgt",
        "-save_data", f"{tmp_path}/sh", "-no_bpe", "-pretokenized",
        "-shard_size", "25",
    ])
    import glob
    shards = sorted(glob.glob(f"{tmp_path}/sh.train.*.npz"))
    assert len(shards) == 3  # 60 examples / 25
    assert not os.path.exists(f"{tmp_path}/sh.train.npz")
    cli_train.main([
        "-data", f"{tmp_path}/sh", "-save_model", f"{tmp_path}/cksh",
        "-model_type", "nmt", "-word_vec_size", "16", "-rnn_size", "16",
        "-batch_size", "16", "-max_steps", "2", "-buckets", "16",
        "-compute_dtype", "float32", "-checkpoint_every", "100",
        "-valid_every", "100",
    ])
    from variational_mmt_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
    state, _, _, _, _ = load_checkpoint(latest_checkpoint(f"{tmp_path}/cksh"))
    assert int(state.step) == 2


def test_config_without_features_disables_image_machinery(corpus, tmp_path):
    """A multimodal preset + no -train_img_feats must train text-only (the
    merge used to keep img_feat_dim=2048, crashing inside the model)."""
    from variational_mmt_tpu.config import Config, ModelConfig
    from variational_mmt_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    d = str(corpus)
    preset = Config(model=ModelConfig(model_type="vmmt_c", img_feat_dim=2048,
                                      use_img_predict=True))
    cfg_path = f"{tmp_path}/mm.json"
    open(cfg_path, "w").write(preset.to_json())
    cli_train.main([
        "-data", f"{d}/demo", "-save_model", f"{tmp_path}/cknm",
        "-config", cfg_path, "-word_vec_size", "16", "-rnn_size", "16",
        "-batch_size", "8", "-max_steps", "1", "-buckets", "16",
        "-compute_dtype", "float32", "-checkpoint_every", "100",
        "-valid_every", "100",
    ])
    _, cfg, _, _, _ = load_checkpoint(latest_checkpoint(f"{tmp_path}/cknm"))
    assert cfg.model.img_feat_dim == 0 and not cfg.model.use_img_predict


def test_preprocess_layout_switch_removes_stale_files(corpus, tmp_path):
    """Re-running preprocess with a different -shard_size layout must not
    leave the previous layout behind (BinarizedDataset.load would prefer a
    stale single file over fresh shards)."""
    import glob

    from variational_mmt_tpu.data.dataset import BinarizedDataset

    d = str(corpus)
    base = ["-train_src", f"{d}/train.src", "-train_tgt", f"{d}/train.tgt",
            "-save_data", f"{tmp_path}/lay", "-no_bpe", "-pretokenized"]
    cli_pre.main(base)  # single-file layout
    assert os.path.exists(f"{tmp_path}/lay.train.npz")
    cli_pre.main(base + ["-shard_size", "25"])  # -> sharded layout
    assert not os.path.exists(f"{tmp_path}/lay.train.npz")
    assert len(glob.glob(f"{tmp_path}/lay.train.*.npz")) == 3
    ds = BinarizedDataset.load(f"{tmp_path}/lay.train.npz")
    assert len(ds) == 60
    # sharded -> sharded with a LARGER shard size rewrites fewer shards;
    # stale higher-index ones must not survive to be concatenated back in
    # (60/25 -> shards 00..02; 60/40 -> shards 00..01)
    cli_pre.main(base + ["-shard_size", "40"])
    assert len(glob.glob(f"{tmp_path}/lay.train.??.npz")) == 2
    assert len(BinarizedDataset.load(f"{tmp_path}/lay.train.npz")) == 60
    cli_pre.main(base)  # -> back to single-file layout
    assert glob.glob(f"{tmp_path}/lay.train.??.npz") == []
    assert len(BinarizedDataset.load(f"{tmp_path}/lay.train.npz")) == 60


def test_dataset_load_refuses_ambiguous_layout(corpus, tmp_path):
    """Both a single .npz and shards present -> hard error, not a silent
    preference for the (possibly stale) single file."""
    import shutil

    from variational_mmt_tpu.data.dataset import BinarizedDataset

    d = str(corpus)
    cli_pre.main(["-train_src", f"{d}/train.src", "-train_tgt", f"{d}/train.tgt",
                  "-save_data", f"{tmp_path}/amb", "-no_bpe", "-pretokenized",
                  "-shard_size", "25"])
    shutil.copy(f"{tmp_path}/amb.train.00.npz", f"{tmp_path}/amb.train.npz")
    with pytest.raises(ValueError, match="both .* and shards"):
        BinarizedDataset.load(f"{tmp_path}/amb.train.npz")


def test_config_file_optimizer_without_lr_gets_family_default(corpus, tmp_path):
    """A config FILE that sets optimizer adadelta/adagrad but omits
    learning_rate must get the family default (1.0/0.1), not the filled-in
    adam dataclass default 4e-4 -- consistent with the no-config path."""
    from variational_mmt_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    d = str(corpus)
    cfg_path = f"{tmp_path}/fam.json"
    open(cfg_path, "w").write('{"train": {"optimizer": "adadelta"}}')
    cli_train.main([
        "-data", f"{d}/demo", "-save_model", f"{tmp_path}/ckfam",
        "-config", cfg_path, "-model_type", "nmt",
        "-word_vec_size", "16", "-rnn_size", "16", "-batch_size", "8",
        "-max_steps", "1", "-buckets", "16", "-compute_dtype", "float32",
        "-checkpoint_every", "100", "-valid_every", "100",
    ])
    _, cfg, _, _, _ = load_checkpoint(latest_checkpoint(f"{tmp_path}/ckfam"))
    assert cfg.train.optimizer == "adadelta"
    assert abs(cfg.train.learning_rate - 1.0) < 1e-9

    # but an EXPLICIT file lr for the same family is respected
    open(cfg_path, "w").write(
        '{"train": {"optimizer": "adadelta", "learning_rate": 0.5}}')
    cli_train.main([
        "-data", f"{d}/demo", "-save_model", f"{tmp_path}/ckfam2",
        "-config", cfg_path, "-model_type", "nmt",
        "-word_vec_size", "16", "-rnn_size", "16", "-batch_size", "8",
        "-max_steps", "1", "-buckets", "16", "-compute_dtype", "float32",
        "-checkpoint_every", "100", "-valid_every", "100",
    ])
    _, cfg, _, _, _ = load_checkpoint(latest_checkpoint(f"{tmp_path}/ckfam2"))
    assert abs(cfg.train.learning_rate - 0.5) < 1e-9


def test_cli_ensemble_translate(corpus, tmp_path, capsys):
    """-model a,b ensemble decode: output lines for every sentence, the
    incompatible-flag guard, and the vocab-mismatch guard."""
    d = str(corpus)
    _mini_train(d, f"{tmp_path}/ens_a")
    # a second member from a different seed (different params, same vocab)
    cli_train.main([
        "-data", f"{d}/demo", "-save_model", f"{tmp_path}/ens_b",
        "-model_type", "vmmt_f", "-train_img_feats", f"{d}/train.feats.npy",
        "-valid_img_feats", f"{d}/valid.feats.npy", "-img_feat_dim", "16",
        "-word_vec_size", "16", "-rnn_size", "32", "-enc_layers", "1",
        "-dec_layers", "1", "-z_latent_dim", "4", "-batch_size", "16",
        "-max_steps", "6", "-report_every", "100", "-valid_every", "100",
        "-checkpoint_every", "100", "-buckets", "16",
        "-compute_dtype", "float32", "-seed", "99",
    ])
    cli_translate.main([
        "-model", f"{tmp_path}/ens_a,{tmp_path}/ens_b",
        "-src", f"{d}/test.src", "-img_feats", f"{d}/test.feats.npy",
        "-bpe_codes", f"{d}/demo.bpe.codes", "-pretokenized",
        "-output", f"{tmp_path}/pred_ens.txt", "-beam_size", "2",
        "-batch_size", "8", "-max_length", "12",
    ])
    with open(f"{tmp_path}/pred_ens.txt") as f:
        assert len(f.read().splitlines()) == 10
    assert "ensemble of 2 checkpoints (prob)" in capsys.readouterr().out

    # per-model-only flags must be rejected up front, not fail deep inside
    with pytest.raises(SystemExit, match="-iw_eval"):
        cli_translate.main([
            "-model", f"{tmp_path}/ens_a,{tmp_path}/ens_b",
            "-src", f"{d}/test.src", "-tgt", f"{d}/test.tgt",
            "-img_feats", f"{d}/test.feats.npy",
            "-bpe_codes", f"{d}/demo.bpe.codes", "-pretokenized",
            "-iw_eval", "2",
        ])

    # a member from a different preprocess run (different vocab) is refused
    cli_pre.main([
        "-train_src", f"{d}/train.src", "-train_tgt", f"{d}/train.tgt",
        "-valid_src", f"{d}/valid.src", "-valid_tgt", f"{d}/valid.tgt",
        "-save_data", f"{tmp_path}/other", "-bpe_merges", "10", "-pretokenized",
    ])
    cli_train.main([
        "-data", f"{tmp_path}/other", "-save_model", f"{tmp_path}/ens_c",
        "-model_type", "nmt", "-word_vec_size", "16", "-rnn_size", "16",
        "-batch_size", "8", "-max_steps", "1", "-buckets", "16",
        "-compute_dtype", "float32", "-checkpoint_every", "100",
        "-valid_every", "100",
    ])
    with pytest.raises(SystemExit, match="different"):
        cli_translate.main([
            "-model", f"{tmp_path}/ens_a,{tmp_path}/ens_c",
            "-src", f"{d}/test.src", "-img_feats", f"{d}/test.feats.npy",
            "-bpe_codes", f"{d}/demo.bpe.codes", "-pretokenized",
        ])
