"""Pretrained word-embedding loading + freezing (the reference's
``-pre_word_vecs_enc/dec`` / ``-fix_word_vecs_*`` flags and
``tools/embeddings_to_torch.py``, SURVEY.md §2.1 #4)."""

import numpy as np
import pytest

from variational_mmt_tpu.data.embeddings import (
    align_to_vocab,
    apply_pretrained,
    read_text_embeddings,
)
from variational_mmt_tpu.data.vocab import SPECIALS, Vocab


def test_read_text_embeddings_glove_and_word2vec(tmp_path):
    glove = tmp_path / "glove.txt"
    glove.write_text("hello 1.0 2.0 3.0\nworld 4.0 5.0 6.0\nbad line\n")
    vecs = read_text_embeddings(str(glove))
    assert set(vecs) == {"hello", "world"}
    np.testing.assert_allclose(vecs["hello"], [1.0, 2.0, 3.0])

    w2v = tmp_path / "w2v.txt"
    w2v.write_text("2 3\nhello 1 2 3\nworld 4 5 6\n")
    vecs = read_text_embeddings(str(w2v))
    assert set(vecs) == {"hello", "world"}
    np.testing.assert_allclose(vecs["world"], [4.0, 5.0, 6.0])


def test_align_to_vocab_coverage_and_oov():
    vocab = Vocab(SPECIALS + ["hello", "world", "missing"])
    vecs = {"hello": np.ones(4, np.float32), "world": 2 * np.ones(4, np.float32)}
    table, matched = align_to_vocab(vecs, vocab.itos, seed=0)
    assert table.shape == (len(vocab), 4)
    assert matched == 2
    np.testing.assert_allclose(table[vocab.stoi["hello"]], 1.0)
    np.testing.assert_allclose(table[vocab.stoi["world"]], 2.0)
    # OOV rows are small random init, not zeros (a zero row kills the token)
    assert 0 < np.abs(table[vocab.stoi["missing"]]).max() < 1.0


def test_apply_pretrained_shape_mismatch_errors():
    params = {"src_embed": {"embedding": np.zeros((5, 4), np.float32)},
              "tgt_embed": {"embedding": np.zeros((6, 4), np.float32)}}
    with pytest.raises(ValueError, match="pretrained table"):
        apply_pretrained(params, enc=np.zeros((7, 4), np.float32))
    out = apply_pretrained(params, dec=np.ones((6, 4), np.float32))
    np.testing.assert_allclose(out["tgt_embed"]["embedding"], 1.0)
    np.testing.assert_allclose(out["src_embed"]["embedding"], 0.0)


def test_embeddings_to_npy_tool(tmp_path):
    import importlib

    tool = importlib.import_module("tools.embeddings_to_npy")
    vocab = Vocab(SPECIALS + ["alpha", "beta"])
    vpath = tmp_path / "v.json"
    vocab.save(str(vpath))
    (tmp_path / "emb.txt").write_text("alpha 1 0\ngamma 9 9\n")
    out = tmp_path / "emb.npy"
    tool.main(["-emb_file", str(tmp_path / "emb.txt"), "-vocab", str(vpath),
               "-output", str(out)])
    table = np.load(out)
    assert table.shape == (len(vocab), 2)
    np.testing.assert_allclose(table[vocab.stoi["alpha"]], [1.0, 0.0])


def test_train_cli_pretrained_and_frozen(tmp_path):
    """End to end: -pre_word_vecs_enc loads the table; -fix_word_vecs_enc
    keeps it EXACTLY fixed through real optimizer steps while the decoder
    embeddings (loaded but not fixed) move."""
    from variational_mmt_tpu.cli import preprocess as cli_pre
    from variational_mmt_tpu.cli import train as cli_train
    from variational_mmt_tpu.data import synthetic
    from variational_mmt_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    d = str(tmp_path)
    src, tgt, _, _, _ = synthetic.make_corpus(40, vocab_size=30, img_dim=8, seed=5, max_len=8)
    for name, lines in [("train.src", src), ("train.tgt", tgt)]:
        with open(f"{d}/{name}", "w") as f:
            for l in lines:
                f.write(" ".join(l) + "\n")
    cli_pre.main(["-train_src", f"{d}/train.src", "-train_tgt", f"{d}/train.tgt",
                  "-save_data", f"{d}/demo", "-no_bpe", "-pretokenized"])

    sv = Vocab.load(f"{d}/demo.vocab.src.json")
    tv = Vocab.load(f"{d}/demo.vocab.tgt.json")
    rng = np.random.default_rng(0)
    enc = rng.standard_normal((len(sv), 16)).astype(np.float32)
    dec = rng.standard_normal((len(tv), 16)).astype(np.float32)
    np.save(f"{d}/enc.npy", enc)
    np.save(f"{d}/dec.npy", dec)

    cli_train.main([
        "-data", f"{d}/demo", "-save_model", f"{d}/ck", "-model_type", "nmt",
        "-word_vec_size", "16", "-rnn_size", "16", "-enc_layers", "1",
        "-dec_layers", "1", "-batch_size", "8", "-max_steps", "3",
        "-buckets", "16", "-compute_dtype", "float32",
        "-pre_word_vecs_enc", f"{d}/enc.npy", "-pre_word_vecs_dec", f"{d}/dec.npy",
        "-fix_word_vecs_enc", "1",
        "-checkpoint_every", "100", "-valid_every", "100",
    ])
    state, cfg, _, _, _ = load_checkpoint(latest_checkpoint(f"{d}/ck"))
    assert cfg.train.fix_word_vecs_enc and not cfg.train.fix_word_vecs_dec
    got_enc = np.asarray(state.params["src_embed"]["embedding"])
    got_dec = np.asarray(state.params["tgt_embed"]["embedding"])
    np.testing.assert_allclose(got_enc, enc, atol=1e-6)  # frozen: bit-stable
    assert not np.allclose(got_dec, dec, atol=1e-6)  # loaded, then trained
    # ...but it STARTED from the pretrained table (moved, not re-initialized)
    assert np.abs(got_dec - dec).max() < 0.1


def test_read_text_embeddings_one_dim_and_header_dim(tmp_path):
    # 2-field first line that is a valid 1-d vector must not be dropped
    f1 = tmp_path / "onedim.txt"
    f1.write_text("hello 0.5\nworld 1.5\n")
    vecs = read_text_embeddings(str(f1))
    assert set(vecs) == {"hello", "world"} and len(vecs["hello"]) == 1
    # a word2vec header's declared dim gates subsequent lines
    f2 = tmp_path / "hdr.txt"
    f2.write_text("2 3\nhello 1 2 3\nbroken 1 2\nworld 4 5 6\n")
    vecs = read_text_embeddings(str(f2))
    assert set(vecs) == {"hello", "world"}


def test_frozen_embeddings_survive_nonzero_optimizer_moments():
    """Resuming with -fix_word_vecs_enc from a checkpoint whose adam moments
    are non-zero must NOT keep moving the table (zeroed grads alone would:
    the moment estimates emit non-zero updates for ~1/(1-b1) steps)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from variational_mmt_tpu.config import Config, ModelConfig, TrainConfig
    from variational_mmt_tpu.models.model import build_model
    from variational_mmt_tpu.train.trainer import create_train_state, make_train_step

    cfg = Config(
        model=ModelConfig(model_type="nmt", src_vocab_size=20, tgt_vocab_size=20,
                          emb_dim=8, hidden_dim=8, enc_layers=1, dec_layers=1,
                          dropout=0.0, compute_dtype="float32"),
        train=TrainConfig(seed=0, batch_size=4, learning_rate=0.05),
    )
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    rng = np.random.default_rng(0)
    batch = {
        "src": jnp.asarray(rng.integers(4, 20, (4, 6)), jnp.int32),
        "tgt_in": jnp.asarray(rng.integers(4, 20, (4, 6)), jnp.int32),
        "tgt_out": jnp.asarray(rng.integers(4, 20, (4, 6)), jnp.int32),
        "example_mask": jnp.ones((4,), jnp.float32),
    }
    step = jax.jit(make_train_step(cfg, model))
    for _ in range(3):  # accumulate non-zero adam moments
        state, _ = step(state, batch)

    frozen_cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, fix_word_vecs_enc=True)
    )
    fstep = jax.jit(make_train_step(frozen_cfg, model))
    emb = np.asarray(state.params["src_embed"]["embedding"]).copy()
    other = np.asarray(jax.tree.leaves(state.params["encoder"])[0]).copy()
    for _ in range(3):
        state, _ = fstep(state, batch)
    np.testing.assert_array_equal(
        np.asarray(state.params["src_embed"]["embedding"]), emb)
    assert not np.allclose(np.asarray(jax.tree.leaves(state.params["encoder"])[0]), other)
