"""Tied generator (-share_decoder_embeddings): the generator kernel IS the
target embedding table transposed (upstream OpenNMT-py flag, SURVEY.md §2.1
#9's Generator row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from variational_mmt_tpu.config import Config, ModelConfig, TrainConfig
from variational_mmt_tpu.models.model import build_model, generator_params, init_params
from variational_mmt_tpu.train.trainer import create_train_state, make_train_step


def _cfg(tied=True, fused_ce=False, model_type="nmt"):
    return Config(
        model=ModelConfig(
            model_type=model_type, src_vocab_size=20, tgt_vocab_size=24,
            emb_dim=16, hidden_dim=16, enc_layers=1, dec_layers=1,
            latent_dim=4, img_feat_dim=8, dropout=0.0, compute_dtype="float32",
            share_decoder_embeddings=tied, fused_ce=fused_ce,
            use_img_predict=(model_type != "nmt"),
        ),
        train=TrainConfig(seed=0, batch_size=4, learning_rate=0.05),
    )


def _batch(cfg, key=0):
    rng = np.random.default_rng(key)
    B, L = 4, 6
    V = cfg.model.tgt_vocab_size
    b = {
        "src": jnp.asarray(rng.integers(4, cfg.model.src_vocab_size, (B, L)), jnp.int32),
        "tgt_in": jnp.asarray(rng.integers(4, V, (B, L)), jnp.int32),
        "tgt_out": jnp.asarray(rng.integers(4, V, (B, L)), jnp.int32),
        "example_mask": jnp.ones((B,), jnp.float32),
    }
    if cfg.model.model_type != "nmt":
        b["img"] = jnp.asarray(rng.standard_normal((B, 8)), jnp.float32)
    return b


def test_tied_param_layout_and_logits():
    cfg = _cfg(tied=True)
    model = build_model(cfg.model)
    params = init_params(model, jax.random.PRNGKey(0))
    assert "generator" not in params and "gen_bias" in params
    # logits == h @ E^T + b by construction: perturb the embedding table and
    # the generator output must move with it
    gp = generator_params(params, cfg.model)
    assert gp["kernel"].shape == (16, 24) and gp["bias"].shape == (24,)
    src = jnp.ones((2, 5), jnp.int32)
    from variational_mmt_tpu.models.model import VMMTModel

    def logits_of(p):
        memory, finals, src_mask, _ = model.apply({"params": p}, src, method=VMMTModel.encode)
        init_hs = model.apply({"params": p}, finals, None, method=VMMTModel.init_decoder_state)
        out, _ = model.apply({"params": p}, src, memory, src_mask, init_hs, None, True,
                             method=VMMTModel.decode_train)
        return out

    base = logits_of(params)
    bumped = jax.tree.map(lambda x: x, params)
    bumped = dict(bumped)
    emb = np.asarray(bumped["tgt_embed"]["embedding"]).copy()
    emb[7] += 1.0
    bumped["tgt_embed"] = {"embedding": jnp.asarray(emb)}
    moved = logits_of(bumped)
    # only vocab-row 7's logit column changes (plus rows where token 7 embeds)
    diff = np.abs(np.asarray(moved - base)).max(axis=(0, 1))
    assert diff[7] > 0 and np.all(diff[:7] == 0) and np.all(diff[8:] == 0)


def test_tied_requires_matching_dims():
    with pytest.raises(AssertionError, match="emb_dim == hidden_dim"):
        build_model(ModelConfig(emb_dim=8, hidden_dim=16, share_decoder_embeddings=True))


@pytest.mark.parametrize("model_type", ["nmt", "vmmt_c"])
def test_tied_fused_ce_matches_naive(model_type):
    """The fused-CE path must produce the same loss/grads for a tied model
    (generator_params resolves kernel=E^T)."""
    cfg_n = _cfg(tied=True, fused_ce=False, model_type=model_type)
    cfg_f = _cfg(tied=True, fused_ce=True, model_type=model_type)
    model_n = build_model(cfg_n.model)
    model_f = build_model(cfg_f.model)
    state = create_train_state(cfg_n, model_n)
    batch = _batch(cfg_n)
    step_n = jax.jit(make_train_step(cfg_n, model_n))
    step_f = jax.jit(make_train_step(cfg_f, model_f))
    s_n, m_n = step_n(state, batch)
    s_f, m_f = step_f(state, batch)
    np.testing.assert_allclose(float(m_n["loss"]), float(m_f["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_n.params), jax.tree.leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tied_model_trains():
    """Gradient flows into the shared table from BOTH the embedding lookup
    and the generator: the table moves, loss decreases."""
    cfg = _cfg(tied=True)
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    emb0 = np.asarray(state.params["tgt_embed"]["embedding"]).copy()
    step = jax.jit(make_train_step(cfg, model))
    batch = _batch(cfg)
    losses = []
    for _ in range(25):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.7 * losses[0]
    assert not np.allclose(np.asarray(state.params["tgt_embed"]["embedding"]), emb0)


def test_share_embeddings_single_table():
    """-share_embeddings: one table serves both sides — no src_embed in the
    param tree, src and tgt lookups hit the same rows, grads from BOTH sides
    flow into it, and it composes with share_decoder_embeddings."""
    cfg = _cfg(tied=True)
    cfg.model.share_embeddings = True
    cfg.model.src_vocab_size = cfg.model.tgt_vocab_size = 24
    model = build_model(cfg.model)
    params = init_params(model, jax.random.PRNGKey(0))
    assert "src_embed" not in params and "tgt_embed" in params

    state = create_train_state(cfg, model)
    step = jax.jit(make_train_step(cfg, model))
    batch = _batch(cfg)
    emb0 = np.asarray(state.params["tgt_embed"]["embedding"]).copy()
    losses = []
    for _ in range(25):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert not np.allclose(np.asarray(state.params["tgt_embed"]["embedding"]), emb0)


def test_share_embeddings_requires_matching_vocab():
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="share_embeddings"):
        build_model(ModelConfig(src_vocab_size=10, tgt_vocab_size=12,
                                share_embeddings=True))


def test_share_embeddings_frozen_freezes_shared_table():
    import dataclasses

    cfg = _cfg(tied=False)
    cfg.model.share_embeddings = True
    cfg.model.src_vocab_size = cfg.model.tgt_vocab_size = 24
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, fix_word_vecs_enc=True)
    )
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    step = jax.jit(make_train_step(cfg, model))
    batch = _batch(cfg)
    emb0 = np.asarray(state.params["tgt_embed"]["embedding"]).copy()
    for _ in range(5):
        state, _ = step(state, batch)
    np.testing.assert_array_equal(np.asarray(state.params["tgt_embed"]["embedding"]), emb0)
