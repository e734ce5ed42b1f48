"""Latent-usage diagnostics (decode/diagnostics.py): active units + per-dim KL."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from variational_mmt_tpu.decode.diagnostics import (
    aggregate_latent_stats,
    latent_stats_corpus,
    make_latent_stats_fn,
)
from variational_mmt_tpu.config import Config, DecodeConfig, ModelConfig, TrainConfig
from variational_mmt_tpu.data.vocab import SPECIALS, Vocab
from variational_mmt_tpu.models.latent import gaussian_kl, gaussian_kl_per_dim
from variational_mmt_tpu.models.model import build_model
from variational_mmt_tpu.train.trainer import create_train_state


def small_setup(model_type="vmmt_c"):
    cfg = Config(
        model=ModelConfig(
            model_type=model_type, src_vocab_size=24, tgt_vocab_size=24,
            emb_dim=16, hidden_dim=32, enc_layers=1, dec_layers=2,
            latent_dim=4, img_feat_dim=8, dropout=0.0,
            compute_dtype="float32",
        ),
        train=TrainConfig(seed=7),
        decode=DecodeConfig(beam_size=4, max_length=12, batch_size=4),
    )
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    vocab = Vocab(SPECIALS + [f"w{i}" for i in range(20)])
    return cfg, model, state, vocab


def make_batch(B=4, L=6, seed=0, img_dim=8, mask=None):
    rng = np.random.default_rng(seed)
    return {
        "src": jnp.array(rng.integers(4, 24, (B, L)), jnp.int32),
        "tgt_in": jnp.array(rng.integers(4, 24, (B, L)), jnp.int32),
        "tgt_out": jnp.array(rng.integers(4, 24, (B, L)), jnp.int32),
        "example_mask": jnp.asarray(
            np.ones((B,), np.float32) if mask is None else mask),
        "img": jnp.array(rng.standard_normal((B, img_dim)), jnp.float32),
    }


def test_kl_per_dim_sums_to_total():
    rng = np.random.default_rng(1)
    mu_q = jnp.asarray(rng.standard_normal((5, 7)), jnp.float32)
    sigma_q = jnp.asarray(rng.uniform(0.3, 2.0, (5, 7)), jnp.float32)
    mu_p = jnp.asarray(rng.standard_normal((5, 7)), jnp.float32)
    sigma_p = jnp.asarray(rng.uniform(0.3, 2.0, (5, 7)), jnp.float32)
    # standard-normal prior
    np.testing.assert_allclose(
        np.asarray(gaussian_kl_per_dim(mu_q, sigma_q).sum(axis=-1)),
        np.asarray(gaussian_kl(mu_q, sigma_q)), rtol=1e-6)
    # conditional prior
    np.testing.assert_allclose(
        np.asarray(gaussian_kl_per_dim(mu_q, sigma_q, mu_p, sigma_p).sum(-1)),
        np.asarray(gaussian_kl(mu_q, sigma_q, mu_p, sigma_p)), rtol=1e-6)
    # KL of q == p is exactly zero, per dim
    np.testing.assert_allclose(
        np.asarray(gaussian_kl_per_dim(mu_p, sigma_p, mu_p, sigma_p)),
        np.zeros((5, 7)), atol=1e-6)


def test_aggregate_hand_computed():
    # 6 sentences, 3 dims: dim0 varies a lot, dim1 a little, dim2 constant
    mu = np.array([[1.0, 0.15, 0.5],
                   [-1.0, -0.15, 0.5],
                   [2.0, 0.15, 0.5],
                   [-2.0, -0.15, 0.5],
                   [0.5, 0.0, 0.5],
                   [-0.5, 0.0, 0.5]])  # var: 1.75 / 0.015 / 0 -> AU 2
    kl = np.abs(mu) * 0.1
    # split into two "batches" of sums
    def sums(rows):
        return {"sum_mu": mu[rows].sum(0), "sum_mu2": (mu[rows] ** 2).sum(0),
                "sum_kl": kl[rows].sum(0), "n_sents": float(len(rows))}

    out = aggregate_latent_stats([sums(range(3)), sums(range(3, 6))])
    var = mu.var(axis=0)  # population variance, matches the aggregation
    assert out["n_sents"] == 6 and out["latent_dim"] == 3
    assert out["au"] == int((var > 0.01).sum()) == 2
    np.testing.assert_allclose(out["kl_per_sent"], kl.sum(1).mean(), rtol=1e-9)
    np.testing.assert_allclose(out["var_mu_max"], var.max(), rtol=1e-9)
    # batch splitting must not change the result (up to float summation order)
    out1 = aggregate_latent_stats([sums(range(6))])
    assert (out1["au"], out1["n_sents"]) == (out["au"], out["n_sents"])
    np.testing.assert_allclose(out1["kl_per_sent"], out["kl_per_sent"], rtol=1e-12)
    np.testing.assert_allclose(out1["var_mu_max"], out["var_mu_max"], rtol=1e-12)


def test_aggregate_rejects_empty():
    with pytest.raises(ValueError):
        aggregate_latent_stats([])
    with pytest.raises(ValueError):
        aggregate_latent_stats([{"sum_mu": np.zeros(2), "sum_mu2": np.zeros(2),
                                 "sum_kl": np.zeros(2), "n_sents": 0.0}])


@pytest.mark.parametrize("model_type", ["vmmt_f", "vmmt_c"])
def test_latent_stats_fn_shapes_and_mask(model_type):
    cfg, model, state, vocab = small_setup(model_type)
    fn = jax.jit(make_latent_stats_fn(model))
    batch = make_batch(B=4)
    out = fn(state.params, batch)
    D = cfg.model.latent_dim
    assert out["sum_mu"].shape == (D,) and out["sum_kl"].shape == (D,)
    assert float(out["n_sents"]) == 4
    assert np.isfinite(np.asarray(out["sum_kl"])).all()
    # a masked-out row must not contribute: append a garbage row with mask 0
    b2 = {k: (jnp.concatenate([v, v[:1]], 0) if v.ndim > 0 else v)
          for k, v in batch.items()}
    b2["example_mask"] = jnp.array([1, 1, 1, 1, 0], jnp.float32)
    b2["src"] = b2["src"].at[4].set(7)
    out2 = fn(state.params, b2)
    for k in ("sum_mu", "sum_mu2", "sum_kl"):
        np.testing.assert_allclose(np.asarray(out2[k]), np.asarray(out[k]),
                                   rtol=1e-4, atol=1e-5)
    assert float(out2["n_sents"]) == 4


def test_latent_stats_corpus_end_to_end():
    cfg, model, state, vocab = small_setup("vmmt_c")
    batches = [make_batch(seed=s) for s in range(3)]
    out = latent_stats_corpus(model, state.params, batches)
    D = cfg.model.latent_dim
    assert 0 <= out["au"] <= D
    assert 0 <= out["kl_active_dims"] <= D
    assert out["n_sents"] == 12
    assert out["kl_per_sent"] >= 0.0
    assert len(out["kl_top8"]) == min(8, D)
    # KL spectrum is reported sorted descending
    assert out["kl_top8"] == sorted(out["kl_top8"], reverse=True)


def test_rejects_nonlatent():
    cfg, model, state, vocab = small_setup("nmt")
    with pytest.raises(ValueError):
        make_latent_stats_fn(model)
