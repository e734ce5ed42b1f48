"""Option-combination matrix (the upstream-era test_models.py pattern,
SURVEY.md §4): construct + forward the model across the flag surface."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from variational_mmt_tpu.config import ModelConfig
from variational_mmt_tpu.models.model import build_model, init_params


def run_forward(cfg: ModelConfig):
    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    B, T = 2, 5
    src = jnp.ones((B, T), jnp.int32) * 4
    tgt_in = jnp.ones((B, T), jnp.int32) * 5
    img = None
    if cfg.img_feat_dim:
        shape = (B, 49, cfg.img_feat_dim) if cfg.img_feat_type == "conv" else (B, cfg.img_feat_dim)
        img = jnp.ones(shape, jnp.float32)
    out = model.apply({"params": params}, src, tgt_in, img, deterministic=True, sample=False)
    assert out["logits"].shape == (B, T, cfg.tgt_vocab_size)
    assert np.isfinite(np.asarray(out["logits"], np.float32)).all()
    return out


@pytest.mark.parametrize(
    "attn_type,input_feed", itertools.product(["general", "dot", "mlp"], [True, False])
)
def test_attention_by_input_feed(attn_type, input_feed):
    run_forward(ModelConfig(
        model_type="nmt", src_vocab_size=20, tgt_vocab_size=20, emb_dim=8,
        hidden_dim=16, enc_layers=1, dec_layers=1, dropout=0.0,
        attn_type=attn_type, input_feed=input_feed, compute_dtype="float32",
        img_feat_dim=0, use_img_predict=False,
    ))


@pytest.mark.parametrize(
    "model_type,z_cond,img_loss",
    [
        ("vmmt_f", "init", "logprob"),
        ("vmmt_f", "init+input", "mse"),
        ("vmmt_c", "init", "cosine"),
        ("vmmt_c", "init+input", "logprob"),
    ],
)
def test_latent_variants(model_type, z_cond, img_loss):
    run_forward(ModelConfig(
        model_type=model_type, src_vocab_size=20, tgt_vocab_size=20, emb_dim=8,
        hidden_dim=16, enc_layers=2, dec_layers=2, dropout=0.0, latent_dim=4,
        img_feat_dim=8, z_cond=z_cond, img_loss=img_loss, compute_dtype="float32",
    ))


def test_latent_without_images():
    """vmmt_f with no image features: q(z|x,y) only (img_feat_dim=0)."""
    out = run_forward(ModelConfig(
        model_type="vmmt_f", src_vocab_size=20, tgt_vocab_size=20, emb_dim=8,
        hidden_dim=16, enc_layers=1, dec_layers=1, dropout=0.0, latent_dim=4,
        img_feat_dim=0, use_img_predict=False, compute_dtype="float32",
    ))
    assert "mu_q" in out and "img_pred" not in out


@pytest.mark.parametrize("layers", [(1, 2), (2, 1), (3, 3)])
def test_asymmetric_layers(layers):
    enc, dec = layers
    run_forward(ModelConfig(
        model_type="nmt", src_vocab_size=20, tgt_vocab_size=20, emb_dim=8,
        hidden_dim=16, enc_layers=enc, dec_layers=dec, dropout=0.0,
        compute_dtype="float32", img_feat_dim=0, use_img_predict=False,
    ))


@pytest.mark.parametrize(
    "rnn_type,input_feed,model_type",
    [("lstm", True, "nmt"), ("lstm", False, "nmt"),
     ("lstm", True, "vmmt_c"), ("lstm", False, "vmmt_f")],
)
def test_lstm_matrix(rnn_type, input_feed, model_type):
    run_forward(ModelConfig(
        model_type=model_type, rnn_type=rnn_type, src_vocab_size=20,
        tgt_vocab_size=20, emb_dim=8, hidden_dim=16, enc_layers=2, dec_layers=2,
        dropout=0.0, latent_dim=4, input_feed=input_feed,
        img_feat_dim=(8 if model_type != "nmt" else 0),
        use_img_predict=(model_type != "nmt"), compute_dtype="float32",
    ))


@pytest.mark.parametrize("share_emb,tied_gen", [(True, False), (True, True)])
def test_shared_embedding_matrix(share_emb, tied_gen):
    run_forward(ModelConfig(
        model_type="nmt", src_vocab_size=20, tgt_vocab_size=20, emb_dim=16,
        hidden_dim=16, enc_layers=1, dec_layers=1, dropout=0.0,
        share_embeddings=share_emb, share_decoder_embeddings=tied_gen,
        compute_dtype="float32", img_feat_dim=0, use_img_predict=False,
    ))
