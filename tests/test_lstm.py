"""LSTM cell option (-rnn_type lstm, upstream OpenNMT-py's baseline cell;
SURVEY.md §2.1 #7/#8 carry GRU as the paper's choice, LSTM as the inherited
upstream alternative). LSTM state is packed as one [h | c] array so every
state consumer (bridge, beam gather, checkpoints) stays shape-generic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from variational_mmt_tpu.config import Config, DecodeConfig, ModelConfig, TrainConfig
from variational_mmt_tpu.data.vocab import SPECIALS, Vocab
from variational_mmt_tpu.models.gru import BiGRUEncoder, lstm_gates
from variational_mmt_tpu.models.model import build_model, init_params
from variational_mmt_tpu.train.trainer import create_train_state, make_train_step


def test_lstm_gates_golden():
    """Exact cell math vs a straightforward numpy reference."""
    rng = np.random.default_rng(0)
    H = 5
    x_proj = rng.standard_normal((2, 4 * H)).astype(np.float32)
    h_proj = rng.standard_normal((2, 4 * H)).astype(np.float32)
    c = rng.standard_normal((2, H)).astype(np.float32)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    s = x_proj + h_proj
    i, f, g, o = s[:, :H], s[:, H:2*H], s[:, 2*H:3*H], s[:, 3*H:]
    c_ref = sig(f + 1.0) * c + sig(i) * np.tanh(g)
    h_ref = sig(o) * np.tanh(c_ref)
    h_new, c_new = lstm_gates(jnp.asarray(x_proj), jnp.asarray(h_proj), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(h_new), h_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c_new), c_ref, rtol=1e-5)


def test_lstm_encoder_reverse_padding_invariance():
    """The backward direction must summarize only real tokens: extra PAD
    positions cannot change outputs at real positions or the finals."""
    enc = BiGRUEncoder(hidden=8, layers=1, dropout=0.0, cell_type="lstm")
    rng = np.random.default_rng(1)
    T = 6
    emb = jnp.asarray(rng.standard_normal((2, T, 4)), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 0]], jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), emb, mask)
    out, finals = enc.apply(params, emb, mask)
    # re-pad with 2 extra junk positions: same results on the real prefix
    emb2 = jnp.concatenate([emb, jnp.asarray(rng.standard_normal((2, 2, 4)), jnp.float32)], axis=1)
    mask2 = jnp.concatenate([mask, jnp.zeros((2, 2), jnp.float32)], axis=1)
    out2, finals2 = enc.apply(params, emb2, mask2)
    np.testing.assert_allclose(np.asarray(out2[:, :T]) * np.asarray(mask)[..., None],
                               np.asarray(out) * np.asarray(mask)[..., None], atol=1e-6)
    for a, b in zip(finals, finals2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # finals pack [h | c]: width 2H
    assert finals[0].shape == (2, 16)


def _lstm_cfg(model_type="vmmt_c", **model_kw):
    return Config(
        model=ModelConfig(
            model_type=model_type, rnn_type="lstm", src_vocab_size=30,
            tgt_vocab_size=30, emb_dim=16, hidden_dim=32, enc_layers=1,
            dec_layers=2, latent_dim=4, img_feat_dim=16, dropout=0.1,
            word_dropout=0.1, compute_dtype="float32", **model_kw,
        ),
        train=TrainConfig(learning_rate=3e-3, kl_anneal_steps=20),
    )


def _batch(B=16, L=8, img_dim=16, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(4, 30, (B, L)).astype(np.int32)
    src[:, -1] = 0
    tgt = rng.integers(4, 30, (B, L)).astype(np.int32)
    tgt_in = tgt.copy()
    tgt_in[:, 0] = 2
    return {
        "src": jnp.array(src), "tgt_in": jnp.array(tgt_in), "tgt_out": jnp.array(tgt),
        "example_mask": jnp.ones((B,), jnp.float32),
        "img": jnp.array(rng.standard_normal((B, img_dim)), jnp.float32),
    }


@pytest.mark.parametrize("model_type", ["nmt", "vmmt_c"])
def test_lstm_overfits_single_batch(model_type):
    cfg = _lstm_cfg(model_type)
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    step = make_train_step(cfg, model)
    batch = _batch()
    losses = []
    # 120 steps (vs the GRU tests' 80): the LSTM's forget-bias init starts
    # closer to identity, so single-batch memorization ramps slightly slower
    for _ in range(120):
        state, m = step(state, batch)
        losses.append(float(m["ce_sum"]) / float(m["n_tokens"]))
    assert losses[-1] < losses[0] * 0.35, f"lstm {model_type}: {losses[0]} -> {losses[-1]}"
    assert np.isfinite(losses).all()


def test_lstm_beam_decode_and_input_feed_off():
    """Beam search over LSTM carries ([h|c] leaves gather correctly) in both
    decoder paths (input-feed scan and the no-feed fast path)."""
    from variational_mmt_tpu.decode.translator import Translator

    for input_feed in (True, False):
        cfg = _lstm_cfg(input_feed=input_feed)
        cfg.decode = DecodeConfig(beam_size=3, max_length=10, batch_size=4)
        model = build_model(cfg.model)
        state = create_train_state(cfg, model)
        vocab = Vocab(SPECIALS + [f"w{i}" for i in range(26)])
        tr = Translator(model, state.params, vocab, vocab, cfg.decode, buckets=[8])
        feats = np.zeros((2, 16), np.float32)
        out = tr.translate_ids([[5, 6, 7], [8, 9]], feats)
        assert len(out) == 2
        a = tr.translate_ids([[5, 6, 7]], feats[:1])
        b = tr.translate_ids([[5, 6, 7]], feats[:1])
        assert a == b  # deterministic


def test_lstm_use_pallas_falls_back_identically():
    """use_pallas with rnn_type=lstm must silently use the XLA scan — same
    results, no pallas kernel involvement."""
    cfg_a = _lstm_cfg("nmt")
    cfg_b = _lstm_cfg("nmt", use_pallas=True)
    model_a = build_model(cfg_a.model)
    model_b = build_model(cfg_b.model)
    params = init_params(model_a, jax.random.PRNGKey(3))
    batch = _batch(B=4, L=6)
    out_a = model_a.apply({"params": params}, batch["src"], batch["tgt_in"], None,
                          deterministic=True, sample=False)
    out_b = model_b.apply({"params": params}, batch["src"], batch["tgt_in"], None,
                          deterministic=True, sample=False)
    np.testing.assert_allclose(np.asarray(out_a["logits"]), np.asarray(out_b["logits"]),
                               atol=1e-6)
