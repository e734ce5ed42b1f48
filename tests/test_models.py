"""Model math + shape tests (SURVEY.md §4: golden-value units for GRU cell /
attention / KL / reparam; shape/dtype under jit; masking invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from variational_mmt_tpu.config import ModelConfig
from variational_mmt_tpu.models.attention import GlobalAttention
from variational_mmt_tpu.models.gru import UniGRU, gru_gates, masked_mean
from variational_mmt_tpu.models.model import build_model, init_params


def small_cfg(**kw):
    base = dict(
        model_type="vmmt_f", src_vocab_size=50, tgt_vocab_size=60, emb_dim=16,
        hidden_dim=32, enc_layers=2, dec_layers=2, latent_dim=8, img_feat_dim=24,
        dropout=0.0, compute_dtype="float32",
    )
    base.update(kw)
    return ModelConfig(**base)


def test_gru_gates_golden():
    """Hand-computed single GRU step (cuDNN gate convention)."""
    rng = np.random.default_rng(0)
    H = 4
    x_proj = rng.standard_normal((1, 3 * H)).astype(np.float32)
    h_proj = rng.standard_normal((1, 3 * H)).astype(np.float32)
    h = rng.standard_normal((1, H)).astype(np.float32)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    xr, xz, xn = np.split(x_proj, 3, -1)
    hr, hz, hn = np.split(h_proj, 3, -1)
    r = sig(xr + hr)
    z = sig(xz + hz)
    n = np.tanh(xn + r * hn)
    want = (1 - z) * n + z * h
    got = gru_gates(jnp.array(x_proj), jnp.array(h_proj), jnp.array(h))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_unigru_matches_manual_recurrence():
    """UniGRU (hoisted input projection + scan) == step-by-step numpy GRU."""
    B, T, E, H = 2, 5, 3, 4
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, T, E)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 3:] = 0.0  # second sequence is shorter
    mod = UniGRU(hidden=H)
    params = mod.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(mask))["params"]
    outs, final = mod.apply({"params": params}, jnp.array(x), jnp.array(mask))

    Wi = np.asarray(params["ih"]["kernel"]); bi = np.asarray(params["ih"]["bias"])
    Wh = np.asarray(params["hh_kernel"]); bh = np.asarray(params["hh_bias"])

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    h = np.zeros((B, H), np.float32)
    ref_outs = []
    for t in range(T):
        xp = x[:, t] @ Wi + bi
        hp = h @ Wh + bh
        xr, xz, xn = np.split(xp, 3, -1)
        hr, hz, hn = np.split(hp, 3, -1)
        r, z = sig(xr + hr), sig(xz + hz)
        n = np.tanh(xn + r * hn)
        h_new = (1 - z) * n + z * h
        h = np.where(mask[:, t : t + 1] > 0, h_new, h)
        ref_outs.append(h.copy())
    np.testing.assert_allclose(np.asarray(outs), np.stack(ref_outs, 1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(final), ref_outs[-1], rtol=1e-4, atol=1e-5)


def test_reverse_gru_ignores_trailing_pads():
    """Backward final state must summarize only real tokens."""
    B, T, E, H = 1, 6, 3, 4
    rng = np.random.default_rng(2)
    x = rng.standard_normal((B, T, E)).astype(np.float32)
    mod = UniGRU(hidden=H, reverse=True)
    mask_full = np.ones((B, T), np.float32)
    mask_short = mask_full.copy()
    mask_short[0, 4:] = 0.0
    params = mod.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(mask_full))["params"]
    # garbage in padded region must not affect the final state
    x2 = x.copy()
    x2[0, 4:] = 99.0
    _, f1 = mod.apply({"params": params}, jnp.array(x), jnp.array(mask_short))
    _, f2 = mod.apply({"params": params}, jnp.array(x2), jnp.array(mask_short))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-6)


def test_attention_masks_padding():
    B, S, H = 2, 5, 8
    rng = np.random.default_rng(3)
    mem = rng.standard_normal((B, S, H)).astype(np.float32)
    q = rng.standard_normal((B, H)).astype(np.float32)
    mask = np.ones((B, S), np.float32)
    mask[0, 3:] = 0.0
    for attn_type in ("general", "dot", "mlp"):
        mod = GlobalAttention(hidden=H, attn_type=attn_type)
        params = mod.init(jax.random.PRNGKey(0), jnp.array(q), jnp.array(mem), jnp.array(mask))["params"]
        _, align = mod.apply({"params": params}, jnp.array(q), jnp.array(mem), jnp.array(mask))
        align = np.asarray(align)
        assert align[0, 3:].max() < 1e-6, attn_type
        np.testing.assert_allclose(align.sum(-1), 1.0, rtol=1e-5)


@pytest.mark.parametrize("attn_type,T", [("general", 3), ("mlp", 3), ("mlp", 19)])
def test_attention_seq_matches_single_step(attn_type, T):
    """Sequence mode == per-step mode; mlp at T=19 exercises the chunked
    (memory-bounded) score path incl. the T % 8 remainder."""
    B, S, H = 2, 5, 8
    rng = np.random.default_rng(4)
    mem = rng.standard_normal((B, S, H)).astype(np.float32)
    q = rng.standard_normal((B, T, H)).astype(np.float32)
    mask = np.ones((B, S), np.float32)
    mask[1, 3:] = 0.0
    mod = GlobalAttention(hidden=H, attn_type=attn_type)
    params = mod.init(jax.random.PRNGKey(0), jnp.array(q), jnp.array(mem), jnp.array(mask))["params"]
    seq_out, _ = mod.apply({"params": params}, jnp.array(q), jnp.array(mem), jnp.array(mask))
    for t in range(T):
        one, _ = mod.apply({"params": params}, jnp.array(q[:, t]), jnp.array(mem), jnp.array(mask))
        np.testing.assert_allclose(np.asarray(seq_out[:, t]), np.asarray(one), rtol=1e-5, atol=1e-6)

    # gradients must agree too (the chunked path runs under jax.grad in
    # input_feed=False training)
    def loss_seq(q_):
        out, _ = mod.apply({"params": params}, q_, jnp.array(mem), jnp.array(mask))
        return (out * out).sum()

    def loss_steps(q_):
        tot = 0.0
        for t in range(T):
            out, _ = mod.apply({"params": params}, q_[:, t], jnp.array(mem), jnp.array(mask))
            tot = tot + (out * out).sum()
        return tot

    g_seq = jax.grad(loss_seq)(jnp.array(q))
    g_step = jax.grad(loss_steps)(jnp.array(q))
    np.testing.assert_allclose(np.asarray(g_seq), np.asarray(g_step),
                               rtol=1e-4, atol=1e-6)


def test_masked_mean():
    x = jnp.array([[[1.0], [3.0], [100.0]]])
    m = jnp.array([[1.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(masked_mean(x, m)), [[2.0]])


@pytest.mark.parametrize("model_type", ["nmt", "vmmt_f", "vmmt_c"])
def test_forward_shapes(model_type):
    cfg = small_cfg(model_type=model_type)
    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    B, T = 3, 7
    src = jnp.ones((B, T), jnp.int32) * 5
    tgt_in = jnp.ones((B, T), jnp.int32) * 6
    img = jnp.ones((B, cfg.img_feat_dim), jnp.float32)
    out = model.apply({"params": params}, src, tgt_in, img, deterministic=True, sample=False)
    assert out["logits"].shape == (B, T, cfg.tgt_vocab_size)
    assert out["logits"].dtype == jnp.float32
    if model_type != "nmt":
        assert out["mu_q"].shape == (B, cfg.latent_dim)
        assert out["img_pred"].shape == (B, cfg.img_feat_dim)
        assert (np.asarray(out["sigma_q"]) > 0).all()


def test_src_padding_does_not_leak():
    """Changing tokens in padded src positions must not change logits."""
    cfg = small_cfg(model_type="vmmt_f")
    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    src1 = jnp.array([[4, 5, 6, 0, 0]], jnp.int32)
    tgt_in = jnp.array([[2, 7, 8, 0]], jnp.int32)
    img = jnp.ones((1, cfg.img_feat_dim), jnp.float32)
    o1 = model.apply({"params": params}, src1, tgt_in, img, deterministic=True, sample=False)
    # append extra PAD columns: logits must be identical (mask invariance)
    src1b = jnp.pad(src1, ((0, 0), (0, 3)))
    o2 = model.apply({"params": params}, src1b, tgt_in, img, deterministic=True, sample=False)
    np.testing.assert_allclose(np.asarray(o1["logits"]), np.asarray(o2["logits"]), rtol=1e-4, atol=1e-5)


def test_latent_conditions_decoder():
    """Different z must produce different logits (z_cond active)."""
    cfg = small_cfg(model_type="vmmt_f")
    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    src = jnp.array([[4, 5, 6]], jnp.int32)
    tgt_in = jnp.array([[2, 7, 8]], jnp.int32)
    img = jnp.ones((1, cfg.img_feat_dim), jnp.float32)
    o1 = model.apply(
        {"params": params}, src, tgt_in, img, deterministic=True, sample=True,
        rngs={"latent": jax.random.PRNGKey(1)},
    )
    o2 = model.apply(
        {"params": params}, src, tgt_in, img, deterministic=True, sample=True,
        rngs={"latent": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(np.asarray(o1["z"]), np.asarray(o2["z"]))
    assert not np.allclose(np.asarray(o1["logits"]), np.asarray(o2["logits"]))


def test_input_feed_false_path():
    cfg = small_cfg(input_feed=False)
    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    out = model.apply(
        {"params": params},
        jnp.ones((2, 4), jnp.int32), jnp.ones((2, 4), jnp.int32),
        jnp.ones((2, cfg.img_feat_dim), jnp.float32),
        deterministic=True, sample=False,
    )
    assert out["logits"].shape == (2, 4, cfg.tgt_vocab_size)


def test_bfloat16_compute():
    cfg = small_cfg(compute_dtype="bfloat16")
    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    out = model.apply(
        {"params": params},
        jnp.ones((2, 4), jnp.int32), jnp.ones((2, 4), jnp.int32),
        jnp.ones((2, cfg.img_feat_dim), jnp.float32),
        deterministic=True, sample=False,
    )
    assert out["logits"].dtype == jnp.float32  # generator promotes
    assert np.isfinite(np.asarray(out["logits"])).all()
    # params stay float32 (master weights)
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(params) if x.dtype.kind == "f")


def test_conv_features_accepted():
    cfg = small_cfg(img_feat_type="conv")
    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    img = jnp.ones((2, 49, cfg.img_feat_dim), jnp.float32)
    out = model.apply(
        {"params": params}, jnp.ones((2, 4), jnp.int32), jnp.ones((2, 4), jnp.int32),
        img, deterministic=True, sample=False,
    )
    assert out["logits"].shape[-1] == cfg.tgt_vocab_size


def test_fused_decoder_equivalence():
    """Custom-VJP fused decoder scan == generic nn.scan path: exact forward,
    grads to float noise (models/fused_decoder.py)."""
    from variational_mmt_tpu.config import Config
    from variational_mmt_tpu.train.loss import compute_loss

    kw = dict(model_type="vmmt_c", src_vocab_size=30, tgt_vocab_size=30, emb_dim=8,
              hidden_dim=16, enc_layers=1, dec_layers=2, latent_dim=4, img_feat_dim=8,
              dropout=0.0, word_dropout=0.0, compute_dtype="float32")
    m_gen = build_model(ModelConfig(**kw, fused_decoder=False))
    m_fus = build_model(ModelConfig(**kw, fused_decoder=True))
    params = init_params(m_gen, jax.random.PRNGKey(0))
    src = jnp.array([[4, 5, 6, 0], [7, 8, 9, 9]], jnp.int32)
    tgt_in = jnp.array([[2, 9, 10, 11], [2, 11, 4, 5]], jnp.int32)
    tgt_out = jnp.array([[9, 10, 3, 0], [11, 3, 0, 0]], jnp.int32)
    img = jnp.ones((2, 8), jnp.float32)
    cfg = Config()

    def loss(model, p):
        out = model.apply({"params": p}, src, tgt_in, img, deterministic=True, sample=False)
        l, _ = compute_loss(out, tgt_out, jnp.ones(2), img, model.cfg, cfg.train, jnp.int32(0))
        return l

    fg = jax.jit(lambda p: loss(m_gen, p))
    ff = jax.jit(lambda p: loss(m_fus, p))
    np.testing.assert_allclose(float(fg(params)), float(ff(params)), rtol=1e-6)
    gg = jax.jit(jax.grad(fg))(params)
    gf = jax.jit(jax.grad(ff))(params)
    for a, b in zip(jax.tree.leaves(gg), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5)


def test_conv_features_attention_pooling():
    """img_pool='attn': the text-conditioned region attention keeps spatial
    structure — permuting region CONTENT changes the latent, and the pool
    output is a proper convex combination of regions (not the mean)."""
    cfg = small_cfg(model_type="vmmt_c", img_feat_type="conv", img_pool="attn")
    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    assert "region_pool" in params
    rng = np.random.default_rng(0)
    img = jnp.array(rng.standard_normal((2, 9, cfg.img_feat_dim)), jnp.float32)
    src = jnp.array([[4, 5, 6, 0], [7, 8, 0, 0]], jnp.int32)
    tgt = jnp.array([[9, 10, 3, 0], [11, 3, 0, 0]], jnp.int32)

    def prior_mu(im):
        out = model.apply({"params": params}, src, tgt, im,
                          deterministic=True, sample=False)
        return np.asarray(out["mu_p"])

    mu_a = prior_mu(img)
    # scaling ONE region changes the attention-pooled input -> mu_p moves
    img_scaled = img.at[:, 3].mul(4.0)
    mu_b = prior_mu(img_scaled)
    assert not np.allclose(mu_a, mu_b)
    # mean-pool model with identical inputs gives a different latent than
    # the attention pool (i.e., the flag actually switches behavior)
    cfg_m = small_cfg(model_type="vmmt_c", img_feat_type="conv", img_pool="mean")
    model_m = build_model(cfg_m)
    params_m = init_params(model_m, jax.random.PRNGKey(0))
    assert "region_pool" not in params_m
    # BEHAVIORAL check that the flag switches the forward pass, not just the
    # param tree: under attention pooling, permuting region ORDER leaves the
    # pooled value (a content-weighted sum) unchanged, while adding the same
    # constant to every region shifts mean and attn identically — so compare
    # against a transformation only the mean is invariant to: replace every
    # region by the regions' mean. Mean pooling cannot tell the difference;
    # attention pooling must.
    img_flat = jnp.broadcast_to(img.mean(axis=1, keepdims=True), img.shape)
    out_m1 = model_m.apply({"params": params_m}, src, tgt, img,
                           deterministic=True, sample=False)
    out_m2 = model_m.apply({"params": params_m}, src, tgt, img_flat,
                           deterministic=True, sample=False)
    np.testing.assert_allclose(np.asarray(out_m1["mu_p"]), np.asarray(out_m2["mu_p"]),
                               rtol=1e-5, atol=1e-6)
    mu_flat = prior_mu(img_flat)
    assert not np.allclose(mu_a, mu_flat)  # attention sees the structure
