"""ELBO pieces: KL golden values, annealing schedule, CE masking, image loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from variational_mmt_tpu.config import ModelConfig, TrainConfig
from variational_mmt_tpu.models.latent import (
    gaussian_kl,
    gaussian_log_prob,
    kl_free_bits,
    reparameterize,
)
from variational_mmt_tpu.train.loss import image_loss, kl_beta, token_ce


def test_kl_standard_normal_vs_itself_is_zero():
    mu = jnp.zeros((2, 4))
    sigma = jnp.ones((2, 4))
    np.testing.assert_allclose(np.asarray(gaussian_kl(mu, sigma)), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gaussian_kl(mu, sigma, mu, sigma)), 0.0, atol=1e-6)


def test_kl_golden_value():
    # KL(N(1, 2^2) || N(0,1)) = log(1/2) + (4 + 1)/2 - 1/2 = -log2 + 2
    mu = jnp.array([[1.0]])
    sigma = jnp.array([[2.0]])
    want = -np.log(2.0) + 2.0
    np.testing.assert_allclose(np.asarray(gaussian_kl(mu, sigma))[0], want, rtol=1e-6)
    # vs learned prior N(3, 0.5^2):
    mup = jnp.array([[3.0]])
    sigp = jnp.array([[0.5]])
    want2 = np.log(0.5 / 2.0) + (4.0 + 4.0) / (2 * 0.25) - 0.5
    np.testing.assert_allclose(np.asarray(gaussian_kl(mu, sigma, mup, sigp))[0], want2, rtol=1e-6)


def test_gaussian_log_prob_golden():
    # log N(0; 0, 1) = -0.5 log(2 pi), summed over 3 dims
    x = jnp.zeros((1, 3))
    lp = gaussian_log_prob(x, jnp.zeros((1, 3)), jnp.ones((1, 3)))
    np.testing.assert_allclose(np.asarray(lp)[0], -1.5 * np.log(2 * np.pi), rtol=1e-4)


def test_reparameterize_stats():
    k = jax.random.PRNGKey(0)
    mu = jnp.full((20000,), 2.0)
    sigma = jnp.full((20000,), 0.5)
    z = reparameterize(k, mu, sigma)
    assert abs(float(z.mean()) - 2.0) < 0.02
    assert abs(float(z.std()) - 0.5) < 0.02


def test_free_bits():
    kl = jnp.array([0.5, 10.0])
    out = np.asarray(kl_free_bits(kl, free_bits=0.25, latent_dim=8))  # floor = 2.0
    np.testing.assert_allclose(out, [2.0, 10.0])


def test_kl_beta_schedules():
    cfg = TrainConfig(kl_anneal="linear", kl_anneal_steps=100, kl_anneal_start=10)
    assert float(kl_beta(jnp.int32(0), cfg)) == 0.0
    assert float(kl_beta(jnp.int32(10), cfg)) == 0.0
    np.testing.assert_allclose(float(kl_beta(jnp.int32(60), cfg)), 0.5)
    assert float(kl_beta(jnp.int32(10000), cfg)) == 1.0
    cfg2 = TrainConfig(kl_anneal="none")
    assert float(kl_beta(jnp.int32(0), cfg2)) == 1.0
    cfg3 = TrainConfig(kl_anneal="sigmoid", kl_anneal_steps=100)
    assert float(kl_beta(jnp.int32(0), cfg3)) < 0.01
    assert float(kl_beta(jnp.int32(100), cfg3)) > 0.99


def test_token_ce_masking_and_accuracy():
    # vocab 3; logits strongly prefer token 2 everywhere
    logits = jnp.array([[[0.0, 0.0, 10.0], [0.0, 0.0, 10.0]]])
    targets = jnp.array([[2, 1]])
    mask = jnp.array([[1.0, 0.0]])  # second position masked out
    ce, nll, n_correct = token_ce(logits, targets, mask)
    assert float(n_correct) == 1.0  # only the unmasked correct one counts
    assert float(ce[0]) < 0.01  # masked wrong position contributes nothing
    assert float(nll[0]) == float(ce[0])  # no smoothing: raw == training CE


def test_token_ce_label_smoothing():
    logits = jnp.array([[[0.0, -1.0, 3.0, 0.5]]])
    targets = jnp.array([[2]])
    mask = jnp.ones((1, 1))
    ce0, nll0, _ = token_ce(logits, targets, mask, label_smoothing=0.0)
    ce1, nll1, _ = token_ce(logits, targets, mask, label_smoothing=0.1)
    assert float(ce1[0]) > float(ce0[0])  # smoothing penalizes confident spikes
    # the raw-NLL report is smoothing-independent
    np.testing.assert_allclose(float(nll1[0]), float(nll0[0]), rtol=1e-6)

    # Golden check of the reference-style distribution: confidence 1-eps on
    # gold, eps/(V-2) on each class that is neither PAD(=0) nor gold.
    eps, V = 0.1, 4
    logp = np.log(np.exp(logits[0, 0]) / np.exp(logits[0, 0]).sum())
    want = -(1 - eps) * logp[2] - (eps / (V - 2)) * (logp[1] + logp[3])
    np.testing.assert_allclose(float(ce1[0]), want, rtol=1e-5)


def test_image_loss_variants():
    v = jnp.array([[1.0, 0.0, 0.0]])
    v_hat_same = jnp.array([[1.0, 0.0, 0.0]])
    v_hat_diff = jnp.array([[0.0, 1.0, 0.0]])
    assert float(image_loss(v, v_hat_same, "mse")[0]) == 0.0
    assert float(image_loss(v, v_hat_diff, "mse")[0]) == 2.0
    np.testing.assert_allclose(float(image_loss(v, v_hat_same, "cosine")[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(image_loss(v, v_hat_diff, "cosine")[0]), 1.0, atol=1e-6)
    # logprob at the mean = 0.5*D*log(2pi)
    np.testing.assert_allclose(
        float(image_loss(v, v_hat_same, "logprob")[0]), 1.5 * np.log(2 * np.pi), rtol=1e-4
    )
    # conv features (B, R, D) are region-pooled
    v3 = jnp.stack([v, v], axis=1)[0][None]  # (1, 2, 3)
    np.testing.assert_allclose(float(image_loss(v3, v_hat_same, "mse")[0]), 0.0, atol=1e-6)


def _fused_setup(seed=0, N=37, H=24, V=50, eps=0.0):
    rng = np.random.default_rng(seed)
    x = jnp.array(rng.standard_normal((N, H)), jnp.float32)
    W = jnp.array(rng.standard_normal((H, V)) * 0.1, jnp.float32)
    b = jnp.array(rng.standard_normal(V) * 0.1, jnp.float32)
    tgt = jnp.array(rng.integers(1, V, N), jnp.int32)  # never PAD
    mask = jnp.array((rng.random(N) > 0.2).astype(np.float32))
    return x, W, b, tgt, mask


@pytest.mark.parametrize("eps", [0.0, 0.1])
@pytest.mark.parametrize("chunk", [8, 16, 1024])
def test_fused_ce_matches_naive(eps, chunk):
    """fused_generator_ce == generator GEMM + token_ce, values AND grads
    (chunk sizes cover padding remainders and the single-chunk case)."""
    from variational_mmt_tpu.ops.fused_ce import fused_generator_ce

    x, W, b, tgt, mask = _fused_setup(eps=eps)

    def naive(x, W, b):
        logits = (x @ W + b)[None]  # (1, N, V)
        nll, nll_raw, nc = token_ce(logits, tgt[None], mask[None], eps)
        return nll[0], nll_raw[0], nc

    def fused(x, W, b):
        n, r, nc = fused_generator_ce(x, W, b, tgt, mask, eps, chunk)
        return n.sum(), r.sum(), nc

    n0, r0, nc0 = naive(x, W, b)
    n1, r1, nc1 = fused_generator_ce(x, W, b, tgt, mask, eps, chunk)
    np.testing.assert_allclose(float(n1.sum()), float(n0), rtol=1e-5)
    np.testing.assert_allclose(float(r1.sum()), float(r0), rtol=1e-5)
    assert float(nc0) == float(nc1)

    # gradient equality wrt x, W, b on a mixed scalar objective
    def obj_naive(args):
        n, r, _ = naive(*args)
        return 1.3 * n + 0.7 * r

    def obj_fused(args):
        x, W, b = args
        n, r, _ = fused_generator_ce(x, W, b, tgt, mask, eps, chunk)
        return 1.3 * n.sum() + 0.7 * r.sum()

    g0 = jax.grad(obj_naive)((x, W, b))
    g1 = jax.grad(obj_fused)((x, W, b))
    for a, c in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=2e-4, atol=1e-6)

    # the mask cotangent must be the true gradient (the per-token unmasked
    # NLLs), not a silent zero from a None in the custom VJP
    def obj_naive_m(m):
        logits = (x @ W + b)[None]
        n, r, _ = token_ce(logits, tgt[None], m[None], eps)
        return 1.3 * n[0] + 0.7 * r[0]

    def obj_fused_m(m):
        n, r, _ = fused_generator_ce(x, W, b, tgt, m, eps, chunk)
        return 1.3 * n.sum() + 0.7 * r.sum()

    gm0 = jax.grad(obj_naive_m)(mask)
    gm1 = jax.grad(obj_fused_m)(mask)
    assert float(jnp.abs(gm0).max()) > 0.0
    np.testing.assert_allclose(np.asarray(gm1), np.asarray(gm0),
                               rtol=2e-4, atol=1e-6)


def test_fused_ce_end_to_end_train_step_matches():
    """A full train step with model fused_ce=True matches fused_ce=False:
    same loss/metrics and (near-)identical updated params."""
    from variational_mmt_tpu.config import Config, ModelConfig, TrainConfig
    from variational_mmt_tpu.models.model import build_model
    from variational_mmt_tpu.train.trainer import create_train_state, make_train_step

    def run(fused):
        cfg = Config(
            model=ModelConfig(model_type="vmmt_c", src_vocab_size=30,
                              tgt_vocab_size=30, emb_dim=16, hidden_dim=32,
                              enc_layers=1, dec_layers=1, latent_dim=4,
                              img_feat_dim=16, dropout=0.0, word_dropout=0.0,
                              compute_dtype="float32", fused_ce=fused),
            train=TrainConfig(learning_rate=3e-3, label_smoothing=0.1),
        )
        model = build_model(cfg.model)
        state = create_train_state(cfg, model)
        step = make_train_step(cfg, model)
        rng = np.random.default_rng(0)
        B, L = 8, 6
        batch = {
            "src": jnp.array(rng.integers(4, 30, (B, L)), jnp.int32),
            "tgt_in": jnp.array(rng.integers(4, 30, (B, L)), jnp.int32),
            "tgt_out": jnp.array(rng.integers(4, 30, (B, L)), jnp.int32),
            "example_mask": jnp.ones((B,), jnp.float32),
            "img": jnp.array(rng.standard_normal((B, 16)), jnp.float32),
        }
        state, m = step(state, batch)
        return state, m

    s0, m0 = run(False)
    s1, m1 = run(True)
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["ce_sum"]), float(m0["ce_sum"]), rtol=1e-5)
    assert float(m0["n_correct"]) == float(m1["n_correct"])
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=2e-6)


def test_img_attn_pool_loss_target_matches_conditioning():
    """img_pool='attn': the p(v|z) objective must target the SAME
    attention-pooled vector z was conditioned on, not an independent
    mean-pool of the regions (train/loss.py consumes out['img_target'])."""
    import jax

    from variational_mmt_tpu.config import Config, ModelConfig, TrainConfig
    from variational_mmt_tpu.models.model import VMMTModel, build_model, init_params

    cfg = ModelConfig(
        model_type="vmmt_c", src_vocab_size=20, tgt_vocab_size=20, emb_dim=8,
        hidden_dim=16, enc_layers=1, dec_layers=1, latent_dim=4,
        img_feat_dim=8, img_feat_type="conv", img_pool="attn", dropout=0.0,
        compute_dtype="float32",
    )
    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, 20, (3, 6)), jnp.int32)
    tgt_in = jnp.asarray(rng.integers(4, 20, (3, 6)), jnp.int32)
    img = jnp.asarray(rng.standard_normal((3, 4, 8)), jnp.float32)
    out = model.apply({"params": params}, src, tgt_in, img,
                      deterministic=True, sample=False)
    assert "img_target" in out and out["img_target"].shape == (3, 8)
    # the model's own pooling, computed independently
    _, _, _, summary = model.apply({"params": params}, src, method=VMMTModel.encode)
    pooled = model.apply({"params": params}, img, summary, method=VMMTModel._img_in)
    np.testing.assert_allclose(np.asarray(out["img_target"]), np.asarray(pooled),
                               rtol=1e-5)
    # attention pooling genuinely differs from mean pooling here
    assert not np.allclose(np.asarray(pooled), np.asarray(img.mean(axis=1)), atol=1e-4)
